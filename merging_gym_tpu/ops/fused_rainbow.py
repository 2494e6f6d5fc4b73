"""Pallas TPU kernel: the ENTIRE Rainbow (C51+NoisyNet+Dueling) trainer
as one kernel -- the fourth and final single-kernel trainer family
(cf. ops.fused_trainer for flat DQN, ops.fused_hdqn for hierarchical).

T training steps of the reference Rainbow loop (scripts/ranbowdqn.py:
623-700) run as the Pallas grid with every component on-chip:

  * actor: noisy-greedy argmax of E[Z] (ranbowdqn.py:543-548) for ego
    and the self-play opponent on the rolled view (ranbowdqn.py:669;
    ``opponent_roll`` as in agents.rainbow), optional Phi(eps)-greedy
    wrap and L0 / frozen-MLP opponents (the agents.rainbow extensions);
  * env: ops.fused_rollout._env_step_math (locked to core.env.step);
  * replay: an R-round slab ring, stored unconditionally every step
    (ranbowdqn.py:673 -- Rainbow has no winner store-gating), sampled
    uniformly over the *filled* prefix so learning starts after one
    round like the reference's fill>batch gate (ranbowdqn.py:682);
  * learner: C51 cross-entropy on the clamped selected-action
    distribution vs the categorically projected target (selection AND
    evaluation through the target net, ranbowdqn.py:554-600), with the
    faithful support-weighted mass quirk of ops.projection; hand-derived
    backprop through clamp, softmax, the dueling combine and all four
    noisy layers (d(sigma) = dW * eps), plus full Adam -- params, target
    params, both moments and both nets' noise resident on-chip;
  * noise: factorized sign(x)*sqrt(|x|) noise regenerated for BOTH nets
    via the on-chip PRNG after every learn (reset_noise,
    ranbowdqn.py:606-607); during warm-up the acting noise stays fixed;
  * target sync: hard copy every ``target_sync_episodes`` completed
    episodes (ranbowdqn.py:690-691), via an on-chip global episode
    counter (a replicated state row + the chunk-prior count in SMEM).

Parameter packing: the four noisy layers' [out, in] tensors are packed
row-wise into single [464, 64] blocks -- value1 rows 0:64, value2 rows
64:120 (51 real atoms padded to 56), advantage1 rows 120:184,
advantage2 rows 184:464 (5 actions x 56-padded atoms) -- so every
static slice stays sublane-aligned for Mosaic and each net is 8 arrays
(2 trunk w/b + packed mu w/b + packed sigma w/b) instead of 20.  Pad
rows carry zero mu/sigma/bias and receive zero gradients, so they stay
exactly zero through Adam.

The C51 projection uses the hat-function identity: atom k's mass lands
on atom i with weight clip(1 - |b_k - i|, 0, 1), which equals the
reference's floor/ceil split everywhere and gives weight 1 at integer
b_k; ``faithful_c51`` multiplies by (floor(b_k) != ceil(b_k)) to
reproduce the reference's integer-hit mass loss (ranbowdqn.py:572-580,
see ops.projection).

Sampling deviation on the UNIFORM path (same family as
ops.fused_trainer, documented there): each learn consumes one uniformly
chosen whole round slab (all n lanes of one past step) instead of 32
i.i.d. draws; the uniform marginal over stored transitions is kept.
This is the reference's actual configuration (uniform ring, 1-step,
ranbowdqn.py:645-647).

The full Rainbow extensions run in-kernel too (round 3):

  * **PER** (``cfg.per``): per-transition priorities live in the ring
    slab's pad row (NUM_F row 23 -- zero VMEM/checkpoint overhead, and
    they lane-shard with the ring under SPMD); new writes get the
    running ``max_priority ** alpha`` (a replicated env row,
    ranbowdqn.py:353-358); each learn draws ``B`` i.i.d. transitions by
    stratified inverse-CDF over the valid (round, lane) grid -- the
    two-level count-and-one-hot of :func:`per_pick`, built purely from
    triangular/one-hot MXU matmuls so there is no cumsum, gather or
    scatter primitive anywhere -- applies max-weight-normalised
    importance weights (ops.per.per_sample, per.py:64-91) and scatters
    ``(ce + 1e-5) ** alpha`` back (per.py:94-101).  The B draws use one
    host-supplied stratified offset per step (``us``), so the whole
    PER path is deterministic given the seed even on-chip.  Deviation
    from ops.per: the B strata share one uniform offset per learn
    (instead of B independent ones) -- each stratum remains exactly
    proportional; only the joint is correlated.
  * **n-step** (``cfg.n_step`` > 1): nothing extra is stored -- the
    slab ring IS a time-major history, so the n-step return, the
    truncated-at-done flag and the bootstrap obs are reconstructed at
    sample time from ``n_step`` consecutive slabs
    (:func:`nstep_batch_from_slabs`), with content exactly equal to
    ops.nstep's emissions (nstep.py:48-93).  Deviation: a transition
    becomes sampleable ``n_step - 1`` steps after it is written (the
    XLA path emits done-flushed entries immediately); its content when
    sampled is identical.

``greedy=True`` skips the on-chip PRNG entirely: the actor is the pure
argmax it already was, and the noise stays at whatever the carry
holds -- with host-pinned noise and round streams the whole kernel is
deterministic, which is what lets tests/test_fused_rainbow.py lock
whole chunks against an XLA reference in interpret mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.geometry import lon2coord
from merging_gym_tpu.nn.rainbow_net import NUM_ATOMS, V_MAX, V_MIN
from merging_gym_tpu.ops.fused_rollout import (_env_step_math,
                                               _random_reset_vals)
from merging_gym_tpu.ops.fused_trainer import (ADAM_B1, ADAM_B2, ADAM_EPS,
                                               NUM_F, OPP_FROZEN, OPP_L0,
                                               OPP_SELFPLAY, _argmax0, _fwd,
                                               _init_env_rows,
                                               _interpret_flag, _mm, _mm_nt,
                                               _mm_tn, _phi, params_to_t,
                                               rewards_cfg)

A = 5                 # actions (asserted against cfg)
ATOMS = NUM_ATOMS     # 51
AP = 56               # atoms padded to a sublane multiple
TRUNK0, TRUNK1 = 32, 64   # ranbowdqn.py:508-509
# Packed noisy-block row offsets: value1, value2, advantage1, advantage2.
OFF_V1, OFF_V2, OFF_A1, OFF_A2 = 0, 64, 120, 184
NP = OFF_A2 + A * AP  # 464 packed rows
ENV_ROWS = 14         # pos 2, vel 2, xy 4, winner, t, ep_reward,
                      # sync_chunks, ep_cum (per-lane episode counts),
                      # max_priority (replicated pre-alpha PER running
                      # max, ranbowdqn.py:353-358; 1.0 and inert unless
                      # cfg.per)
DELTA_Z = (V_MAX - V_MIN) / (ATOMS - 1)


def _row_iota():
    return lax.broadcasted_iota(jnp.int32, (AP, 1), 0)


def _atom_mask():
    return (_row_iota() < ATOMS).astype(jnp.float32)      # [AP, 1]


def _support_col():
    """Padded support column [AP, 1]; pad rows 0 (their mass is 0)."""
    i = _row_iota().astype(jnp.float32)
    return _atom_mask() * (V_MIN + DELTA_Z * i)


# ---------------------------------------------------------------------------
# Packing: nn.rainbow_net param/noise PyTrees <-> the kernel's 8/2-tuples.
# ---------------------------------------------------------------------------

_SEGS = (("noisy_value1", OFF_V1, TRUNK1),
         ("noisy_value2", OFF_V2, ATOMS),
         ("noisy_advantage1", OFF_A1, TRUNK1))


def _a2_rows(a):
    return OFF_A2 + a * AP


def rainbow_params_to_packed(params):
    """nn.rainbow_net param dict -> (t0T, t0b, t1T, t1b, nmuT, nmub,
    nsgT, nsgb); noisy [out, in] blocks packed per the module layout."""
    def col(x):
        return jnp.asarray(x, jnp.float32)[:, None]

    t0T = jnp.asarray(params["linear1"]["w"], jnp.float32).T
    t1T = jnp.asarray(params["linear2"]["w"], jnp.float32).T
    nmuT = jnp.zeros((NP, TRUNK1), jnp.float32)
    nsgT = jnp.zeros((NP, TRUNK1), jnp.float32)
    nmub = jnp.zeros((NP, 1), jnp.float32)
    nsgb = jnp.zeros((NP, 1), jnp.float32)
    for name, off, rows in _SEGS:
        p = params[name]
        nmuT = nmuT.at[off:off + rows].set(jnp.asarray(p["w_mu"]).T)
        nsgT = nsgT.at[off:off + rows].set(jnp.asarray(p["w_sigma"]).T)
        nmub = nmub.at[off:off + rows].set(col(p["b_mu"]))
        nsgb = nsgb.at[off:off + rows].set(col(p["b_sigma"]))
    p = params["noisy_advantage2"]
    wmuT, wsgT = jnp.asarray(p["w_mu"]).T, jnp.asarray(p["w_sigma"]).T
    bmu, bsg = col(p["b_mu"]), col(p["b_sigma"])
    for a in range(A):
        r = _a2_rows(a)
        nmuT = nmuT.at[r:r + ATOMS].set(wmuT[a * ATOMS:(a + 1) * ATOMS])
        nsgT = nsgT.at[r:r + ATOMS].set(wsgT[a * ATOMS:(a + 1) * ATOMS])
        nmub = nmub.at[r:r + ATOMS].set(bmu[a * ATOMS:(a + 1) * ATOMS])
        nsgb = nsgb.at[r:r + ATOMS].set(bsg[a * ATOMS:(a + 1) * ATOMS])
    return (t0T, col(params["linear1"]["b"]), t1T, col(params["linear2"]["b"]),
            nmuT, nmub, nsgT, nsgb)


def rainbow_packed_to_params(p8):
    """Inverse of :func:`rainbow_params_to_packed`."""
    t0T, t0b, t1T, t1b, nmuT, nmub, nsgT, nsgb = p8
    out = {"linear1": {"w": t0T.T, "b": t0b[:, 0]},
           "linear2": {"w": t1T.T, "b": t1b[:, 0]}}
    for name, off, rows in _SEGS:
        out[name] = {"w_mu": nmuT[off:off + rows].T,
                     "w_sigma": nsgT[off:off + rows].T,
                     "b_mu": nmub[off:off + rows, 0],
                     "b_sigma": nsgb[off:off + rows, 0]}
    wmuT = jnp.concatenate([nmuT[_a2_rows(a):_a2_rows(a) + ATOMS]
                            for a in range(A)])
    wsgT = jnp.concatenate([nsgT[_a2_rows(a):_a2_rows(a) + ATOMS]
                            for a in range(A)])
    out["noisy_advantage2"] = {
        "w_mu": wmuT.T, "w_sigma": wsgT.T,
        "b_mu": jnp.concatenate([nmub[_a2_rows(a):_a2_rows(a) + ATOMS, 0]
                                 for a in range(A)]),
        "b_sigma": jnp.concatenate([nsgb[_a2_rows(a):_a2_rows(a) + ATOMS, 0]
                                    for a in range(A)]),
    }
    return out


def rainbow_noise_to_packed(noise):
    """nn.rainbow_net noise PyTree -> (epsT [NP, 64], epsb [NP, 1])."""
    epsT = jnp.zeros((NP, TRUNK1), jnp.float32)
    epsb = jnp.zeros((NP, 1), jnp.float32)
    for name, off, rows in _SEGS:
        epsT = epsT.at[off:off + rows].set(jnp.asarray(noise[name]["w_eps"]).T)
        epsb = epsb.at[off:off + rows].set(
            jnp.asarray(noise[name]["b_eps"], jnp.float32)[:, None])
    weT = jnp.asarray(noise["noisy_advantage2"]["w_eps"]).T
    be = jnp.asarray(noise["noisy_advantage2"]["b_eps"], jnp.float32)[:, None]
    for a in range(A):
        r = _a2_rows(a)
        epsT = epsT.at[r:r + ATOMS].set(weT[a * ATOMS:(a + 1) * ATOMS])
        epsb = epsb.at[r:r + ATOMS].set(be[a * ATOMS:(a + 1) * ATOMS])
    return epsT, epsb


# ---------------------------------------------------------------------------
# Forward + learner math (pure jnp on env-last [rows, n] layout; shared by
# the kernel and the CPU parity tests, like fused_trainer.learn_math).
# ---------------------------------------------------------------------------

def _rb_fwd(p8, eps2, x):
    """Full forward on scaled obs x [10, n] -> dict of intermediates.

    dists: list of A [AP, n] softmax distributions (pad rows exactly 0).
    """
    t0T, t0b, t1T, t1b, nmuT, nmub, nsgT, nsgb = p8
    epsT, epsb = eps2
    W = nmuT + nsgT * epsT
    B = nmub + nsgb * epsb
    z1 = _mm(t0T, x) + t0b
    h1 = jnp.maximum(z1, 0.0)
    z2 = _mm(t1T, h1) + t1b
    h2 = jnp.maximum(z2, 0.0)
    zv1 = _mm(W[OFF_V1:OFF_V1 + TRUNK1], h2) + B[OFF_V1:OFF_V1 + TRUNK1]
    hv1 = jnp.maximum(zv1, 0.0)
    zv2 = _mm(W[OFF_V2:OFF_V2 + AP], hv1) + B[OFF_V2:OFF_V2 + AP]   # [AP, n]
    za1 = _mm(W[OFF_A1:OFF_A1 + TRUNK1], h2) + B[OFF_A1:OFF_A1 + TRUNK1]
    ha1 = jnp.maximum(za1, 0.0)
    za2 = _mm(W[OFF_A2:], ha1) + B[OFF_A2:]                          # [A*AP, n]

    adv = [za2[a * AP:(a + 1) * AP] for a in range(A)]
    mean_adv = sum(adv) * (1.0 / A)
    amask = _atom_mask()
    dists = []
    for a in range(A):
        logits = zv2 + adv[a] - mean_adv
        lm = jnp.max(jnp.where(amask > 0.5, logits, -1e30), axis=0,
                     keepdims=True)
        e = amask * jnp.exp(logits - lm)
        dists.append(e / jnp.sum(e, axis=0, keepdims=True))
    return {"W": W, "z1": z1, "h1": h1, "z2": z2, "h2": h2, "zv1": zv1,
            "hv1": hv1, "za1": za1, "ha1": ha1, "dists": dists}


def _rb_q(dists):
    """E[Z] per action from A [AP, n] distributions -> [A, n]."""
    zsup = _support_col()
    return jnp.stack([jnp.sum(d * zsup, axis=0) for d in dists])


def _projection(next_probs, reward, done, gamma, faithful):
    """Categorical projection on [AP, n] layout (ops.projection semantics,
    hat-function form -- see module docstring)."""
    zsup = _support_col()
    mass = next_probs * zsup if faithful else next_probs
    nd = 1.0 - done.astype(jnp.float32)
    tz = jnp.clip(reward[None, :] + nd[None, :] * gamma * zsup,
                  V_MIN, V_MAX)
    b = (tz - V_MIN) * (1.0 / DELTA_Z)
    if faithful:
        mass = mass * (jnp.floor(b) != jnp.ceil(b)).astype(jnp.float32)
    rows = [jnp.sum(mass * jnp.maximum(0.0, 1.0 - jnp.abs(b - float(i))),
                    axis=0) for i in range(ATOMS)]
    rows += [jnp.zeros_like(rows[0])] * (AP - ATOMS)
    return jnp.stack(rows)                                           # [AP, n]


def rainbow_learn_math(p, tp, m, v, eps, teps, batch, t, *, gamma, lr,
                       obs_scale, faithful, weights=None):
    """One C51 + Adam step; returns (new_p, new_m, new_v, loss, ce).

    ``batch``: obs [10, n], action i32 [n], reward [n], next_obs [10, n],
    done bool [n] (raw obs; scaling applied here).  ``t``: 1-based Adam
    step.  ``weights`` (f32 [n], optional): PER importance weights --
    the loss becomes ``mean(weights * ce)`` and the returned ``ce``
    stays unweighted, exactly agents.rainbow.rainbow_loss's contract
    (its ce feeds ``per_update_priorities``).  Mirrors
    agents.rainbow.rainbow_loss + optax.adam exactly (locked by
    tests/test_fused_rainbow.py).
    """
    scale = 1.0 if obs_scale is None else float(obs_scale)
    x = batch["obs"] * scale
    xn = batch["next_obs"] * scale
    n = x.shape[1]

    # Target path: selection AND evaluation via the target net
    # (ranbowdqn.py:554-563), then categorical projection.
    ft = _rb_fwd(tp, teps, xn)
    q_t = ft["dists"]
    star = _argmax0(_rb_q(q_t), A)                                   # [n]
    next_probs = sum(q_t[a] * (star == a).astype(jnp.float32)[None, :]
                     for a in range(A))
    proj = _projection(next_probs, batch["reward"], batch["done"],
                       gamma, faithful)

    # Online forward + selected-action distribution, clamped (:595-600).
    f = _rb_fwd(p, eps, x)
    a1h = [(batch["action"] == a).astype(jnp.float32)[None, :]
           for a in range(A)]
    dist_sel = sum(f["dists"][a] * a1h[a] for a in range(A))         # [AP, n]
    clipped = jnp.clip(dist_sel, 0.01, 0.99)
    # log of pad rows (exact 0 -> clipped 0.01) is finite; proj pad = 0.
    ce = -jnp.sum(proj * jnp.log(clipped), axis=0)
    w = jnp.ones_like(ce) if weights is None else weights
    loss = jnp.mean(ce * w)

    # --- hand backprop -----------------------------------------------------
    inr = ((dist_sel > 0.01) & (dist_sel < 0.99)).astype(jnp.float32)
    g = -(proj / clipped) * inr * (w[None, :] * (1.0 / n))           # [AP, n]
    s = jnp.sum(g * dist_sel, axis=0, keepdims=True)
    dl = dist_sel * g - dist_sel * s          # dlogits of the selected action
    # Dueling: dvalue = sum_a dlogits_a = dl; dadv_a = (1{a=a1} - 1/A) dl.
    dzv2 = dl
    dza2 = jnp.concatenate([(a1h[a] - 1.0 / A) * dl for a in range(A)])

    W = f["W"]
    hv1, ha1, h2, h1 = f["hv1"], f["ha1"], f["h2"], f["h1"]
    dWv2 = _mm_nt(dzv2, hv1)
    dbv2 = jnp.sum(dzv2, axis=1, keepdims=True)
    dhv1 = _mm_tn(W[OFF_V2:OFF_V2 + AP], dzv2)
    dzv1 = dhv1 * (f["zv1"] > 0.0).astype(jnp.float32)
    dWv1 = _mm_nt(dzv1, h2)
    dbv1 = jnp.sum(dzv1, axis=1, keepdims=True)

    dWa2 = _mm_nt(dza2, ha1)
    dba2 = jnp.sum(dza2, axis=1, keepdims=True)
    dha1 = _mm_tn(W[OFF_A2:], dza2)
    dza1 = dha1 * (f["za1"] > 0.0).astype(jnp.float32)
    dWa1 = _mm_nt(dza1, h2)
    dba1 = jnp.sum(dza1, axis=1, keepdims=True)

    dh2 = (_mm_tn(W[OFF_V1:OFF_V1 + TRUNK1], dzv1)
           + _mm_tn(W[OFF_A1:OFF_A1 + TRUNK1], dza1))
    t0T, _, t1T, _, _, _, _, _ = p
    dz2 = dh2 * (f["z2"] > 0.0).astype(jnp.float32)
    dW1T = _mm_nt(dz2, h1)
    db1 = jnp.sum(dz2, axis=1, keepdims=True)
    dz1 = _mm_tn(t1T, dz2) * (f["z1"] > 0.0).astype(jnp.float32)
    dW0T = _mm_nt(dz1, x)
    db0 = jnp.sum(dz1, axis=1, keepdims=True)

    dnW = jnp.concatenate([dWv1, dWv2, dWa1, dWa2])                  # [NP, 64]
    dnb = jnp.concatenate([dbv1, dbv2, dba1, dba2])
    epsT, epsb = eps
    grads = (dW0T, db0, dW1T, db1, dnW, dnb, dnW * epsT, dnb * epsb)

    tf = t.astype(jnp.float32)
    c1 = 1.0 - jnp.exp(tf * math.log(ADAM_B1))
    c2 = 1.0 - jnp.exp(tf * math.log(ADAM_B2))
    new_p, new_m, new_v = [], [], []
    for pi, mi, vi, gi in zip(p, m, v, grads):
        mi = ADAM_B1 * mi + (1.0 - ADAM_B1) * gi
        vi = ADAM_B2 * vi + (1.0 - ADAM_B2) * gi * gi
        upd = lr * (mi / c1) / (jnp.sqrt(vi / c2) + ADAM_EPS)
        new_p.append(pi - upd)
        new_m.append(mi)
        new_v.append(vi)
    return tuple(new_p), tuple(new_m), tuple(new_v), loss, ce


# ---------------------------------------------------------------------------
# n-step + PER building blocks (pure jnp on Mosaic-safe primitives --
# dot_general, iota, static slices -- shared by the kernel and the CPU
# parity tests, like rainbow_learn_math).
# ---------------------------------------------------------------------------

def nstep_batch_from_slabs(slabs, gamma):
    """Reconstruct n-step transitions from ``n_step`` consecutive ring
    slabs (temporal order; ``slabs[0]`` is the start round).

    Produces exactly ops.nstep's emission content -- the discounted
    return truncated at the first episode end, done = any done in the
    window up to that point, and the bootstrap ``next_obs`` from the
    stop round (nstep.py:48-93) -- reconstructed at SAMPLE time from
    the slab ring instead of maintained in a sliding window, which is
    free on a round-structured ring: round r+k holds lane l's step
    t+k whenever no reset intervened, and the stored per-step ``done``
    flags encode every reset.  For ``n_step == 1`` this reduces
    bit-exactly to the plain 1-step batch.
    """
    g0 = slabs[0]
    ret = jnp.zeros_like(g0[21])
    next_obs = jnp.zeros_like(g0[10:20])
    alive = jnp.ones_like(g0[22])      # no done at rounds < k yet
    n_step = len(slabs)
    for k, s in enumerate(slabs):
        done_k = s[22]
        ret = ret + (gamma ** k) * s[21] * alive
        sel = alive * done_k if k < n_step - 1 else alive
        next_obs = next_obs + sel[None, :] * s[10:20]
        alive = alive * (1.0 - done_k)
    return {"obs": g0[0:10], "action": g0[20].astype(jnp.int32),
            "reward": ret, "next_obs": next_obs, "done": alive < 0.5}


def _inclusive_prefix_cols(x):
    """Inclusive prefix sums along the last axis of ``x`` [r, c] via a
    c x c upper-triangular one-hot matmul (c <= 128: one MXU tile)."""
    c = x.shape[-1]
    ii = lax.broadcasted_iota(jnp.int32, (c, c), 0)
    jj = lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return _mm(x, (ii <= jj).astype(jnp.float32))


def per_pick(P, u):
    """Proportional inverse-CDF selection over a round-slab priority grid.

    ``P`` f32 [R, n]: per-transition priorities (already alpha-powered,
    invalid slots zeroed).  ``u`` f32 [B, 1]: target positions in
    ``[0, sum(P))``.  Returns ``(ohR [B, R], ohL [B, n], p_sel [B])`` --
    one-hot round and lane selectors plus the selected priorities.

    Index order is round-major/lane-minor and the pick is the
    ``searchsorted(cdf, u, side='right')`` index (clipped), i.e. the
    flat-cdf semantics of ops.per.per_sample (per.py:76-82) on this
    grid.  Implemented as three levels of count-and-one-hot (rounds ->
    128-lane blocks -> lanes) so every op is a static slice, an iota
    comparison or a triangular matmul -- no cumsum/gather/scatter
    primitives, hence Mosaic- and interpreter-safe.
    """
    R, n = P.shape
    B = u.shape[0]
    # Level 1: rounds.
    s_r = jnp.sum(P, axis=1, keepdims=True)                     # [R, 1]
    ir = lax.broadcasted_iota(jnp.int32, (R, R), 0)
    jr = lax.broadcasted_iota(jnp.int32, (R, R), 1)
    prefix = _mm((jr <= ir).astype(jnp.float32), s_r)           # [R, 1] incl.
    cntR = jnp.sum((jnp.transpose(prefix) <= u).astype(jnp.int32),
                   axis=1, keepdims=True)                       # [B, 1]
    cntR = jnp.minimum(cntR, R - 1)
    ohR = (lax.broadcasted_iota(jnp.int32, (B, R), 1)
           == cntR).astype(jnp.float32)                         # [B, R]
    v = u - _mm(ohR, prefix - s_r)                              # [B, 1]
    prow = _mm(ohR, P)                                          # [B, n]
    # Level 2: 128-lane blocks of the chosen round.
    G = n // 128
    S = jnp.concatenate(
        [jnp.sum(prow[:, g * 128:(g + 1) * 128], axis=1, keepdims=True)
         for g in range(G)], axis=1)                            # [B, G]
    gpref = _inclusive_prefix_cols(S)                           # [B, G]
    cntG = jnp.minimum(jnp.sum((gpref <= v).astype(jnp.int32),
                               axis=1, keepdims=True), G - 1)
    ohG = (lax.broadcasted_iota(jnp.int32, (B, G), 1)
           == cntG).astype(jnp.float32)                         # [B, G]
    v2 = v - jnp.sum(ohG * (gpref - S), axis=1, keepdims=True)
    brow = sum(ohG[:, g:g + 1] * prow[:, g * 128:(g + 1) * 128]
               for g in range(G))                               # [B, 128]
    # Level 3: lanes within the chosen block.
    bpref = _inclusive_prefix_cols(brow)
    cntL = jnp.minimum(jnp.sum((bpref <= v2).astype(jnp.int32),
                               axis=1, keepdims=True), 127)
    oh128 = (lax.broadcasted_iota(jnp.int32, (B, 128), 1)
             == cntL).astype(jnp.float32)                       # [B, 128]
    ohL = jnp.concatenate([ohG[:, g:g + 1] * oh128 for g in range(G)],
                          axis=1)                               # [B, n]
    return ohR, ohL, jnp.sum(prow * ohL, axis=1)


def per_gather_slabs(ring_slabs, ohR, ohL, n_step):
    """Gather ``n_step`` consecutive slabs for B sampled (round, lane)
    starts via one-hot MXU contractions.

    ``ring_slabs``: list of R [NUM_F, n] slab views (temporal ring
    positions).  Successor k of start round r is ring position
    (r + k) mod R, i.e. the start one-hot with its columns rolled by k
    (a static concatenate).  Returns ``n_step`` [NUM_F, B] slabs.
    """
    R = len(ring_slabs)
    out = []
    ohRk = ohR
    for k in range(n_step):
        if k:
            ohRk = jnp.concatenate([ohR[:, R - k:], ohR[:, :R - k]], axis=1)
        acc = None
        for r in range(R):
            w_r = ohRk[:, r:r + 1] * ohL                        # [B, n]
            c = _mm_nt(ring_slabs[r], w_r)                      # [NUM_F, B]
            acc = c if acc is None else acc + c
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _f_scale(x):
    """sign(x) * sqrt(|x|) (ranbowdqn.py:493-496)."""
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def _pow(x, p):
    """x ** p for x > 0 as exp(p * log(x)) -- Mosaic has no powf
    legalization; the clamp guards the measure-zero log(0) edge."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-30)))


def _normals(shape):
    """Box-Muller standard normals via the on-chip PRNG (cf.
    ops.fused_policy_rollout's randomized-start path; two 2D draws --
    Mosaic PRNG shapes stay 2D)."""
    u = []
    for _ in range(2):
        rs = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        u.append(pltpu.bitcast(rs >> 8, jnp.int32).astype(jnp.float32)
                 * (1.0 / 16777216.0))
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[0], 1e-7)))
    return r * jnp.cos((2.0 * 3.14159265358979) * u[1])


def _fresh_eps():
    """One net's factorized noise: per layer, outer(f(eps_out), f(eps_in))
    packed into [NP, 64], plus an independent bias column [NP, 1]
    (reset_noise, ranbowdqn.py:486-491,537-541)."""
    segs = []
    for rows in (TRUNK1, AP, TRUNK1, A * AP):
        fin = _f_scale(_normals((1, TRUNK1)))
        fout = _f_scale(_normals((rows, 1)))
        segs.append(fout * fin)
    return jnp.concatenate(segs), _f_scale(_normals((NP, 1)))


def _kernel(cfg_ref, rewards_ref, rounds_ref, cols_ref, us_ref, *refs,
            n, R, B, opp, roll, p_greedy, has_eps, gamma, lr, sync_eps,
            obs_scale, faithful, greedy, random_start, per, n_step,
            alpha, beta, ring_hbm=False):
    # inputs: p 8, tp 8, m 8, v 8, eps 2, teps 2, opp 6, env 1, ring 1 (44)
    # outputs: p 8, tp 8, m 8, v 8, eps 2, teps 2, env 1, ring 1, met 1,
    #          loss 1  (40)
    # ring_hbm (uniform path only) adds 3 scratch refs: stage, samp, sems
    ins, outs = refs[:44], refs[44:84]
    p_in, tp_in, m_in, v_in = ins[0:8], ins[8:16], ins[16:24], ins[24:32]
    eps_in, teps_in = ins[32:34], ins[34:36]
    opp_in, env_in, ring_in = ins[36:42], ins[42], ins[43]
    p_o, tp_o, m_o, v_o = outs[0:8], outs[8:16], outs[16:24], outs[24:32]
    eps_o, teps_o = outs[32:34], outs[34:36]
    env_o, ring_o, met_o, loss_o = outs[36], outs[37], outs[38], outs[39]

    i = pl.program_id(0)
    warm = cfg_ref[2]
    prior_learns = cfg_ref[3]
    base = cfg_ref[4]        # prior steps % R (== prior steps while warm==0)
    r_cur = lax.rem(base + i, jnp.int32(R))

    if ring_hbm:
        # HBM-resident ring, uniform sampling path (the reference's own
        # Rainbow configuration, ranbowdqn.py:647: uniform buffer,
        # capacity 10000).  Same DMA pipeline as ops.fused_trainer's
        # ring_hbm, simplified by the unconditional store (no old-row
        # merge) and extended to n_step consecutive-round reads: each
        # step prefetches the next step's n_step [NUM_F, B] windows.  A
        # prefetched round equal to the next step's own write round is
        # patched from the staged slab at learn time.
        assert not per, "PER keeps the VMEM ring (see fused_rainbow_init)"
        stage, samp_buf, sems = refs[84:87]
        slot = lax.rem(i, jnp.int32(2))

        def samp_dma(step_slot, k, start_round, step_col):
            pk = lax.rem(start_round + k, jnp.int32(R))
            return pltpu.make_async_copy(
                ring_o.at[pl.ds(pk * NUM_F, NUM_F), pl.ds(step_col * B, B)],
                samp_buf.at[step_slot, pl.ds(k * NUM_F, NUM_F), :],
                sems.at[step_slot, k])

        def store_dma(step_slot, step_round):
            return pltpu.make_async_copy(
                stage.at[step_slot],
                ring_o.at[pl.ds(step_round * NUM_F, NUM_F), :],
                sems.at[step_slot, n_step])

        def issue_prefetches(step_slot, step):
            for k in range(n_step):
                samp_dma(step_slot, k, rounds_ref[step],
                         cols_ref[step]).start()

    @pl.when(i == 0)
    def _():
        for dst, src in zip(p_o + tp_o + m_o + v_o + eps_o + teps_o,
                            p_in + tp_in + m_in + v_in + eps_in + teps_in):
            dst[:] = src[:]
        env_o[:] = env_in[:]
        if not ring_hbm:
            ring_o[:] = ring_in[:]
        met_o[:] = jnp.zeros((4, n), jnp.float32)
        if ring_hbm:
            issue_prefetches(jnp.int32(0), jnp.int32(0))

    if ring_hbm:
        for k in range(n_step):
            samp_dma(slot, k, rounds_ref[i], cols_ref[i]).wait()

    if not greedy:
        pltpu.prng_seed(cfg_ref[0] + i)
    if has_eps and not greedy:
        bits = pltpu.bitcast(pltpu.prng_random_bits((4, n)), jnp.uint32)
    else:
        bits = (None,) * 4
    if opp == OPP_FROZEN and not greedy:
        fbits = pltpu.bitcast(pltpu.prng_random_bits((2, n)), jnp.uint32)
    else:
        fbits = (None, None)

    # --- current state -------------------------------------------------------
    env = env_o[:]
    pos, vel = env[0:2], env[2:4]
    x1, y1, x2, y2 = env[4], env[5], env[6], env[7]
    winner = env[8].astype(jnp.int32)
    tcnt = env[9].astype(jnp.int32)
    ep_rew = env[10]
    synced = env[11]        # replicated f32 scalar row: target-sync chunks
    ep_cum = env[12]        # per-lane CUMULATIVE episode counts (never
                            # reset): their sum is the episode total this
                            # kernel instance has seen, so the episodic
                            # sync below needs no host-supplied prior and
                            # stays internally consistent on any mesh
                            # (per-device counts under SPMD)
    maxp = env[13]          # replicated PER running max priority (pre-
                            # alpha); read BEFORE the learn so this
                            # step's ring write uses the prior max,
                            # matching the XLA order (rainbow.py:263
                            # before :293)

    obs = jnp.stack([
        x2 - x1, y2 - y1, vel[1] - vel[0], C.END_POINT - pos[0], vel[0],
        x1 - x2, y1 - y2, vel[0] - vel[1], C.END_POINT - pos[1], vel[1],
    ])
    scale = 1.0 if obs_scale is None else float(obs_scale)

    # --- actor: noisy-greedy argmax of E[Z] (ranbowdqn.py:543-548) -----------
    p_now = tuple(r[:] for r in p_o)
    eps_now = tuple(r[:] for r in eps_o)

    def act(x):
        return _argmax0(_rb_q(_rb_fwd(p_now, eps_now, x * scale)["dists"]), A)

    threshold = jnp.uint32(min(int(p_greedy * 4294967296.0), 4294967295))

    def explore(a, mask_b, rand_b):
        if greedy or not has_eps:
            return a
        rand = (rand_b % jnp.uint32(A)).astype(jnp.int32)
        return jnp.where(mask_b < threshold, a, rand)

    a1 = explore(act(obs), bits[0], bits[1])
    if opp == OPP_L0:
        a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
    elif opp == OPP_SELFPLAY:
        # state[roll:] + state[:roll] (ranbowdqn.py:669; roll=5 correct,
        # 3 reproduces the reference bug -- agents.rainbow.opponent_roll).
        obs2 = jnp.concatenate([obs[roll:], obs[:roll]])
        a2 = explore(act(obs2), bits[2], bits[3])
    else:
        # Frozen MLP ladder rung through the Phi(0.7)-greedy actor
        # (agents.rainbow's opponent="frozen" extension; main.py:105).
        obs2 = jnp.concatenate([obs[5:], obs[:5]])
        _, _, _, _, q2 = _fwd(tuple(r[:] for r in opp_in), obs2)
        best2 = _argmax0(q2, A)
        if greedy:
            a2 = best2
        else:
            thr70 = jnp.uint32(int(_phi(0.7) * 4294967296.0))
            rnd2 = (fbits[1] % jnp.uint32(A)).astype(jnp.int32)
            a2 = jnp.where(fbits[0] < thr70, best2, rnd2)
    actions = jnp.stack([a1, a2])

    # --- env step --------------------------------------------------------------
    rcfg = tuple(rewards_ref[k] for k in range(5))
    npos, nvel, nwin, ntcnt, done, col, rewards, next_obs, coords = \
        _env_step_math(pos, vel, winner, tcnt, jnp.zeros((n,), bool),
                       actions, rcfg, cfg_ref[1])

    # --- replay write: unconditional (ranbowdqn.py:673); with PER the
    # slab's pad row carries the transition's priority, initialised to
    # the running max (pre-alpha) ** alpha (ranbowdqn.py:353-358) --------------
    pad_row = _pow(maxp, alpha) if per else jnp.zeros((n,), jnp.float32)
    slab = jnp.concatenate([
        obs, next_obs,
        jnp.stack([a1.astype(jnp.float32), rewards[0],
                   done.astype(jnp.float32), pad_row]),
    ])
    if ring_hbm:
        stage[slot] = slab
        store_dma(slot, r_cur).start()
    else:
        ring_o[pl.ds(r_cur * NUM_F, NUM_F), :] = slab

    # --- learner (gate: >= n_step + 1 stored rounds -- the vectorised
    # fill>batch of ranbowdqn.py:682, generalised so at least one n-step
    # start round plus its window is stored; rounds_ref is host-drawn
    # within the valid prefix on the uniform path) ----------------------------
    can_learn = (warm == 1) | (base + i >= n_step)
    lc = prior_learns + jnp.where(warm == 1, i,
                                  i - (jnp.int32(n_step) - base))

    @pl.when(can_learn)
    def _():
        if per:
            # --- on-chip prioritised sampling (ops.per semantics) ----------
            stored = jnp.minimum(cfg_ref[5] + i + 1, jnp.int32(R))
            rowi = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            age = lax.rem(r_cur - rowi + jnp.int32(R), jnp.int32(R))
            validr = (age >= n_step - 1) & (age <= stored - 1)
            P = jnp.concatenate(
                [ring_o[r * NUM_F + NUM_F - 1:r * NUM_F + NUM_F, :]
                 for r in range(R)])                            # [R, n]
            P = jnp.where(validr, P, 0.0)
            total = jnp.sum(P)
            # B stratified positions from ONE host uniform per step
            # (u_b = (b + u)/B * total): each stratum's draw is exact;
            # strata share the offset (documented deviation from
            # per.py:79-80's independent strata).
            # (int iota + cast: Mosaic's tpu.iota is integer-only)
            bcol = lax.broadcasted_iota(jnp.int32, (B, 1), 0).astype(
                jnp.float32)
            u = (bcol + us_ref[i]) * (total * (1.0 / B))        # [B, 1]
            ohR, ohL, p_sel = per_pick(P, u)
            slabs = per_gather_slabs(
                [ring_o[r * NUM_F:(r + 1) * NUM_F, :] for r in range(R)],
                ohR, ohL, n_step)
            batch = nstep_batch_from_slabs(slabs, gamma)
            # Importance weights, max-weight (min-priority) normalised
            # (per.py:83-88).
            nvalid = (stored - (n_step - 1)).astype(jnp.float32) * float(n)
            w = _pow(p_sel * (nvalid / total), -beta)
            pmin = jnp.min(jnp.where(P > 0.0, P, jnp.inf))
            w = w * _pow(pmin * (nvalid / total), beta)         # [B]
        elif ring_hbm:
            # Prefetched [NUM_F, B] windows; a window whose round equals
            # this step's write round is patched from the staged slab
            # (the VMEM path reads the ring AFTER the write, so the
            # current transition is sampleable -- same semantics here).
            pos = rounds_ref[i]
            slabs = []
            for k in range(n_step):
                pk = lax.rem(pos + k, jnp.int32(R)) if k else pos
                win = samp_buf[slot, pl.ds(k * NUM_F, NUM_F), :]
                mine = stage[slot, :, pl.ds(cols_ref[i] * B, B)]
                slabs.append(jnp.where(pk == r_cur, mine, win))
            batch = nstep_batch_from_slabs(slabs, gamma)
            w = None
        else:
            pos = rounds_ref[i]
            slabs = []
            for k in range(n_step):
                pk = lax.rem(pos + k, jnp.int32(R)) if k else pos
                if B == n:
                    slabs.append(ring_o[pl.ds(pk * NUM_F, NUM_F), :])
                else:
                    # Uniformly chosen disjoint B-lane window of the
                    # chosen round (the fused_trainer learn_batch
                    # pattern: cuts the dominant C51 learner cost by
                    # n/B and restores a reference-scale batch,
                    # ranbowdqn.py:682 uses 32).
                    slabs.append(ring_o[pl.ds(pk * NUM_F, NUM_F),
                                        pl.ds(cols_ref[i] * B, B)])
            batch = nstep_batch_from_slabs(slabs, gamma)
            w = None
        new_p, new_m, new_v, loss, ce = rainbow_learn_math(
            tuple(r[:] for r in p_o), tuple(r[:] for r in tp_o),
            tuple(r[:] for r in m_o), tuple(r[:] for r in v_o),
            tuple(r[:] for r in eps_o), tuple(r[:] for r in teps_o),
            batch, lc + 1, gamma=gamma, lr=lr, obs_scale=obs_scale,
            faithful=faithful, weights=w)
        for dst, val in zip(p_o + m_o + v_o, new_p + new_m + new_v):
            dst[:] = val
        loss_o[:] = jnp.full((8, 128), loss, jnp.float32)
        if per:
            # --- priority update at the sampled starts (per.py:94-101):
            # new pre-alpha priority ce + 1e-5 (rainbow.py:293), running
            # max tracked in the replicated env row.  Duplicate draws of
            # one slot share the same ce, so the mean-blend below equals
            # the reference's last-write .at[].set.
            newp_pre = jnp.maximum(ce + 1e-5, 1e-8)             # [B]
            newp = _pow(newp_pre, alpha)
            for r in range(R):
                w_r = ohR[:, r:r + 1] * ohL                     # [B, n]
                cov = jnp.sum(w_r, axis=0, keepdims=True)       # [1, n]
                contrib = jnp.sum(w_r * newp[:, None], axis=0,
                                  keepdims=True)
                old = ring_o[r * NUM_F + NUM_F - 1:r * NUM_F + NUM_F, :]
                ring_o[r * NUM_F + NUM_F - 1:r * NUM_F + NUM_F, :] = \
                    jnp.where(cov > 0.0, contrib / jnp.maximum(cov, 1.0),
                              old)
            env_o[13] = jnp.maximum(maxp, jnp.max(newp_pre))
        # reset_noise on both nets AFTER the update (ranbowdqn.py:606-607);
        # during warm-up the acting noise stays fixed, as in the reference.
        if not greedy:
            for dst, val in zip(eps_o, _fresh_eps()):
                dst[:] = val
            for dst, val in zip(teps_o, _fresh_eps()):
                dst[:] = val

    @pl.when(jnp.logical_not(can_learn))
    def _():
        loss_o[:] = jnp.zeros((8, 128), jnp.float32)

    # --- metrics ----------------------------------------------------------------
    ep_rew = ep_rew + rewards[0]
    won = done & (obs[8] > obs[3])
    met_now = met_o[:] + jnp.stack([
        done.astype(jnp.float32), col.astype(jnp.float32),
        won.astype(jnp.float32), jnp.where(done, ep_rew, 0.0)])
    met_o[:] = met_now
    ep_rew = jnp.where(done, 0.0, ep_rew)

    # --- episodic target sync (ranbowdqn.py:690-691): hard copy when the
    # completed-episode count crosses a sync_eps boundary ----------------------
    ep_cum = ep_cum + done.astype(jnp.float32)
    ep_total = jnp.sum(ep_cum)
    chunks = jnp.floor(ep_total * (1.0 / sync_eps))
    do_sync = chunks > synced[0]

    @pl.when(do_sync)
    def _():
        for dst, src in zip(tp_o, p_o):
            dst[:] = src[:]

    synced = jnp.maximum(synced, chunks)

    # --- auto-reset + writeback --------------------------------------------------
    reset = done[None, :]
    if random_start:
        pos_r, vel_r, xy_r = _random_reset_vals(n)
    else:
        pos_r, vel_r = C.START_POINT, C.START_VEL
        sp = jnp.full((n,), C.START_POINT, jnp.float32)
        x1r, y1r = lon2coord(sp, +1.0)
        x2r, y2r = lon2coord(sp, -1.0)
        xy_r = jnp.stack([x1r, y1r, x2r, y2r])
    env_o[0:2] = jnp.where(reset, pos_r, npos)
    env_o[2:4] = jnp.where(reset, vel_r, nvel)
    env_o[4:8] = jnp.where(reset, xy_r, coords)
    env_o[8] = jnp.where(done, 0, nwin).astype(jnp.float32)
    env_o[9] = jnp.where(done, 0, ntcnt).astype(jnp.float32)
    env_o[10] = ep_rew
    env_o[11] = synced
    env_o[12] = ep_cum

    if ring_hbm:
        # Store must land before the next step's prefetches are issued
        # (a drawn window may include the row just written).
        store_dma(slot, r_cur).wait()

        @pl.when(i < pl.num_programs(0) - 1)
        def _():
            issue_prefetches(lax.rem(i + jnp.int32(1), jnp.int32(2)),
                             i + jnp.int32(1))


# ---------------------------------------------------------------------------
# Host API
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R", "B", "opp", "roll",
                              "p_greedy", "has_eps", "gamma", "lr",
                              "sync_eps", "obs_scale", "faithful", "greedy",
                              "random_start", "per", "n_step", "alpha",
                              "beta", "interpret"))
def _call(cfg, rewards_vec, rounds, cols, us, arrays, num_steps, n, R, B,
          opp, roll, p_greedy, has_eps, gamma, lr, sync_eps, obs_scale,
          faithful, greedy, random_start=False, per=False, n_step=1,
          alpha=0.6, beta=0.4, interpret=False):
    kernel = functools.partial(
        _kernel, n=n, R=R, B=B, opp=opp, roll=roll, p_greedy=p_greedy,
        has_eps=has_eps, gamma=gamma, lr=lr, sync_eps=sync_eps,
        obs_scale=obs_scale, faithful=faithful, greedy=greedy,
        random_start=random_start, per=per, n_step=n_step, alpha=alpha,
        beta=beta)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
                + [whole(a.shape) for a in arrays])
    state_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in arrays[:36]]          # p, tp, m, v, eps, teps
    out_shape = tuple(
        state_shapes
        + [jax.ShapeDtypeStruct((ENV_ROWS, n), jnp.float32),
           jax.ShapeDtypeStruct((R * NUM_F, n), jnp.float32),
           jax.ShapeDtypeStruct((4, n), jnp.float32),
           jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = tuple(
        [whole(s.shape) for s in state_shapes]
        + [whole((ENV_ROWS, n)), whole((R * NUM_F, n)), whole((4, n)),
           whole((8, 128))])
    extra = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        kernel, grid=(num_steps,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, rounds, cols, us, *arrays)


@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R", "B", "opp", "roll",
                              "p_greedy", "has_eps", "gamma", "lr",
                              "sync_eps", "obs_scale", "faithful", "greedy",
                              "random_start", "n_step", "interpret"),
    donate_argnames=("ring",))
def _call_hbm(cfg, rewards_vec, rounds, cols, us, arrays, ring, num_steps,
              n, R, B, opp, roll, p_greedy, has_eps, gamma, lr, sync_eps,
              obs_scale, faithful, greedy, random_start=False, n_step=1,
              interpret=False):
    """HBM-ring launch for the UNIFORM sampling path (cf.
    ops.fused_trainer._call_hbm): the ring is an ANY-space operand
    aliased in/out to one donated HBM buffer; the kernel DMAs
    [NUM_F, ...] rows through double-buffered VMEM scratch.  Ring
    capacity is then HBM-bounded: R = 10000 rounds (the reference's
    full Rainbow replay depth in time steps, ranbowdqn.py:647) fits at
    8K envs (7.9 GB)."""
    kernel = functools.partial(
        _kernel, n=n, R=R, B=B, opp=opp, roll=roll, p_greedy=p_greedy,
        has_eps=has_eps, gamma=gamma, lr=lr, sync_eps=sync_eps,
        obs_scale=obs_scale, faithful=faithful, greedy=greedy,
        random_start=random_start, per=False, n_step=n_step,
        alpha=0.6, beta=0.4, ring_hbm=True)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
                + [whole(a.shape) for a in arrays]
                + [pl.BlockSpec(memory_space=pl.ANY)])
    state_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in arrays[:36]]          # p, tp, m, v, eps, teps
    out_shape = tuple(
        state_shapes
        + [jax.ShapeDtypeStruct((ENV_ROWS, n), jnp.float32),
           jax.ShapeDtypeStruct((R * NUM_F, n), jnp.float32),
           jax.ShapeDtypeStruct((4, n), jnp.float32),
           jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = tuple(
        [whole(s.shape) for s in state_shapes]
        + [whole((ENV_ROWS, n)), pl.BlockSpec(memory_space=pl.ANY),
           whole((4, n)), whole((8, 128))])
    extra = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        kernel, grid=(num_steps,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        # ring operand = input index 5 (cfg..us) + 43 (p..env)
        input_output_aliases={5 + len(arrays): 37},
        scratch_shapes=[
            pltpu.VMEM((2, NUM_F, n), jnp.float32),           # store stage
            pltpu.VMEM((2, NUM_F * n_step, B), jnp.float32),  # sample windows
            pltpu.SemaphoreType.DMA((2, n_step + 1)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, rounds, cols, us, *arrays, ring)


def fused_rainbow_init(key, cfg, env_params, num_envs, opp_params=None,
                       learn_batch=None, ring_hbm=None):
    """Fresh training state for the single-kernel Rainbow trainer.

    ``cfg``: agents.rainbow.RainbowConfig -- including ``per`` (on-chip
    prioritised sampling over the ring's pad-row priorities) and
    ``n_step`` (returns reconstructed at sample time from consecutive
    slabs; see the module docstring).  ``cfg.batch_size`` is used only
    as the PER default batch: on the uniform path the learner batch is
    ``num_envs`` unless ``learn_batch`` (a multiple of 128 dividing
    num_envs) is given, in which case each learn consumes a uniformly
    chosen disjoint lane window of that width -- the dominant C51
    learner cost scales down by num_envs/learn_batch (cf.
    ops.fused_trainer's learn_batch).  With ``per``, ``learn_batch``
    (default cfg.batch_size rounded up to a multiple of 8) is the
    number of i.i.d. prioritised draws per learn.
    ``cfg.memory_capacity`` must be k*num_envs with k >= n_step + 1.

    ``ring_hbm`` (default None = auto, uniform path only): keep the ring
    in HBM and DMA [NUM_F, ...] windows through double-buffered VMEM
    scratch (cf. ops.fused_trainer ring_hbm).  Auto turns it on when the
    VMEM ring would exceed 24 MB.  Capacity then scales to HBM --
    R = 10000 rounds, the reference's Rainbow replay depth in time
    steps (ranbowdqn.py:647), fits at 8K envs.  PER keeps the VMEM
    ring: its on-chip inverse-CDF and priority write-back scan the full
    [R, n] priority grid with MXU one-hot contractions every learn,
    which no memory space change removes -- reference-depth PER needs
    the hierarchical round-sum design noted in docs/BENCHMARKS.md.
    """
    from merging_gym_tpu.nn.rainbow_net import rainbow_init, rainbow_sample_noise

    if cfg.num_actions != A or cfg.num_atoms != ATOMS:
        raise ValueError(f"fused_rainbow is compiled for {A} actions x "
                         f"{ATOMS} atoms")
    if num_envs % 128 != 0:
        raise ValueError(f"num_envs must be a multiple of 128, got {num_envs}")
    if cfg.n_step < 1:
        raise ValueError(f"n_step must be >= 1, got {cfg.n_step}")
    if cfg.per:
        # PER draws are i.i.d. one-hot gathers, not lane windows: any
        # sublane-aligned batch works.
        B = -(-cfg.batch_size // 8) * 8 if learn_batch is None \
            else int(learn_batch)
        if B % 8 != 0 or B < 8:
            raise ValueError("with per, learn_batch must be a positive "
                             f"multiple of 8, got {B}")
    else:
        B = num_envs if learn_batch is None else int(learn_batch)
        if B % 128 != 0 or num_envs % B != 0:
            raise ValueError("learn_batch must be a multiple of 128 dividing "
                             f"num_envs, got learn_batch={B} "
                             f"num_envs={num_envs}")
    R = cfg.memory_capacity // num_envs
    if R < cfg.n_step + 1 or cfg.memory_capacity != R * num_envs:
        raise ValueError("memory_capacity must be k*num_envs with "
                         f"k >= n_step+1 = {cfg.n_step + 1}, got "
                         f"capacity={cfg.memory_capacity} num_envs={num_envs}")
    if (cfg.opponent == OPP_FROZEN) != (opp_params is not None):
        raise ValueError("opp_params must be given exactly when "
                         f"opponent='frozen' (got {cfg.opponent!r})")
    k_net, k_n1, k_n2 = jax.random.split(jax.random.fold_in(key, 2), 3)
    p = rainbow_params_to_packed(
        rainbow_init(k_net, cfg.obs_dim, cfg.num_actions, cfg.num_atoms))
    z = tuple(jnp.zeros_like(a) for a in p)
    opp = (params_to_t(opp_params) if opp_params is not None
           else tuple(jnp.zeros((1, 1), jnp.float32) for _ in range(6)))
    # The frozen-opponent MLP refs must exist even when unused; keep them
    # tiny in L0/selfplay mode.
    n = num_envs
    if ring_hbm is None:
        ring_hbm = (not cfg.per) and R * NUM_F * n * 4 > 24 * 1024 * 1024
    if ring_hbm and cfg.per:
        raise ValueError("ring_hbm supports the uniform path only; PER's "
                         "full-grid priority scan is VMEM-resident (see "
                         "docstring)")
    env = np.zeros((ENV_ROWS, n), np.float32)
    env[0:8] = _init_env_rows(env_params, jax.random.fold_in(key, 7), n)
    env[13] = 1.0   # PER running max priority (per_init, per.py:44)
    return {
        "p": p, "tp": p, "m": z, "v": z,  # update_target at init (:648)
        "eps": rainbow_noise_to_packed(
            rainbow_sample_noise(k_n1, cfg.num_actions, cfg.num_atoms)),
        "teps": rainbow_noise_to_packed(
            rainbow_sample_noise(k_n2, cfg.num_actions, cfg.num_atoms)),
        "opp": opp,
        "env": jnp.asarray(env), "ring": jnp.zeros((R * NUM_F, n), jnp.float32),
        "R": R, "n": n, "B": B, "ring_hbm": int(bool(ring_hbm)),
        "warm": 0, "learns": 0, "steps": 0,
        "env_steps": 0,
        "episodes": 0.0, "collisions": 0.0, "wins": 0.0, "sum_ep_reward": 0.0,
        "last_loss": 0.0,
    }


def fill_schedule(carry, num_steps):
    """Rounds stored after step i's ring write: min(prior_steps+i+1, R).
    Shared by the single-chip and SPMD round-draw paths so the
    uniform-over-filled-prefix contract has one definition."""
    R = carry["R"]
    return jnp.minimum(jnp.asarray(carry["steps"], jnp.int32)
                       + jnp.arange(num_steps, dtype=jnp.int32) + 1, R)


def draw_start_rounds(carry, num_steps, key, n_step):
    """Uniform n-step START positions: a transition age drawn uniformly
    from [n_step-1, stored-1] (so the whole forward window is stored),
    mapped to its ring position (steps + i - age) mod R.  Shared by the
    single-chip and SPMD draws.  For n_step == 1 the existing
    fill_schedule draw is kept instead (identical distribution, stable
    stream)."""
    R = carry["R"]
    u = jax.random.uniform(key, (num_steps,), jnp.float32)
    if n_step == 1:
        fill = fill_schedule(carry, num_steps)
        rounds = jnp.floor(u * fill.astype(jnp.float32)).astype(jnp.int32)
        return jnp.minimum(rounds, fill - 1)
    stored = fill_schedule(carry, num_steps)
    navail = jnp.maximum(stored - (n_step - 1), 1)
    a = (n_step - 1) + jnp.minimum(
        jnp.floor(u * navail.astype(jnp.float32)).astype(jnp.int32),
        navail - 1)
    i = jnp.arange(num_steps, dtype=jnp.int32)
    return jnp.mod(jnp.asarray(carry["steps"], jnp.int32) + i - a,
                   R).astype(jnp.int32)


def apply_rainbow_chunk(carry, out36, env, ring, num_steps, met_sum, loss,
                        nwarm=1):
    """Fold a launch's outputs back into the host-side carry dict (cf.
    ops.fused_trainer.apply_chunk) -- shared by fused_rainbow_chunk and
    parallel.spmd.spmd_fused_rainbow_chunk so the warm/learn counter
    semantics have one definition.  ``nwarm`` (= cfg.n_step) is the
    number of warm-up steps before the first learn (the kernel's
    >= n_step + 1 stored-rounds gate)."""
    p, tp, m, v = out36[0:8], out36[8:16], out36[16:24], out36[24:32]
    eps, teps = out36[32:34], out36[34:36]
    steps = carry["steps"] + num_steps
    warmup_left = 0 if carry["warm"] else max(nwarm - carry["steps"], 0)
    return {
        **carry,
        "p": tuple(p), "tp": tuple(tp), "m": tuple(m), "v": tuple(v),
        "eps": tuple(eps), "teps": tuple(teps),
        "env": env, "ring": ring,
        "warm": 1 if steps >= nwarm else 0,
        "steps": steps,
        "learns": carry["learns"] + max(num_steps - warmup_left, 0),
        "env_steps": carry["env_steps"] + num_steps * carry["n"],
        "episodes": carry["episodes"] + float(met_sum[0]),
        "collisions": carry["collisions"] + float(met_sum[1]),
        "wins": carry["wins"] + float(met_sum[2]),
        "sum_ep_reward": carry["sum_ep_reward"] + float(met_sum[3]),
        "last_loss": float(loss),
    }


def fused_rainbow_chunk(cfg, env_params, carry, num_steps, seed, *,
                        greedy=False, rounds=None, cols=None, us=None):
    """Run ``num_steps`` Rainbow training steps in ONE kernel launch.

    ``rounds`` (i32 [num_steps], default host-drawn from ``seed``): the
    per-step uniform round draw (an n-step START position when
    cfg.n_step > 1), each within the ring's valid prefix at that step;
    ``cols`` likewise draws the lane window when
    ``learn_batch < num_envs``.  With ``cfg.per`` the kernel samples
    on-chip from the ring's priorities instead and consumes ``us``
    (f32 [num_steps] in [0, 1), default host-drawn from ``seed``) as
    the per-step stratified-uniform offset.  ``greedy=True`` freezes
    the noise and skips the PRNG (module docstring) -- the e2e
    determinism mode (PER stays fully deterministic under it: its
    draws come from ``us``, not the on-chip PRNG).
    """
    R, n = carry["R"], carry["n"]
    B = carry.get("B", n)
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps} (a "
                         "zero-iteration grid would skip the state copy "
                         "and return uninitialized outputs)")
    if rounds is None:
        rounds = draw_start_rounds(carry, num_steps,
                                   jax.random.key(seed ^ 0x51C), cfg.n_step)
    if cols is None:
        hi = 1 if cfg.per else n // B
        cols = jax.random.randint(jax.random.key(seed ^ 0xC01), (num_steps,),
                                  0, hi, jnp.int32)
    if us is None:
        us = (jax.random.uniform(jax.random.key(seed ^ 0xBE7),
                                 (num_steps,), jnp.float32)
              if cfg.per else jnp.zeros((num_steps,), jnp.float32))
    rounds = jnp.asarray(rounds, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    us = jnp.asarray(us, jnp.float32)
    if (rounds.shape != (num_steps,) or cols.shape != (num_steps,)
            or us.shape != (num_steps,)):
        raise ValueError("rounds/cols must be i32 [num_steps] and us "
                         "f32 [num_steps]")
    rnp, cnp = np.asarray(rounds), np.asarray(cols)
    col_hi = 1 if cfg.per else n // B
    if (rnp.min() < 0 or rnp.max() >= R
            or cnp.min() < 0 or cnp.max() >= col_hi):
        raise ValueError(f"rounds must lie in [0, {R}) and cols in "
                         f"[0, {col_hi}) (out-of-range values would clamp "
                         "to the buffer edge and silently train on the "
                         "wrong slab)")
    unp = np.asarray(us)
    if unp.min() < 0.0 or unp.max() >= 1.0:
        raise ValueError("us must lie in [0, 1)")
    if env_params.random_start and greedy:
        raise ValueError("random starts need the on-chip PRNG, which "
                         "greedy mode skips; drop one of the two")
    cfgv = jnp.asarray([seed, env_params.max_steps, carry["warm"],
                        carry["learns"], carry["steps"] % R,
                        min(carry["steps"], R)], jnp.int32)
    has_eps = cfg.epsilon is not None
    if carry.get("ring_hbm"):
        if cfg.per:
            raise ValueError("ring_hbm carry with per config")
        arrays = (list(carry["p"]) + list(carry["tp"]) + list(carry["m"])
                  + list(carry["v"]) + list(carry["eps"])
                  + list(carry["teps"]) + list(carry["opp"])
                  + [carry["env"]])
        out = _call_hbm(cfgv, rewards_cfg(env_params), rounds, cols, us,
                        tuple(arrays), carry["ring"],
                        num_steps, n, R, B, cfg.opponent,
                        int(cfg.opponent_roll),
                        _phi(cfg.epsilon) if has_eps else 1.0, has_eps,
                        float(cfg.gamma), float(cfg.lr),
                        float(cfg.target_sync_episodes),
                        None if cfg.obs_scale is None
                        else float(cfg.obs_scale),
                        bool(cfg.faithful_c51), bool(greedy),
                        random_start=bool(env_params.random_start),
                        n_step=int(cfg.n_step),
                        interpret=_interpret_flag())
    else:
        arrays = (list(carry["p"]) + list(carry["tp"]) + list(carry["m"])
                  + list(carry["v"]) + list(carry["eps"])
                  + list(carry["teps"])
                  + list(carry["opp"]) + [carry["env"], carry["ring"]])
        out = _call(cfgv, rewards_cfg(env_params), rounds, cols, us,
                    tuple(arrays),
                    num_steps, n, R, B, cfg.opponent, int(cfg.opponent_roll),
                    _phi(cfg.epsilon) if has_eps else 1.0, has_eps,
                    float(cfg.gamma), float(cfg.lr),
                    float(cfg.target_sync_episodes),
                    None if cfg.obs_scale is None else float(cfg.obs_scale),
                    bool(cfg.faithful_c51), bool(greedy),
                    random_start=bool(env_params.random_start),
                    per=bool(cfg.per), n_step=int(cfg.n_step),
                    alpha=float(cfg.per_alpha), beta=float(cfg.per_beta),
                    interpret=_interpret_flag())
    met = np.asarray(out[38]).sum(axis=1)
    return apply_rainbow_chunk(carry, out[0:36], out[36], out[37],
                               num_steps, met,
                               float(np.asarray(out[39])[0, 0]),
                               nwarm=int(cfg.n_step))


def coerce_rainbow_carry(carry):
    """Fix types after an orbax StandardRestore roundtrip (cf.
    ops.fused_trainer.coerce_carry); a resumed run continues exactly."""
    out = dict(carry)
    for k in ("R", "n", "warm", "learns", "steps", "env_steps"):
        out[k] = int(out[k])
    out["B"] = int(out.get("B", out["n"]))
    out["ring_hbm"] = int(out.get("ring_hbm", 0))
    for k in ("episodes", "collisions", "wins", "sum_ep_reward", "last_loss"):
        out[k] = float(out[k])
    for k in ("p", "tp", "m", "v", "eps", "teps", "opp"):
        out[k] = tuple(jnp.asarray(a, jnp.float32) for a in out[k])
    out["env"] = jnp.asarray(out["env"], jnp.float32)
    if out["env"].shape[0] == ENV_ROWS - 1:
        # Pre-PER checkpoint (13 env rows): append the max-priority row
        # at its init value 1.0 -- inert for uniform runs.
        out["env"] = jnp.concatenate(
            [out["env"], jnp.ones((1, out["env"].shape[1]), jnp.float32)])
    out["ring"] = jnp.asarray(out["ring"], jnp.float32)
    return out
