"""Pallas TPU kernel: the ENTIRE DQN trainer as one kernel.

The XLA trainer (agents.dqn.train_chunk) fuses actor, env, on-device
replay and learner into one lax.scan, but still pays this runtime's
per-scan-iteration floor (docs/BENCHMARKS.md: ~60us/iteration) on every
env step -- and the learner's tiny matmuls (a 22K-param MLP) are pure
dispatch overhead at that scale.  This kernel removes all of it: T
training steps run as the Pallas grid, and EVERY component lives in
on-chip memory across steps --

  * actor: eval-net forward + the reference Phi(0.7)-greedy rule
    (main.py:105) for ego and (selfplay/frozen) opponent, on-chip PRNG;
  * env: dynamics, winner state machine, collision, auto-reset
    (ops.fused_rollout._env_step_math, locked to core.env.step);
  * replay: an R-round ring of whole [field, n] transition slabs,
    overwritten ring-style (main.py:117-118);
  * learner: Double-DQN target with the every-100-learns target sync
    applied *before* the update (main.py:125-127,143-153), hand-derived
    backprop through the 3-layer MLP, and a full Adam update
    (torch.optim.Adam defaults) -- params, target params and both Adam
    moments all resident on-chip.

Training state (params, target, moments, env state, ring, metrics)
lives in the kernel's *output* refs, which persist in VMEM across grid
steps (their block index never changes): step 0 copies the inputs in,
every step mutates in place, and the final values stream back to HBM --
so chunked launches continue training exactly where the last left off.

Sampling semantics -- the one documented deviation: the reference draws
batch-128 uniform-with-replacement over slots (main.py:130).  Pallas
has no vectorized gather, so each learn consumes ONE uniformly chosen
round slab (all n lanes of a random past step; round indices are drawn
host-side with jax.random and streamed through SMEM) -- or, with
``learn_batch=B < num_envs``, one uniformly chosen disjoint B-lane
window of that slab (a dynamic lane-aligned slice), or, with
``learn_rounds=K > 1``, the concatenation of K independent
(round, lane-window) draws of B/K lanes each.  Every stored transition
is sampled with equal probability (uniform marginal over the ring);
at K=1 a batch shares a common age (and, for B < n, a common lane
neighbourhood), which K>=4 breaks at near-zero extra cost.  The default
batch size is ``num_envs``, not 128, while ``learn_batch=128`` restores
the reference's batch scale and cuts the learner's matmul work by
n/128.  tests/test_fused_trainer.py locks the learner math against
jax.grad + optax.adam on CPU; tests/test_fused_trainer_e2e.py locks the
whole loop (actor, env, ring, gating, metrics) against an XLA reference
in interpret mode; learning-quality parity vs the XLA trainer is
validated on hardware (docs/BENCHMARKS.md).

Store-gating note: the reference drops transitions once the ego has won
(main.py:209-210); the slab layout keeps the ring dense, so gated lanes
re-store their previous round's row (a stale duplicate rather than a
skip).  Metrics reproduce agents.dqn.train_step exactly (including the
pre-step-obs win test, main.py:225).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.geometry import lon2coord
from merging_gym_tpu.ops.fused_rollout import (_env_step_math,
                                               _random_reset_vals)

OPP_L0 = "L0"
OPP_SELFPLAY = "selfplay"
OPP_FROZEN = "frozen"

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8  # torch defaults (main.py:96)

# Ring fields per round: obs 10 + next_obs 10 + action/reward/done = 23,
# padded to 24 so the dynamic row offset round*NUM_F is provably a multiple
# of 8 (Mosaic requires sublane-aligned dynamic vector loads/stores).
NUM_F = 24
ENV_ROWS = 11  # pos 2, vel 2, xy 4, winner, t, ep_reward


def _phi(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


# ---------------------------------------------------------------------------
# Learner math (pure jnp on env-last [rows, n] layout; shared by the kernel
# and the CPU parity test).  Params are transposed 6-tuples:
# (w0T [H1, IN], b0 [H1, 1], w1T [H2, H1], b1 [H2, 1], w2T [A, H2], b2 [A, 1]).
# ---------------------------------------------------------------------------

def _mm(a, b):
    """a [r, k] x b [k, n] -> [r, n]."""
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a [r, n] x b [s, n] -> [r, s] (contract the lane axis of both)."""
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a [r, s] x b [r, n] -> [s, n] (contract the leading axis of both)."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _fwd(p, x, dtype=jnp.float32):
    """Forward with activations/weight operands in ``dtype``.

    Mirrors nn.mlp.qnet_apply's mixed-precision contract exactly: matmul
    operands are cast to the compute dtype, the MXU still accumulates in
    f32 (preferred_element_type in _mm), and the f32 product is downcast
    before the bias add so inter-layer activations live in the compute
    dtype.  Q-values return in f32 (agents.dqn._qnet_fwd).  At f32 every
    cast is an identity, keeping that path byte-for-byte unchanged.
    """
    c = lambda a: a.astype(dtype)
    w0T, b0, w1T, b1, w2T, b2 = (c(a) for a in p)
    x = c(x)
    z1 = c(_mm(w0T, x)) + b0
    h1 = jnp.maximum(z1, jnp.zeros((), dtype))
    z2 = c(_mm(w1T, h1)) + b1
    h2 = jnp.maximum(z2, jnp.zeros((), dtype))
    q = (c(_mm(w2T, h2)) + b2).astype(jnp.float32)
    return z1, h1, z2, h2, q


def _argmax0(q, num_actions):
    best_q, best_a = q[0], jnp.zeros_like(q[0], jnp.int32)
    for j in range(1, num_actions):
        better = q[j] > best_q
        best_q = jnp.where(better, q[j], best_q)
        best_a = jnp.where(better, j, best_a)
    return best_a


def learn_math(p, tp, m, v, batch, t, *, gamma, lr, num_actions,
               mask_terminal=False, compute_dtype=jnp.float32):
    """One Double-DQN + Adam step; returns (new_p, new_m, new_v, loss).

    ``batch``: obs [IN, n], action i32 [n], reward [n], next_obs [IN, n],
    done bool [n].  ``t``: 1-based Adam step count (i32 scalar).
    Mirrors agents.dqn.td_loss + learn (main.py:143-157).

    ``compute_dtype``: mixed precision per the agents.dqn.compute_dtype
    contract -- forward AND backward matmul operands in this dtype with
    f32 MXU accumulation, while master params, gradient values, the
    TD-error/loss math and Adam stay f32.  bf16 doubles MXU throughput
    at production net widths (benchmarks/fused_width_dtype.py); at f32
    every cast is an identity and the math is unchanged.
    """
    dtype = jnp.dtype(compute_dtype)
    c = lambda a: a.astype(dtype)
    x, xn = batch["obs"], batch["next_obs"]
    n = x.shape[1]
    a_onehot = jnp.stack([(batch["action"] == j).astype(jnp.float32)
                          for j in range(num_actions)])          # [A, n]

    z1, h1, z2, h2, q = _fwd(p, x, dtype)
    q_sel = jnp.sum(q * a_onehot, axis=0)                        # [n]

    _, _, _, _, q_ne = _fwd(p, xn, dtype)
    _, _, _, _, q_nt = _fwd(tp, xn, dtype)
    best_a = _argmax0(q_ne, num_actions)
    star = jnp.stack([(best_a == j).astype(jnp.float32)
                      for j in range(num_actions)])
    bootstrap = jnp.sum(q_nt * star, axis=0)
    if mask_terminal:
        bootstrap = bootstrap * (1.0 - batch["done"].astype(jnp.float32))
    target = batch["reward"] + gamma * bootstrap

    diff = q_sel - target
    loss = jnp.mean(diff * diff)

    # Backward: matmul operands in the compute dtype (h1/h2 already are),
    # f32 accumulation -- so gradient VALUES are f32, like the transpose
    # of agents.dqn's bf16 forward.  At f32 the casts are identities.
    w0T, b0, w1T, b1, w2T, b2 = p
    dq = a_onehot * ((2.0 / n) * diff)                           # [A, n] f32
    # ReLU masks compare in f32: Mosaic (v5e) rejects bf16 vector cmpf
    # ("Target does not support this comparison"); the f32 upcast of a
    # bf16 value is exact, so the mask is unchanged.
    mask2 = (z2.astype(jnp.float32) > 0.0).astype(jnp.float32)
    mask1 = (z1.astype(jnp.float32) > 0.0).astype(jnp.float32)
    dw2T = _mm_nt(c(dq), h2)                                     # [A, H2]
    db2 = jnp.sum(dq, axis=1, keepdims=True)
    dz2 = _mm_tn(c(w2T), c(dq)) * mask2                          # [H2, n]
    dw1T = _mm_nt(c(dz2), h1)                                    # [H2, H1]
    db1 = jnp.sum(dz2, axis=1, keepdims=True)
    dz1 = _mm_tn(c(w1T), c(dz2)) * mask1                         # [H1, n]
    dw0T = _mm_nt(c(dz1), c(x))                                  # [H1, IN]
    db0 = jnp.sum(dz1, axis=1, keepdims=True)
    grads = (dw0T, db0, dw1T, db1, dw2T, db2)

    # Adam, bias-corrected; pow via exp/log (Mosaic has no scalar pow).
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
    return tuple(new_p), tuple(new_m), tuple(new_v), loss


def params_to_t(params):
    """nn.mlp param dict -> transposed 6-tuple (f32)."""
    out = []
    for i in range(3):
        out.append(jnp.asarray(params[f"fc{i}"]["w"], jnp.float32).T)
        out.append(jnp.asarray(params[f"fc{i}"]["b"], jnp.float32)[:, None])
    return tuple(out)


def t_to_params(pt):
    """Transposed 6-tuple -> nn.mlp param dict."""
    return {f"fc{i}": {"w": pt[2 * i].T, "b": pt[2 * i + 1][:, 0]}
            for i in range(3)}


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(cfg_ref, rewards_ref, rounds_ref, cols_ref, *refs,
            n, R, B, K, opp, p_greedy, num_actions, gamma, lr, target_sync,
            mask_terminal, greedy, random_start, ring_hbm=False,
            compute_dtype="float32"):
    # inputs: p 6, tp 6, m 6, v 6, opp 6, env 1, ring 1  (32 refs)
    # outputs: p 6, tp 6, m 6, v 6, env 1, ring 1, met 1, loss 1 (28 refs)
    # ring_hbm adds 4 scratch refs: stage, old_buf, samp_buf, sems
    ins, outs = refs[:32], refs[32:60]
    p_in, tp_in, m_in, v_in = ins[0:6], ins[6:12], ins[12:18], ins[18:24]
    opp_in, env_in, ring_in = ins[24:30], ins[30], ins[31]
    p_o, tp_o, m_o, v_o = outs[0:6], outs[6:12], outs[12:18], outs[18:24]
    env_o, ring_o, met_o, loss_o = outs[24], outs[25], outs[26], outs[27]

    i = pl.program_id(0)
    warm = cfg_ref[2]   # 1 = learning already started in a previous launch
    prior_learns = cfg_ref[3]
    base = cfg_ref[4]   # global-step ring round base (steps_so_far % R)
    W = B // K

    if ring_hbm:
        # HBM-resident ring (VERDICT r4 item 1): ring_in/ring_o are
        # ANY-space refs aliased to ONE HBM buffer (input_output_aliases
        # in _call_hbm), so there is no step-0 copy and VMEM holds only
        # double-buffered [NUM_F, ...] working sets.  Per step:
        #   wait prefetches(i) -> compute slab -> start store(i) ->
        #   learn -> wait store(i) -> start prefetches(i+1)
        # Prefetch(i+1) is issued only after store(i) completes, so a
        # sampled row always reflects every store up to step i; the one
        # store it can miss (step i+1's own, when a drawn round equals
        # that step's write round) is patched in-register from the
        # just-built merged slab -- keeping the VMEM-ring semantics
        # bit-exact (the e2e interpret lock runs both modes).
        stage, old_buf, samp_buf, sems = refs[60:64]
        r_cur = lax.rem(base + i, jnp.int32(R))
        slot = lax.rem(i, jnp.int32(2))

        def old_dma(step_slot, step_round):
            return pltpu.make_async_copy(
                ring_o.at[pl.ds(step_round * NUM_F, NUM_F), :],
                old_buf.at[step_slot], sems.at[step_slot, 0])

        def samp_dma(step_slot, k, step_round, step_col):
            return pltpu.make_async_copy(
                ring_o.at[pl.ds(step_round * NUM_F, NUM_F),
                          pl.ds(step_col * W, W)],
                samp_buf.at[step_slot, :, pl.ds(k * W, W)],
                sems.at[step_slot, 1 + k])

        def store_dma(step_slot, step_round):
            return pltpu.make_async_copy(
                stage.at[step_slot],
                ring_o.at[pl.ds(step_round * NUM_F, NUM_F), :],
                sems.at[step_slot, 1 + K])

        def issue_prefetches(step_slot, step):
            old_dma(step_slot, lax.rem(base + step, jnp.int32(R))).start()
            for k in range(K):
                samp_dma(step_slot, k, rounds_ref[step * K + k],
                         cols_ref[step * K + k]).start()

    @pl.when(i == 0)
    def _():
        for dst, src in zip(p_o + tp_o + m_o + v_o,
                            p_in + tp_in + m_in + v_in):
            dst[:] = src[:]
        env_o[:] = env_in[:]
        if not ring_hbm:
            ring_o[:] = ring_in[:]
        met_o[:] = jnp.zeros((4, n), jnp.float32)
        if ring_hbm:
            issue_prefetches(jnp.int32(0), jnp.int32(0))

    if ring_hbm:
        # Wait this step's prefetches (issued at step i-1, or just above
        # for step 0).
        old_dma(slot, r_cur).wait()
        for k in range(K):
            samp_dma(slot, k, rounds_ref[i * K + k], cols_ref[i * K + k]).wait()

    # Greedy mode (P(greedy)=1) never touches the on-chip PRNG, making the
    # kernel fully deterministic given the host-supplied rounds/cols
    # streams -- this is what lets tests/test_fused_trainer_e2e.py run the
    # WHOLE training loop in interpret mode on CPU.
    if greedy:
        bits = (None,) * 4
    else:
        pltpu.prng_seed(cfg_ref[0] + i)
        bits = pltpu.bitcast(pltpu.prng_random_bits((4, n)), jnp.uint32)

    # --- current state ------------------------------------------------------
    env = env_o[:]
    pos, vel = env[0:2], env[2:4]
    x1, y1, x2, y2 = env[4], env[5], env[6], env[7]
    winner = env[8].astype(jnp.int32)
    tcnt = env[9].astype(jnp.int32)
    ep_rew = env[10]

    obs = jnp.stack([
        x2 - x1, y2 - y1, vel[1] - vel[0], C.END_POINT - pos[0], vel[0],
        x1 - x2, y1 - y2, vel[0] - vel[1], C.END_POINT - pos[1], vel[1],
    ])

    # --- actor (Phi(eps)-greedy, main.py:105) -------------------------------
    cdt = jnp.dtype(compute_dtype)
    p_now = tuple(r[:] for r in p_o)
    threshold = jnp.uint32(min(int(p_greedy * 4294967296.0), 4294967295))

    def eps_greedy(params6, x, mask_b, rand_b):
        _, _, _, _, q = _fwd(params6, x, cdt)
        best_a = _argmax0(q, num_actions)
        if greedy:
            return best_a
        rand = (rand_b % jnp.uint32(num_actions)).astype(jnp.int32)
        return jnp.where(mask_b < threshold, best_a, rand)

    a1 = eps_greedy(p_now, obs, bits[0], bits[1])
    if opp == OPP_L0:
        a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
    else:
        obs2 = jnp.concatenate([obs[5:], obs[:5]])
        opp_p = p_now if opp == OPP_SELFPLAY else tuple(r[:] for r in opp_in)
        a2 = eps_greedy(opp_p, obs2, bits[2], bits[3])
    actions = jnp.stack([a1, a2])

    # --- env step ------------------------------------------------------------
    rcfg = tuple(rewards_ref[k] for k in range(5))
    npos, nvel, nwin, ntcnt, done, col, rewards, next_obs, coords = \
        _env_step_math(pos, vel, winner, tcnt, jnp.zeros((n,), bool),
                       actions, rcfg, cfg_ref[1])

    # --- replay write (round = step % R; store-gated lanes keep their old
    # row -- see module docstring) -------------------------------------------
    # jnp.int32 wrap: under interpret mode with x64, bare Python ints
    # would promote the rem to i64.  ``base`` carries the global-step
    # ring round base so chunked launches keep overwriting the ring where
    # the previous launch left off instead of rewinding to round 0.
    if not ring_hbm:
        r_cur = lax.rem(base + i, jnp.int32(R))
    store = (nwin != 1)[None, :].astype(jnp.float32)              # [1, n]
    slab = jnp.concatenate([
        obs, next_obs,
        jnp.stack([a1.astype(jnp.float32), rewards[0],
                   done.astype(jnp.float32),
                   jnp.zeros((n,), jnp.float32)]),  # alignment pad row
    ])                                                             # [NUM_F, n]
    if ring_hbm:
        merged = store * slab + (1.0 - store) * old_buf[slot]
        stage[slot] = merged
        store_dma(slot, r_cur).start()
    else:
        old = ring_o[pl.ds(r_cur * NUM_F, NUM_F), :]
        ring_o[pl.ds(r_cur * NUM_F, NUM_F), :] = (store * slab
                                                  + (1.0 - store) * old)

    # --- learner (gated on ring full, main.py:213-214) ------------------------
    # Learning starts once R-1 GLOBAL steps have filled the ring: when
    # warm == 0 the prior launches stored fewer than R-1 rounds, so the
    # prior step count IS ``base`` and the gate is base + i >= R-1 (a
    # first chunk shorter than R-1 steps must not open the gate early --
    # rounds beyond it would be all-zero garbage transitions).
    can_learn = (warm == 1) | (base + i >= R - 1)
    lc = prior_learns + jnp.where(warm == 1, i, i - (jnp.int32(R - 1) - base))

    @pl.when(can_learn)
    def _():
        if ring_hbm:
            # Prefetched windows, with the one store they can miss (this
            # step's own, when the drawn round == this step's write
            # round) patched in from the in-register merged slab.
            parts = []
            for k in range(K):
                win = samp_buf[slot, :, pl.ds(k * W, W)]
                # stage[slot] holds the merged slab (a ref read supports
                # the dynamic lane window; Mosaic cannot dynamic-slice a
                # value).  The in-flight store DMA also reads it -- both
                # are reads, no hazard.
                mine = stage[slot, :, pl.ds(cols_ref[i * K + k] * W, W)]
                hit = rounds_ref[i * K + k] == r_cur
                parts.append(jnp.where(hit, mine, win))
            sampled = parts[0] if K == 1 else jnp.concatenate(parts, axis=1)
        elif K == 1 and B == n:
            sampled = ring_o[pl.ds(rounds_ref[i] * NUM_F, NUM_F), :]
        else:
            # K independent (round, lane-window) draws of B/K lanes each,
            # concatenated along lanes: K > 1 breaks the common-age /
            # common-lane-neighbourhood correlation of a single-slab
            # batch (every window width is a static multiple of 128, so
            # the dynamic lane offsets stay Mosaic-aligned).
            parts = [
                ring_o[pl.ds(rounds_ref[i * K + k] * NUM_F, NUM_F),
                       pl.ds(cols_ref[i * K + k] * W, W)]
                for k in range(K)
            ]
            sampled = parts[0] if K == 1 else jnp.concatenate(parts, axis=1)
        batch = {
            "obs": sampled[0:10],
            "next_obs": sampled[10:20],
            "action": sampled[20].astype(jnp.int32),
            "reward": sampled[21],
            "done": sampled[22] > 0.5,
        }
        sync = lax.rem(lc, jnp.int32(target_sync)) == 0
        p6 = tuple(r[:] for r in p_o)
        tp6 = tuple(jnp.where(sync, pv, r[:]) for pv, r in zip(p6, tp_o))
        new_p, new_m, new_v, loss = learn_math(
            p6, tp6, tuple(r[:] for r in m_o), tuple(r[:] for r in v_o),
            batch, lc + 1, gamma=gamma, lr=lr, num_actions=num_actions,
            mask_terminal=mask_terminal, compute_dtype=cdt)
        for dst, val in zip(p_o + tp_o + m_o + v_o,
                            new_p + tp6 + new_m + new_v):
            dst[:] = val
        loss_o[:] = jnp.full((8, 128), loss, jnp.float32)

    @pl.when(jnp.logical_not(can_learn))
    def _():
        loss_o[:] = jnp.zeros((8, 128), jnp.float32)

    # --- metrics (lane-wise accumulators; host reduces) -----------------------
    ep_rew = ep_rew + jnp.where(store[0] > 0.5, rewards[0], 0.0)
    won = done & (obs[8] > obs[3])                                 # main.py:225
    met_o[:] = met_o[:] + jnp.stack([
        done.astype(jnp.float32),                                  # episodes
        col.astype(jnp.float32),                                   # collisions
        won.astype(jnp.float32),                                   # wins
        jnp.where(done, ep_rew, 0.0),                              # ep returns
    ])
    ep_rew = jnp.where(done, 0.0, ep_rew)

    # --- auto-reset + state writeback -----------------------------------------
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

    if ring_hbm:
        # Store must land before the NEXT step's prefetches are issued
        # (a drawn round may equal the row just written); by now the
        # learner matmuls have long overlapped the [NUM_F, n] copy.
        store_dma(slot, r_cur).wait()

        @pl.when(i < pl.num_programs(0) - 1)
        def _():
            issue_prefetches(lax.rem(i + jnp.int32(1), jnp.int32(2)),
                             i + jnp.int32(1))


# ---------------------------------------------------------------------------
# Host API
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R", "B", "K", "opp",
                              "p_greedy", "num_actions", "gamma", "lr",
                              "target_sync", "mask_terminal", "greedy",
                              "random_start", "interpret", "compute_dtype"))
def _call(cfg, rewards_vec, rounds, cols, arrays, num_steps, n, R, B, K, opp,
          p_greedy, num_actions, gamma, lr, target_sync, mask_terminal,
          greedy, random_start=False, interpret=False,
          compute_dtype="float32"):
    kernel = functools.partial(
        _kernel, n=n, R=R, B=B, K=K, opp=opp, p_greedy=p_greedy,
        num_actions=num_actions, gamma=gamma, lr=lr,
        target_sync=target_sync, mask_terminal=mask_terminal, greedy=greedy,
        random_start=random_start, compute_dtype=compute_dtype)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                + [whole(a.shape) for a in arrays])
    state_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in arrays[:24]]          # p, tp, m, v
    out_shape = tuple(
        state_shapes
        + [jax.ShapeDtypeStruct((ENV_ROWS, n), jnp.float32),
           jax.ShapeDtypeStruct((R * NUM_F, n), jnp.float32),
           jax.ShapeDtypeStruct((4, n), jnp.float32),
           # final-step loss, broadcast over one tile (Mosaic needs
           # (8,128)-aligned or whole blocks; a (1,1) per-step block is
           # rejected) -- host reads [0, 0].
           jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = tuple(
        [whole(s.shape) for s in state_shapes]
        + [whole((ENV_ROWS, n)), whole((R * NUM_F, n)), whole((4, n)),
           whole((8, 128))])
    # ``interpret`` is an explicit STATIC argument (part of the jit cache
    # key); passed only when set so test fixtures can still inject
    # interpret=True through a pallas_call monkeypatch.
    extra = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        kernel, grid=(num_steps,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        # Ring + env state + learner temporaries all live in VMEM; the
        # default 16MB scoped limit caps num_envs at ~8K.  v5e has 128MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, rounds, cols, *arrays)


@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R", "B", "K", "opp",
                              "p_greedy", "num_actions", "gamma", "lr",
                              "target_sync", "mask_terminal", "greedy",
                              "random_start", "interpret", "compute_dtype"),
    donate_argnames=("ring",))
def _call_hbm(cfg, rewards_vec, rounds, cols, arrays, ring, num_steps, n, R,
              B, K, opp, p_greedy, num_actions, gamma, lr, target_sync,
              mask_terminal, greedy, random_start=False, interpret=False,
              compute_dtype="float32"):
    """HBM-ring launch: like ``_call`` but the ring is an ANY-space
    operand aliased in/out to one (donated) HBM buffer, never copied
    through VMEM; the kernel DMAs [NUM_F, ...] rows in and out with
    double-buffered scratch (see the ring_hbm block in ``_kernel``).
    Ring capacity is then bounded by HBM, not the 110MB VMEM budget:
    R = 2000 rounds at 32K envs is a 6.3 GB ring (reference DQN replay
    depth, main.py:17, at 32K parallel envs)."""
    kernel = functools.partial(
        _kernel, n=n, R=R, B=B, K=K, opp=opp, p_greedy=p_greedy,
        num_actions=num_actions, gamma=gamma, lr=lr,
        target_sync=target_sync, mask_terminal=mask_terminal, greedy=greedy,
        random_start=random_start, ring_hbm=True, compute_dtype=compute_dtype)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                + [whole(a.shape) for a in arrays]
                + [pl.BlockSpec(memory_space=pl.ANY)])
    state_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in arrays[:24]]          # p, tp, m, v
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
        # ring operand = input index 4 (cfg, rewards, rounds, cols) + 31
        input_output_aliases={4 + len(arrays): 25},
        scratch_shapes=[
            pltpu.VMEM((2, NUM_F, n), jnp.float32),      # store stage
            pltpu.VMEM((2, NUM_F, n), jnp.float32),      # old-row buf
            pltpu.VMEM((2, NUM_F, B), jnp.float32),      # sample windows
            pltpu.SemaphoreType.DMA((2, K + 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, rounds, cols, *arrays, ring)


def fused_dqn_init(key, cfg, env_params, num_envs, opp_params=None,
                   learn_batch=None, learn_rounds=1, ring_hbm=None):
    """Fresh training state for the single-kernel trainer.

    ``cfg``: agents.dqn.DQNConfig.  ``cfg.batch_size`` is ignored: the
    learner batch is ``num_envs`` unless ``learn_batch`` is given.
    ``cfg.memory_capacity`` must be a multiple of num_envs, giving
    R = capacity // num_envs ring rounds.  Returns a plain dict carry.

    ``learn_batch`` (default None = ``num_envs``): lanes consumed per
    learn.  When smaller, each learn samples a uniformly chosen DISJOINT
    lane window of that width from a uniformly chosen past round (the
    uniform marginal over stored transitions is kept; the batch still
    shares a common age, and additionally a common lane neighbourhood).
    Must be a multiple of 128 dividing ``num_envs``.  Cuts the learner's
    per-step matmul work by num_envs/learn_batch and restores a
    reference-scale batch (main.py:130 uses 128).

    ``ring_hbm`` (default None = auto): keep the replay ring in HBM and
    DMA rows through double-buffered VMEM scratch instead of holding the
    whole ring in VMEM.  Auto turns it on when the VMEM ring would
    exceed 24 MB.  Ring capacity then scales to HBM: R = 2000 rounds
    (the reference's full 2000-transition replay depth in time steps,
    main.py:17) at 32K envs is a 6.3 GB ring.  Semantics are bit-exact
    vs the VMEM ring (tests/test_fused_trainer_e2e.py runs both modes);
    the ring buffer in the carry is DONATED each chunk, so a pre-chunk
    carry must not be reused after the call.

    ``learn_rounds`` (K, default 1): number of independent
    (round, lane-window) draws composing each learn batch.  K > 1 breaks
    the single-slab batch's common-age (and common-lane-neighbourhood)
    correlation -- each learn concatenates K windows of
    ``learn_batch // K`` lanes, every one an independent uniform draw
    over the ring, at near-zero extra cost (K dynamic slices instead of
    one).  Requires ``learn_batch % (128 * K) == 0`` so every window
    stays lane-aligned for Mosaic.  docs/BENCHMARKS.md quantifies the
    learning-quality effect.
    """
    from merging_gym_tpu.nn.mlp import qnet_init

    if num_envs % 128 != 0:
        raise ValueError(f"num_envs must be a multiple of 128, got {num_envs}")
    B = num_envs if learn_batch is None else int(learn_batch)
    if B % 128 != 0 or num_envs % B != 0:
        raise ValueError("learn_batch must be a multiple of 128 dividing "
                         f"num_envs, got learn_batch={B} num_envs={num_envs}")
    K = int(learn_rounds)
    if K < 1 or B % (128 * K) != 0:
        raise ValueError("learn_rounds must be >= 1 with learn_batch a "
                         f"multiple of 128*learn_rounds, got learn_rounds={K} "
                         f"learn_batch={B}")
    R = cfg.memory_capacity // num_envs
    if R < 2 or cfg.memory_capacity != R * num_envs:
        raise ValueError("memory_capacity must be k*num_envs with k>=2, got "
                         f"capacity={cfg.memory_capacity} num_envs={num_envs}")
    k_eval, k_target = jax.random.split(jax.random.fold_in(key, 0))
    p = params_to_t(qnet_init(k_eval, cfg.obs_dim, cfg.num_actions, cfg.hidden))
    tp = params_to_t(qnet_init(k_target, cfg.obs_dim, cfg.num_actions, cfg.hidden))
    zeros6 = tuple(jnp.zeros_like(a) for a in p)
    opp = params_to_t(opp_params) if opp_params is not None else p

    n = num_envs
    if ring_hbm is None:
        ring_hbm = R * NUM_F * n * 4 > 24 * 1024 * 1024
    env = np.zeros((ENV_ROWS, n), np.float32)
    env[0:8] = _init_env_rows(env_params, jax.random.fold_in(key, 7), n)
    return {
        "p": p, "tp": tp, "m": zeros6, "v": zeros6, "opp": opp,
        "env": jnp.asarray(env), "ring": jnp.zeros((R * NUM_F, n), jnp.float32),
        "R": R, "n": n, "B": B, "K": K, "ring_hbm": int(bool(ring_hbm)),
        "warm": 0, "learns": 0, "steps": 0,
        "env_steps": 0,
        "episodes": 0.0, "collisions": 0.0, "wins": 0.0, "sum_ep_reward": 0.0,
        "last_loss": 0.0,
    }


def _init_env_rows(env_params, key, n):
    """Initial pos/vel/xy rows [8, n]: the deterministic start, or a
    core.env.reset draw when ``env_params.random_start`` (the in-kernel
    auto-reset then continues with _random_reset_vals draws)."""
    if env_params.random_start:
        from merging_gym_tpu.core.vector import reset_batch
        st = reset_batch(env_params, key, n, jnp.float32)
        pos = np.asarray(st.pos).T.astype(np.float32)
        vel = np.asarray(st.vel).T.astype(np.float32)
    else:
        pos = np.full((2, n), C.START_POINT, np.float32)
        vel = np.full((2, n), C.START_VEL, np.float32)
    x1, y1 = lon2coord(jnp.asarray(pos[0]), +1.0)
    x2, y2 = lon2coord(jnp.asarray(pos[1]), -1.0)
    return np.concatenate([pos, vel,
                           np.stack([np.asarray(x1), np.asarray(y1),
                                     np.asarray(x2), np.asarray(y2)])])


def coerce_carry(carry):
    """Fix types after an orbax StandardRestore roundtrip.

    The carry is a plain dict whose leaves orbax restores as numpy
    scalars/arrays and whose param 6-tuples come back as lists; the
    kernel launch path needs Python ints for the static sizes and
    counters.  Everything the kernel streams through HBM (params,
    target, Adam moments, opponent, env rows, ring) round-trips
    exactly, so a resumed run continues bit-for-bit -- locked by
    tests/test_fused_trainer_recovery.py.
    """
    out = dict(carry)
    for k in ("R", "n", "B", "warm", "learns", "steps", "env_steps"):
        out[k] = int(out.get(k, 0))
    out["K"] = int(out.get("K", 1))
    out["ring_hbm"] = int(out.get("ring_hbm", 0))
    for k in ("episodes", "collisions", "wins", "sum_ep_reward", "last_loss"):
        out[k] = float(out[k])
    for k in ("p", "tp", "m", "v", "opp"):
        out[k] = tuple(jnp.asarray(a, jnp.float32) for a in out[k])
    out["env"] = jnp.asarray(out["env"], jnp.float32)
    out["ring"] = jnp.asarray(out["ring"], jnp.float32)
    return out


def launch_cfg(carry, env_params, seed):
    """The kernel's SMEM cfg vector [seed, max_steps, warm, learns, base].

    ``seed`` may be a traced value (the SPMD wrapper folds in the device
    index).  Shared by the single-chip and distributed launch paths so
    the cfg_ref layout has exactly one definition.
    """
    return jnp.stack([
        jnp.asarray(seed, jnp.int32),
        jnp.int32(env_params.max_steps),
        jnp.int32(carry["warm"]),
        jnp.int32(carry["learns"]),
        jnp.int32(carry.get("steps", 0) % carry["R"]),
    ])


def rewards_cfg(env_params):
    return jnp.asarray([
        env_params.r_first, env_params.r_second, env_params.r_collision,
        env_params.vel_penalty, env_params.time_penalty], jnp.float32)


def chunk_learns(carry, num_steps):
    """Learn count added by a ``num_steps`` launch (global-step gated)."""
    R = carry["R"]
    prior = carry.get("steps", 0)
    warmup_left = 0 if carry["warm"] else max(R - 1 - prior, 0)
    return max(num_steps - warmup_left, 0)


def apply_chunk(carry, out, num_steps, met_sum, loss):
    """Fold a launch's outputs back into the host-side carry dict.

    Shared by fused_dqn_chunk and parallel.spmd.spmd_fused_dqn_chunk so
    the counter semantics (warm gate, learns, ring base, metrics) have
    one definition.
    """
    p, tp, m, v = out[0:6], out[6:12], out[12:18], out[18:24]
    env, ring = out[24], out[25]
    steps = carry.get("steps", 0) + num_steps
    return {
        **carry,
        "p": tuple(p), "tp": tuple(tp), "m": tuple(m), "v": tuple(v),
        "env": env, "ring": ring,
        "warm": 1 if steps >= carry["R"] - 1 else 0,
        "steps": steps,
        "learns": carry["learns"] + chunk_learns(carry, num_steps),
        "env_steps": carry["env_steps"] + num_steps * carry["n"],
        "episodes": carry["episodes"] + float(met_sum[0]),
        "collisions": carry["collisions"] + float(met_sum[1]),
        "wins": carry["wins"] + float(met_sum[2]),
        "sum_ep_reward": carry["sum_ep_reward"] + float(met_sum[3]),
        "last_loss": float(loss),
    }


def _interpret_flag():
    """CPU-testing escape hatch (read per call; static jit arg of _call)."""
    return os.environ.get("MGT_FUSED_INTERPRET", "") == "1"


def fused_dqn_chunk(cfg, env_params, carry, num_steps, seed, *,
                    greedy=False, rounds=None, cols=None):
    """Run ``num_steps`` training steps in ONE kernel launch.

    ``greedy=True`` makes the actor pure-argmax (P(greedy)=1) and skips
    the on-chip PRNG entirely; combined with explicit ``rounds``/``cols``
    sample streams (both i32 [num_steps]; default: drawn host-side from
    ``seed``) the whole kernel is deterministic and interpret-testable on
    CPU -- tests/test_fused_trainer_e2e.py locks it step-for-step against
    an XLA trainer built from the independently verified components.
    """
    R, n = carry["R"], carry["n"]
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps} (a "
                         "zero-iteration grid would skip the state copy "
                         "and return uninitialized outputs)")
    B = carry.get("B", n)
    K = carry.get("K", 1)
    W = B // K
    k_r, k_c = jax.random.split(jax.random.key(seed ^ 0x5EED))
    if rounds is None:
        rounds = jax.random.randint(k_r, (num_steps * K,), 0, R, jnp.int32)
    if cols is None:
        cols = jax.random.randint(k_c, (num_steps * K,), 0, n // W, jnp.int32)
    rounds = jnp.asarray(rounds, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    if rounds.shape != (num_steps * K,) or cols.shape != (num_steps * K,):
        raise ValueError("rounds/cols must be i32 [num_steps * learn_rounds]")
    rnp, cnp = np.asarray(rounds), np.asarray(cols)
    if rnp.min() < 0 or rnp.max() >= R or cnp.min() < 0 or cnp.max() >= n // W:
        raise ValueError(f"rounds must lie in [0, {R}) and cols in "
                         f"[0, {n // W}) (out-of-range values clamp to the "
                         "ring edge and silently train on the wrong slab)")
    if env_params.random_start and greedy:
        raise ValueError("random starts need the on-chip PRNG, which "
                         "greedy mode skips (greedy is the deterministic "
                         "e2e mode); drop one of the two")
    common = (num_steps, n, R, B, K, cfg.opponent, _phi(cfg.epsilon),
              cfg.num_actions, float(cfg.gamma), float(cfg.lr),
              int(cfg.target_sync), bool(cfg.mask_terminal), bool(greedy))
    kw = dict(random_start=bool(env_params.random_start),
              interpret=_interpret_flag(),
              compute_dtype=str(getattr(cfg, "compute_dtype", "float32")))
    if carry.get("ring_hbm"):
        arrays = (list(carry["p"]) + list(carry["tp"]) + list(carry["m"])
                  + list(carry["v"]) + list(carry["opp"]) + [carry["env"]])
        out = _call_hbm(launch_cfg(carry, env_params, seed),
                        rewards_cfg(env_params), rounds, cols, tuple(arrays),
                        carry["ring"], *common, **kw)
    else:
        arrays = (list(carry["p"]) + list(carry["tp"]) + list(carry["m"])
                  + list(carry["v"]) + list(carry["opp"])
                  + [carry["env"], carry["ring"]])
        out = _call(launch_cfg(carry, env_params, seed),
                    rewards_cfg(env_params), rounds, cols, tuple(arrays),
                    *common, **kw)
    met = np.asarray(out[26]).sum(axis=1)
    return apply_chunk(carry, out, num_steps, met,
                       float(np.asarray(out[27])[0, 0]))
