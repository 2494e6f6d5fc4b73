"""Pallas TPU kernel: the ENTIRE recurrent-DQN (DRQN) trainer as one kernel.

Fourth member of the fused-trainer family (ops.fused_trainer,
ops.fused_hdqn, ops.fused_rainbow): the XLA DRQN trainer
(agents.drqn.drqn_train_chunk) pays the per-scan-iteration dispatch
floor on every env step and its learner -- a 33-matmul truncated-BPTT
unroll over a 23K-param LSTM net -- is pure dispatch overhead at that
scale (406K env-steps/s at 256 envs, docs/BENCHMARKS.md).  This kernel
keeps every component on-chip across T grid steps:

  * recurrent actor: fc1-fc2-LSTM-fc3-fc4 forward (nn.lstm.drqn_step's
    math in env-last layout) with per-env hidden state for BOTH seats
    resident in the env-state rows, zeroed on episode reset; the
    reference Phi(0.7)-greedy rule (main.py:105) with on-chip PRNG;
  * env: dynamics, winner state machine, collision, auto-reset
    (ops.fused_rollout._env_step_math, locked to core.env.step);
  * sequence replay: each env accumulates a non-overlapping seq_len-step
    window (obs window seq_len+1, agents.drqn.drqn_train_step) in a
    VMEM-resident slot buffer; windows flush synchronously every
    seq_len steps into an R-round ring of whole window slabs;
  * learner: hand-derived truncated BPTT through the full
    (seq_len+1)-step unroll -- zero start state, per-timestep
    Double-DQN targets, burn-in + first-done masks (the exact
    agents.drqn.drqn_loss), backprop through the LSTM recurrence -- and
    a full Adam update, with params, target params and both moments
    resident on-chip.  Target sync every ``target_sync`` learns applied
    before the update, like the flat trainer.

The reference's DRQN is broken dead code (main.py:49-74: undefined
``Flatten``, never instantiated); agents.drqn is the working
resurrection this kernel accelerates, so the semantic authority chain
is drqn_learn_math == jax.grad(agents.drqn.drqn_loss) + optax.adam
(tests/test_fused_drqn.py) and the whole loop == an XLA reference built
from independently verified components in interpret mode
(tests/test_fused_drqn_e2e.py).

Sampling semantics -- the documented deviation, same as the flat fused
trainer: agents.drqn samples ``batch_size`` windows uniformly with
replacement from its ring; Pallas has no vectorized gather, so each
learn consumes one uniformly chosen (round, lane-window) pair -- B
whole windows that share a common flush age (host-side streams through
SMEM).  Learning is gated on the ring being full (R*seq_len global
steps), where agents.drqn gates on ``cursor >= batch_size``; with the
default R=4 rings this opens the gate a few flushes later.

Window slot layout: 16 f32 rows per timestep slot s in 0..seq_len --
rows [0:10) obs_s, row 10 action_{s-1}, 11 reward_{s-1}, 12 done_{s-1}
(slot 0 carries only the window's first obs), rows 13:16 pad -- so the
per-step dynamic store offset (slot+1)*16 and the per-flush ring offset
round*WF are multiples of 8 (Mosaic sublane alignment), exactly the
NUM_F=24 trick of ops.fused_trainer.
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
from merging_gym_tpu.ops.fused_trainer import (ADAM_B1, ADAM_B2, ADAM_EPS,
                                               OPP_FROZEN, OPP_L0,
                                               OPP_SELFPLAY, _argmax0, _mm,
                                               _mm_nt, _mm_tn, _phi,
                                               rewards_cfg)

HID = 16          # nn.lstm.LSTM_HIDDEN (main.py:52-53)
H1 = 200          # fc1 width (main.py:60-61)
SLOT = 16         # f32 rows per window timestep slot (see module docstring)
ENV_ROWS = 11 + 4 * HID  # pos 2, vel 2, xy 4, winner, t, ep_reward, h/c x2 seats


# ---------------------------------------------------------------------------
# Param layout: transposed 12-tuple, env-last [rows, lanes] math (cf.
# fused_trainer.params_to_t).  Order:
#   (w1T [200,10], b1 [200,1], w2T [16,200], b2 [16,1],
#    wihT [64,16], bih [64,1], whhT [64,16], bhh [64,1],
#    w3T [16,16], b3 [16,1], w4T [A,16], b4 [A,1])
# Gate rows of wihT/whhT follow torch order i, f, g, o
# (nn.lstm.lstm_cell_apply).
# ---------------------------------------------------------------------------

def drqn_params_to_t(params):
    """nn.lstm.drqn_init param dict -> transposed 12-tuple (f32)."""
    out = []
    for name in ("fc1", "fc2"):
        out.append(jnp.asarray(params[name]["w"], jnp.float32).T)
        out.append(jnp.asarray(params[name]["b"], jnp.float32)[:, None])
    lstm = params["lstm"]
    out.append(jnp.asarray(lstm["w_ih"], jnp.float32).T)
    out.append(jnp.asarray(lstm["b_ih"], jnp.float32)[:, None])
    out.append(jnp.asarray(lstm["w_hh"], jnp.float32).T)
    out.append(jnp.asarray(lstm["b_hh"], jnp.float32)[:, None])
    for name in ("fc3", "fc4"):
        out.append(jnp.asarray(params[name]["w"], jnp.float32).T)
        out.append(jnp.asarray(params[name]["b"], jnp.float32)[:, None])
    return tuple(out)


def t_to_drqn_params(pt):
    """Transposed 12-tuple -> nn.lstm param dict."""
    return {
        "fc1": {"w": pt[0].T, "b": pt[1][:, 0]},
        "fc2": {"w": pt[2].T, "b": pt[3][:, 0]},
        "lstm": {"w_ih": pt[4].T, "b_ih": pt[5][:, 0],
                 "w_hh": pt[6].T, "b_hh": pt[7][:, 0]},
        "fc3": {"w": pt[8].T, "b": pt[9][:, 0]},
        "fc4": {"w": pt[10].T, "b": pt[11][:, 0]},
    }


def _cell_fwd(p, x, h, c):
    """One recurrent step in env-last layout; mirrors nn.lstm.drqn_step.

    x [IN, B], h/c [HID, B] -> (cache tuple, q [A, B], h_new, c_new).
    """
    w1T, b1, w2T, b2, wihT, bih, whhT, bhh, w3T, b3, w4T, b4 = p
    z1 = _mm(w1T, x) + b1
    h1 = jnp.maximum(z1, 0.0)
    x2 = _mm(w2T, h1) + b2                      # no ReLU (main.py:62-64)
    g = _mm(wihT, x2) + bih + _mm(whhT, h) + bhh
    gi = jax.nn.sigmoid(g[0:HID])
    gf = jax.nn.sigmoid(g[HID:2 * HID])
    gg = jnp.tanh(g[2 * HID:3 * HID])
    go = jax.nn.sigmoid(g[3 * HID:4 * HID])
    c_new = gf * c + gi * gg
    tc = jnp.tanh(c_new)
    h_new = go * tc
    z3 = _mm(w3T, h_new) + b3
    h3 = jnp.maximum(z3, 0.0)
    q = _mm(w4T, h3) + b4
    cache = (x, z1, x2, gi, gf, gg, go, c, tc, h, h_new, z3, h3)
    return cache, q, h_new, c_new


def _gates_tail(g, c):
    """LSTM elementwise tail shared by the paired forward: gate block
    [4H, n] + previous cell -> (h_new, c_new)."""
    gi = jax.nn.sigmoid(g[0:HID])
    gf = jax.nn.sigmoid(g[HID:2 * HID])
    gg = jnp.tanh(g[2 * HID:3 * HID])
    go = jax.nn.sigmoid(g[3 * HID:4 * HID])
    c_new = gf * c + gi * gg
    return go * jnp.tanh(c_new), c_new


def _cell_fwd_pair(p, po, x1, x2, h1, c1, h2, c2):
    """Both seats' recurrent actor forwards (different param sets) as ONE
    block-diagonal dependent chain: 5 matmul issues instead of 2x5.

    Zero blocks contribute exact f32 zeros, so each seat's q/h/c is
    bit-identical to its own _cell_fwd; used for the frozen-opponent
    path (the selfplay path lane-concats instead -- same weights).
    """
    xb = jnp.concatenate([x1, x2], axis=0)
    z1 = (_mm(_blockdiag(p[0], po[0]), xb)
          + jnp.concatenate([p[1], po[1]], 0))
    h1b = jnp.maximum(z1, 0.0)
    x2b = (_mm(_blockdiag(p[2], po[2]), h1b)
           + jnp.concatenate([p[3], po[3]], 0))
    hcat = jnp.concatenate([h1, h2], axis=0)
    g = (_mm(_blockdiag(p[4], po[4]), x2b)
         + jnp.concatenate([p[5], po[5]], 0)
         + _mm(_blockdiag(p[6], po[6]), hcat)
         + jnp.concatenate([p[7], po[7]], 0))           # [8H, n]
    h1n, c1n = _gates_tail(g[0:4 * HID], c1)
    h2n, c2n = _gates_tail(g[4 * HID:], c2)
    z3 = (_mm(_blockdiag(p[8], po[8]), jnp.concatenate([h1n, h2n], 0))
          + jnp.concatenate([p[9], po[9]], 0))
    h3 = jnp.maximum(z3, 0.0)
    qb = (_mm(_blockdiag(p[10], po[10]), h3)
          + jnp.concatenate([p[11], po[11]], 0))
    na = p[10].shape[0]
    return qb[0:na], h1n, c1n, qb[na:], h2n, c2n


def _blockdiag(a, b):
    """[[a, 0], [0, b]] -- zero blocks contribute exact f32 zeros to any
    contraction, so a block-diagonal matmul is bit-identical to the two
    separate matmuls while issuing as ONE MXU op (the latency lever --
    see drqn_learn_math's docstring)."""
    za = jnp.zeros((a.shape[0], b.shape[1]), jnp.float32)
    zb = jnp.zeros((b.shape[0], a.shape[1]), jnp.float32)
    return jnp.concatenate([jnp.concatenate([a, za], axis=1),
                            jnp.concatenate([zb, b], axis=1)], axis=0)


def drqn_learn_math(p, tp, m, v, batch, t, *, gamma, lr, num_actions,
                    seq_len, burn_in):
    """One BPTT Double-DQN + Adam step; returns (new_p, new_m, new_v, loss).

    ``batch``: obs [L+1][IN, B] (list of per-timestep slices), action
    i32 [L, B], reward [L, B], done f32-in-{0,1} [L, B].  ``t``: 1-based
    Adam step count (i32 scalar).  The loss and its gradient are exactly
    agents.drqn.drqn_loss (zero start state, per-timestep Double-DQN
    with done-masked bootstrap, burn-in + first-done masks, mean over
    valid positions) -- locked against jax.grad + optax.adam by
    tests/test_fused_drqn.py.  Pure jnp on env-last [rows, lanes]
    layout; shared by the kernel and the CPU parity test.

    Latency structure (the roofline's finding, docs/BENCHMARKS.md):
    everything that does not depend on the recurrent state is batched
    over timesteps as single [rows, (L+1)*B] matmuls -- fc1/fc2, the
    input-side gate contribution wihT@x2, the fc3/fc4 heads, and all
    param-gradient contractions -- AND the eval and target nets (two
    independent recurrences over the same obs) are fused into
    block-diagonal issues, so the only SEQUENTIAL matmuls are the L+1
    fused forward ``[[whh,0],[0,t_whh]] @ [h; h_t]`` and L backward
    ``whhT^T @ da`` issues (33 for L=16, down from 50 when the target
    recurrence ran as its own chain and ~200 in the naive
    per-timestep form).  Zero blocks contribute exact f32 zeros, so
    every fused issue is bit-identical to its separate form.
    """
    L = seq_len
    w1T, b1, w2T, b2, wihT, bih, whhT, bhh, w3T, b3, w4T, b4 = p
    (tw1T, tb1, tw2T, tb2, twihT, tbih, twhhT, tbhh,
     tw3T, tb3, tw4T, tb4) = tp
    B = batch["action"].shape[1]
    LB = L * B
    R1, R2 = w1T.shape[0], w2T.shape[0]                 # fc1/fc2 widths

    # ---- batched input-side forward over all L+1 timesteps: eval and
    # target nets ride one block-diagonal issue per layer ------------------
    X = jnp.concatenate(batch["obs"], axis=1)           # [IN, (L+1)B]
    Xb = jnp.concatenate([X, X], axis=0)                # [2*IN, (L+1)B]
    Z1b = _mm(_blockdiag(w1T, tw1T), Xb) + jnp.concatenate([b1, tb1], 0)
    H1b = jnp.maximum(Z1b, 0.0)
    X2b = (_mm(_blockdiag(w2T, tw2T), H1b)
           + jnp.concatenate([b2, tb2], 0))             # no ReLU (fc2)
    Ginb = (_mm(_blockdiag(wihT, twihT), X2b)
            + jnp.concatenate([bih, tbih], 0))          # [8H, (L+1)B]
    Z1, H1, X2 = Z1b[0:R1], H1b[0:R1], X2b[0:R2]        # eval rows (backward)

    # ---- sequential recurrence (the only t-dependence); both nets in one
    # [8H, 2H] x [2H, B] issue per timestep --------------------------------
    Wb = _blockdiag(whhT, twhhT)
    bhhb = jnp.concatenate([bhh, tbhh], axis=0)
    hb = jnp.zeros((2 * HID, B), jnp.float32)
    c = jnp.zeros((HID, B), jnp.float32)
    ct = jnp.zeros((HID, B), jnp.float32)
    h_news, th_news, cells = [], [], []
    for tt in range(L + 1):
        gb = Ginb[:, tt * B:(tt + 1) * B] + _mm(Wb, hb) + bhhb
        gi = jax.nn.sigmoid(gb[0:HID])
        gf = jax.nn.sigmoid(gb[HID:2 * HID])
        gg = jnp.tanh(gb[2 * HID:3 * HID])
        go = jax.nn.sigmoid(gb[3 * HID:4 * HID])
        c_new = gf * c + gi * gg
        tc = jnp.tanh(c_new)
        h_new = go * tc
        cells.append((gi, gf, gg, go, c, tc))
        h_news.append(h_new)
        c = c_new
        tgi = jax.nn.sigmoid(gb[4 * HID:5 * HID])
        tgf = jax.nn.sigmoid(gb[5 * HID:6 * HID])
        tgg = jnp.tanh(gb[6 * HID:7 * HID])
        tgo = jax.nn.sigmoid(gb[7 * HID:8 * HID])
        ct = tgf * ct + tgi * tgg
        th = tgo * jnp.tanh(ct)
        th_news.append(th)
        hb = jnp.concatenate([h_new, th], axis=0)

    # ---- batched heads over all timesteps (both nets) --------------------
    H = jnp.concatenate(h_news, axis=1)                 # [HID, (L+1)B]
    Ht = jnp.concatenate(th_news, axis=1)
    Hb2 = jnp.concatenate([H, Ht], axis=0)              # [2H, (L+1)B]
    Z3b = _mm(_blockdiag(w3T, tw3T), Hb2) + jnp.concatenate([b3, tb3], 0)
    H3b = jnp.maximum(Z3b, 0.0)
    Qb = _mm(_blockdiag(w4T, tw4T), H3b) + jnp.concatenate([b4, tb4], 0)
    Z3, H3 = Z3b[0:w3T.shape[0]], H3b[0:w3T.shape[0]]
    Q = Qb[0:num_actions]                               # [A, (L+1)B]
    Qt = Qb[num_actions:]                               # target net q's

    # ---- loss + dL/dq ----------------------------------------------------
    # The Q-side (Double-DQN argmax, one-hot, bootstrap) vectorizes over
    # all timesteps as [A, LB] passes because Q/Qt carry canonical
    # layouts; act/reward/done stay per-timestep row slices (their slab
    # offsets make lane-flattening a net loss on Mosaic).
    a_star = _argmax0(Q[:, B:], num_actions)            # [LB], t+1 blocks
    star = jnp.stack([(a_star == j).astype(jnp.float32)
                      for j in range(num_actions)])     # [A, LB]
    bootstrapF = jnp.sum(Qt[:, B:] * star, axis=0)      # [LB]

    # Masks: past burn-in and not after an in-window episode end
    # (agents.drqn.drqn_loss).
    ended = jnp.zeros((B,), jnp.float32)
    masks = []
    for tt in range(L):
        valid = (1.0 - ended) if tt >= burn_in else jnp.zeros((B,), jnp.float32)
        masks.append(valid)
        ended = jnp.maximum(ended, batch["done"][tt])
    msum = jnp.maximum(sum(jnp.sum(mk) for mk in masks), 1.0)

    loss = jnp.zeros((), jnp.float32)
    dqs = []
    for tt in range(L):
        a_oh = jnp.stack([(batch["action"][tt] == j).astype(jnp.float32)
                          for j in range(num_actions)])            # [A, B]
        q_sel = jnp.sum(Q[:, tt * B:(tt + 1) * B] * a_oh, axis=0)  # [B]
        bootstrap = bootstrapF[tt * B:(tt + 1) * B]
        target = (batch["reward"][tt]
                  + gamma * bootstrap * (1.0 - batch["done"][tt]))
        diff = q_sel - target
        loss = loss + jnp.sum(masks[tt] * diff * diff)
        dqs.append(a_oh * ((2.0 / msum) * masks[tt] * diff))       # dL/dq[t]
    loss = loss / msum

    # ---- backward: batched head gradients, sequential LSTM recurrence ----
    # Step L's head gets no gradient (its q feeds only the stop-gradient
    # bootstrap) and h_L is unused, so head grads cover t < L only.
    Dq = jnp.concatenate(dqs, axis=1)                              # [A, LB]
    DH3 = _mm_tn(w4T, Dq)
    DZ3 = DH3 * (Z3[:, :LB] > 0.0).astype(jnp.float32)
    Dh_head = _mm_tn(w3T, DZ3)                                     # [HID, LB]

    dh_next = jnp.zeros((HID, B), jnp.float32)
    dc_next = jnp.zeros((HID, B), jnp.float32)
    das = [None] * L
    for tt in reversed(range(L)):
        gi, gf, gg, go, c_prev, tc = cells[tt]
        dh = Dh_head[:, tt * B:(tt + 1) * B] + dh_next
        do = dh * tc
        dc = dh * go * (1.0 - tc * tc) + dc_next
        da = jnp.concatenate([
            dc * gg * gi * (1.0 - gi),
            dc * c_prev * gf * (1.0 - gf),
            dc * gi * (1.0 - gg * gg),
            do * go * (1.0 - go),
        ], axis=0)                                                 # [4H, B]
        das[tt] = da
        dh_next = _mm_tn(whhT, da)
        dc_next = dc * gf

    # ---- batched parameter-gradient contractions -------------------------
    DA = jnp.concatenate(das, axis=1)                              # [4H, LB]
    Hprev = jnp.concatenate(
        [jnp.zeros((HID, B), jnp.float32)] + h_news[:L - 1], axis=1)
    DX2 = _mm_tn(wihT, DA)                                         # [HID, LB]
    DZ1 = _mm_tn(w2T, DX2) * (Z1[:, :LB] > 0.0).astype(jnp.float32)
    da_sum = jnp.sum(DA, axis=1, keepdims=True)
    g = [None] * 12
    g[0] = _mm_nt(DZ1, X[:, :LB])
    g[1] = jnp.sum(DZ1, axis=1, keepdims=True)
    g[2] = _mm_nt(DX2, H1[:, :LB])
    g[3] = jnp.sum(DX2, axis=1, keepdims=True)
    g[4] = _mm_nt(DA, X2[:, :LB])
    g[5] = da_sum
    g[6] = _mm_nt(DA, Hprev)
    g[7] = da_sum
    g[8] = _mm_nt(DZ3, H[:, :LB])
    g[9] = jnp.sum(DZ3, axis=1, keepdims=True)
    g[10] = _mm_nt(Dq, H3[:, :LB])
    g[11] = jnp.sum(Dq, axis=1, keepdims=True)

    # Adam, bias-corrected; pow via exp/log (Mosaic has no scalar pow).
    tf = t.astype(jnp.float32)
    c1 = 1.0 - jnp.exp(tf * math.log(ADAM_B1))
    c2 = 1.0 - jnp.exp(tf * math.log(ADAM_B2))
    new_p, new_m, new_v = [], [], []
    for pi, mi, vi, gi_ in zip(p, m, v, g):
        mi = ADAM_B1 * mi + (1.0 - ADAM_B1) * gi_
        vi = ADAM_B2 * vi + (1.0 - ADAM_B2) * gi_ * gi_
        upd = lr * (mi / c1) / (jnp.sqrt(vi / c2) + ADAM_EPS)
        new_p.append(pi - upd)
        new_m.append(mi)
        new_v.append(vi)
    return tuple(new_p), tuple(new_m), tuple(new_v), loss


def slab_to_batch(slab, L, obs_dim=C.OBS_DIM):
    """Sampled window slab [WF, B] -> drqn_learn_math batch dict."""
    obs = [slab[s * SLOT:s * SLOT + obs_dim] for s in range(L + 1)]
    action = jnp.stack([slab[(tt + 1) * SLOT + obs_dim].astype(jnp.int32)
                        for tt in range(L)])
    reward = jnp.stack([slab[(tt + 1) * SLOT + obs_dim + 1]
                        for tt in range(L)])
    done = jnp.stack([slab[(tt + 1) * SLOT + obs_dim + 2]
                      for tt in range(L)])
    return {"obs": obs, "action": action, "reward": reward, "done": done}


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(cfg_ref, rewards_ref, rounds_ref, cols_ref, *refs,
            n, R, B, L, burn_in, opp, p_greedy, num_actions, gamma, lr,
            target_sync, greedy, random_start, ring_hbm=False):
    # inputs: p 12, tp 12, m 12, v 12, opp 12, env 1, win 1, ring 1 (63)
    # outputs: p 12, tp 12, m 12, v 12, env 1, win 1, ring 1, met 1,
    #          loss 1 (53)
    # ring_hbm adds 4 scratch refs: stage, samp, samp sems, store sem
    NP = 12
    ins, outs = refs[:5 * NP + 3], refs[5 * NP + 3:5 * NP + 3 + 53]
    p_in, tp_in = ins[0:NP], ins[NP:2 * NP]
    m_in, v_in = ins[2 * NP:3 * NP], ins[3 * NP:4 * NP]
    opp_in = ins[4 * NP:5 * NP]
    env_in, win_in, ring_in = ins[5 * NP], ins[5 * NP + 1], ins[5 * NP + 2]
    p_o, tp_o = outs[0:NP], outs[NP:2 * NP]
    m_o, v_o = outs[2 * NP:3 * NP], outs[3 * NP:4 * NP]
    env_o, win_o, ring_o = outs[4 * NP], outs[4 * NP + 1], outs[4 * NP + 2]
    met_o, loss_o = outs[4 * NP + 3], outs[4 * NP + 4]
    WF = (L + 1) * SLOT

    i = pl.program_id(0)
    warm = cfg_ref[2]    # 1 = learning already started in a previous launch
    prior_learns = cfg_ref[3]
    base = cfg_ref[4]    # prior global steps mod L*R (window + ring phase)
    s_glob = base + i    # global step index mod L*R (exact until warm)

    if ring_hbm:
        # HBM-resident window-slab ring (cf. ops.fused_trainer ring_hbm).
        # The ring is written only on flush steps (every L-th), so the
        # store path stages the full window slab and DMAs it out while
        # the learner runs; sample windows prefetch one step ahead.  A
        # sampled round flushed THIS step is patched from the stage
        # buffer (the VMEM path flushes before the learner reads).
        stage, samp_buf, ssem, store_sem = refs[5 * NP + 3 + 53:]
        slot = lax.rem(i, jnp.int32(2))
        r_cur = lax.rem(lax.div(s_glob, jnp.int32(L)), jnp.int32(R))

        def samp_dma(step_slot, step_round, step_col):
            return pltpu.make_async_copy(
                ring_o.at[pl.ds(step_round * WF, WF), pl.ds(step_col * B, B)],
                samp_buf.at[step_slot], ssem.at[step_slot])

        def store_dma():
            return pltpu.make_async_copy(
                stage, ring_o.at[pl.ds(r_cur * WF, WF), :], store_sem)

    @pl.when(i == 0)
    def _():
        for dst, src in zip(p_o + tp_o + m_o + v_o,
                            p_in + tp_in + m_in + v_in):
            dst[:] = src[:]
        env_o[:] = env_in[:]
        win_o[:] = win_in[:]
        if not ring_hbm:
            ring_o[:] = ring_in[:]
        met_o[:] = jnp.zeros((4, n), jnp.float32)
        if ring_hbm:
            samp_dma(jnp.int32(0), rounds_ref[0], cols_ref[0]).start()

    if ring_hbm:
        samp_dma(slot, rounds_ref[i], cols_ref[i]).wait()

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
    h1s = env[11:11 + HID]
    c1s = env[11 + HID:11 + 2 * HID]
    h2s = env[11 + 2 * HID:11 + 3 * HID]
    c2s = env[11 + 3 * HID:11 + 4 * HID]

    obs = jnp.stack([
        x2 - x1, y2 - y1, vel[1] - vel[0], C.END_POINT - pos[0], vel[0],
        x1 - x2, y1 - y2, vel[0] - vel[1], C.END_POINT - pos[1], vel[1],
    ])

    # --- recurrent actor (Phi(eps)-greedy, main.py:105) ---------------------
    p_now = tuple(r[:] for r in p_o)
    threshold = jnp.uint32(min(int(p_greedy * 4294967296.0), 4294967295))

    def pick(best_a, mask_b, rand_b):
        if greedy:
            return best_a
        rand = (rand_b % jnp.uint32(num_actions)).astype(jnp.int32)
        return jnp.where(mask_b < threshold, best_a, rand)

    if opp == OPP_L0:
        _, q1, h1n, c1n = _cell_fwd(p_now, obs, h1s, c1s)
        a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
        h2n, c2n = h2s, c2s
    elif opp == OPP_SELFPLAY:
        # Same params both seats: ONE lane-concat forward (bit-identical
        # per lane; halves the actor's dependent matmul issues).
        obs2 = jnp.concatenate([obs[5:], obs[:5]])
        _, qb, hbn, cbn = _cell_fwd(
            p_now,
            jnp.concatenate([obs, obs2], axis=1),
            jnp.concatenate([h1s, h2s], axis=1),
            jnp.concatenate([c1s, c2s], axis=1))
        q1, q2 = qb[:, :n], qb[:, n:]
        h1n, h2n = hbn[:, :n], hbn[:, n:]
        c1n, c2n = cbn[:, :n], cbn[:, n:]
        a2 = pick(_argmax0(q2, num_actions), bits[2], bits[3])
    else:
        # Frozen opponent: different params -> block-diagonal pair chain.
        obs2 = jnp.concatenate([obs[5:], obs[:5]])
        q1, h1n, c1n, q2, h2n, c2n = _cell_fwd_pair(
            p_now, tuple(r[:] for r in opp_in),
            obs, obs2, h1s, c1s, h2s, c2s)
        a2 = pick(_argmax0(q2, num_actions), bits[2], bits[3])
    a1 = pick(_argmax0(q1, num_actions), bits[0], bits[1])
    actions = jnp.stack([a1, a2])

    # --- env step ------------------------------------------------------------
    rcfg = tuple(rewards_ref[k] for k in range(5))
    npos, nvel, nwin, ntcnt, done, col, rewards, next_obs, coords = \
        _env_step_math(pos, vel, winner, tcnt, jnp.zeros((n,), bool),
                       actions, rcfg, cfg_ref[1])

    # --- window slot write (agents.drqn.drqn_train_step's accumulation:
    # slot wl+1 gets the PRE-reset obs plus the transition into it) ----------
    wl = lax.rem(s_glob, jnp.int32(L))
    slab = jnp.concatenate([
        next_obs,
        jnp.stack([a1.astype(jnp.float32), rewards[0],
                   done.astype(jnp.float32)]),
        jnp.zeros((SLOT - C.OBS_DIM - 3, n), jnp.float32),
    ])                                                             # [SLOT, n]
    win_o[pl.ds((wl + 1) * SLOT, SLOT), :] = slab

    # --- auto-reset values (needed below both for the post-reset obs that
    # seeds the next window and for the state writeback) ---------------------
    reset = done[None, :]
    if random_start:
        pos_r, vel_r, xy_r = _random_reset_vals(n)
    else:
        sp = jnp.full((n,), C.START_POINT, jnp.float32)
        pos_r = jnp.stack([sp, sp])
        vel_r = jnp.full((2, n), C.START_VEL, jnp.float32)
        x1r, y1r = lon2coord(sp, +1.0)
        x2r, y2r = lon2coord(sp, -1.0)
        xy_r = jnp.stack([x1r, y1r, x2r, y2r])
    pos_n = jnp.where(reset, pos_r, npos)
    vel_n = jnp.where(reset, vel_r, nvel)
    xy_n = jnp.where(reset, xy_r, coords)
    obs_post = jnp.stack([
        xy_n[2] - xy_n[0], xy_n[3] - xy_n[1], vel_n[1] - vel_n[0],
        C.END_POINT - pos_n[0], vel_n[0],
        xy_n[0] - xy_n[2], xy_n[1] - xy_n[3], vel_n[0] - vel_n[1],
        C.END_POINT - pos_n[1], vel_n[1],
    ])

    # --- synchronized flush: every L steps the full window slab is copied
    # into the ring round (s_glob // L) % R and the next window starts at
    # the post-reset obs ------------------------------------------------------
    emit = wl == jnp.int32(L - 1)

    if ring_hbm:
        @pl.when(emit)
        def _():
            stage[:] = win_o[:]
            store_dma().start()
            win_o[0:C.OBS_DIM, :] = obs_post
    else:
        @pl.when(emit)
        def _():
            r_cur = lax.rem(lax.div(s_glob, jnp.int32(L)), jnp.int32(R))
            ring_o[pl.ds(r_cur * WF, WF), :] = win_o[:]
            win_o[0:C.OBS_DIM, :] = obs_post

    # --- learner (gated on ring full; agents.drqn gates on cursor >=
    # batch_size -- see module docstring) -------------------------------------
    full_at = jnp.int32(R * L - 1)
    can_learn = (warm == 1) | (s_glob >= full_at)
    lc = prior_learns + jnp.where(warm == 1, i, i - (full_at - base))

    @pl.when(can_learn)
    def _():
        if ring_hbm:
            hit = emit & (rounds_ref[i] == r_cur)
            sampled = jnp.where(hit, stage[:, pl.ds(cols_ref[i] * B, B)],
                                samp_buf[slot])
        elif B == n:
            sampled = ring_o[pl.ds(rounds_ref[i] * WF, WF), :]
        else:
            sampled = ring_o[pl.ds(rounds_ref[i] * WF, WF),
                             pl.ds(cols_ref[i] * B, B)]
        batch = slab_to_batch(sampled, L)
        sync = lax.rem(lc, jnp.int32(target_sync)) == 0
        p12 = tuple(r[:] for r in p_o)
        tp12 = tuple(jnp.where(sync, pv, r[:]) for pv, r in zip(p12, tp_o))
        new_p, new_m, new_v, loss = drqn_learn_math(
            p12, tp12, tuple(r[:] for r in m_o), tuple(r[:] for r in v_o),
            batch, lc + 1, gamma=gamma, lr=lr, num_actions=num_actions,
            seq_len=L, burn_in=burn_in)
        for dst, val in zip(p_o + tp_o + m_o + v_o,
                            new_p + tp12 + new_m + new_v):
            dst[:] = val
        loss_o[:] = jnp.full((8, 128), loss, jnp.float32)

    @pl.when(jnp.logical_not(can_learn))
    def _():
        loss_o[:] = jnp.zeros((8, 128), jnp.float32)

    # --- metrics (agents.drqn.drqn_train_step semantics: ep_reward
    # accumulates unconditionally -- no store gating) --------------------------
    ep_rew = ep_rew + rewards[0]
    won = done & (obs[8] > obs[3])                                 # main.py:225
    met_o[:] = met_o[:] + jnp.stack([
        done.astype(jnp.float32),
        col.astype(jnp.float32),
        won.astype(jnp.float32),
        jnp.where(done, ep_rew, 0.0),
    ])
    ep_rew = jnp.where(done, 0.0, ep_rew)

    # --- state writeback; recurrent state zeroed on reset (both seats) -------
    env_o[0:2] = pos_n
    env_o[2:4] = vel_n
    env_o[4:8] = xy_n
    env_o[8] = jnp.where(done, 0, nwin).astype(jnp.float32)
    env_o[9] = jnp.where(done, 0, ntcnt).astype(jnp.float32)
    env_o[10] = ep_rew
    done_f = done[None, :]
    env_o[11:11 + HID] = jnp.where(done_f, 0.0, h1n)
    env_o[11 + HID:11 + 2 * HID] = jnp.where(done_f, 0.0, c1n)
    env_o[11 + 2 * HID:11 + 3 * HID] = jnp.where(done_f, 0.0, h2n)
    env_o[11 + 3 * HID:11 + 4 * HID] = jnp.where(done_f, 0.0, c2n)

    if ring_hbm:
        # A flush's store must land before the next step's sample
        # prefetch may read the flushed round.
        @pl.when(emit)
        def _():
            store_dma().wait()

        @pl.when(i < pl.num_programs(0) - 1)
        def _():
            samp_dma(lax.rem(i + jnp.int32(1), jnp.int32(2)),
                     rounds_ref[i + 1], cols_ref[i + 1]).start()


# ---------------------------------------------------------------------------
# Host API (mirrors ops.fused_trainer's chunk/resume contract)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R", "B", "L", "burn_in",
                              "opp", "p_greedy", "num_actions", "gamma",
                              "lr", "target_sync", "greedy", "random_start",
                              "interpret"))
def _call(cfg, rewards_vec, rounds, cols, arrays, num_steps, n, R, B, L,
          burn_in, opp, p_greedy, num_actions, gamma, lr, target_sync,
          greedy, random_start=False, interpret=False):
    kernel = functools.partial(
        _kernel, n=n, R=R, B=B, L=L, burn_in=burn_in, opp=opp,
        p_greedy=p_greedy, num_actions=num_actions, gamma=gamma, lr=lr,
        target_sync=target_sync, greedy=greedy, random_start=random_start)
    WF = (L + 1) * SLOT
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                + [whole(a.shape) for a in arrays])
    state_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in arrays[:48]]          # p, tp, m, v
    out_shape = tuple(
        state_shapes
        + [jax.ShapeDtypeStruct((ENV_ROWS, n), jnp.float32),
           jax.ShapeDtypeStruct((WF, n), jnp.float32),
           jax.ShapeDtypeStruct((R * WF, n), jnp.float32),
           jax.ShapeDtypeStruct((4, n), jnp.float32),
           jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = tuple(
        [whole(s.shape) for s in state_shapes]
        + [whole((ENV_ROWS, n)), whole((WF, n)), whole((R * WF, n)),
           whole((4, n)), whole((8, 128))])
    extra = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        kernel, grid=(num_steps,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, rounds, cols, *arrays)


@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R", "B", "L", "burn_in",
                              "opp", "p_greedy", "num_actions", "gamma",
                              "lr", "target_sync", "greedy", "random_start",
                              "interpret"),
    donate_argnames=("ring",))
def _call_hbm(cfg, rewards_vec, rounds, cols, arrays, ring, num_steps, n, R,
              B, L, burn_in, opp, p_greedy, num_actions, gamma, lr,
              target_sync, greedy, random_start=False, interpret=False):
    """HBM-ring launch (cf. ops.fused_trainer._call_hbm): the window-slab
    ring is an ANY-space operand aliased in/out to one donated HBM
    buffer.  Frees the R*WF*n VMEM slab -- the margin that lets the
    width-256 recurrent trunk compile (docs/BENCHMARKS.md 'Recurrent
    width scaling' OOM boundary) -- and unbounds R."""
    kernel = functools.partial(
        _kernel, n=n, R=R, B=B, L=L, burn_in=burn_in, opp=opp,
        p_greedy=p_greedy, num_actions=num_actions, gamma=gamma, lr=lr,
        target_sync=target_sync, greedy=greedy, random_start=random_start,
        ring_hbm=True)
    WF = (L + 1) * SLOT
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                + [whole(a.shape) for a in arrays]
                + [pl.BlockSpec(memory_space=pl.ANY)])
    state_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in arrays[:48]]          # p, tp, m, v
    out_shape = tuple(
        state_shapes
        + [jax.ShapeDtypeStruct((ENV_ROWS, n), jnp.float32),
           jax.ShapeDtypeStruct((WF, n), jnp.float32),
           jax.ShapeDtypeStruct((R * WF, n), jnp.float32),
           jax.ShapeDtypeStruct((4, n), jnp.float32),
           jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = tuple(
        [whole(s.shape) for s in state_shapes]
        + [whole((ENV_ROWS, n)), whole((WF, n)),
           pl.BlockSpec(memory_space=pl.ANY),
           whole((4, n)), whole((8, 128))])
    extra = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        kernel, grid=(num_steps,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        # ring operand = input 4 (cfg..cols) + 62 (p..win); ring_o = 50
        input_output_aliases={4 + len(arrays): 50},
        scratch_shapes=[
            pltpu.VMEM((WF, n), jnp.float32),       # flush stage
            pltpu.VMEM((2, WF, B), jnp.float32),    # sample windows
            pltpu.SemaphoreType.DMA((2,)),          # sample sems
            pltpu.SemaphoreType.DMA(()),            # store sem
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, rounds, cols, *arrays, ring)


def fused_drqn_init(key, cfg, env_params, num_envs, opp_params=None,
                    learn_batch=None, ring_hbm=None):
    """Fresh training state for the single-kernel DRQN trainer.

    ``cfg``: agents.drqn.DRQNConfig.  ``cfg.memory_capacity`` counts
    WINDOWS (like agents.drqn's sequence ring) and must be a multiple of
    ``num_envs`` with ratio R >= 2; windows flush synchronously every
    ``cfg.seq_len`` steps (agents.drqn.drqn_train_init's assert), so the
    ring holds the R most recent flushes.  ``learn_batch`` (default
    num_envs): whole windows consumed per learn -- a lane-window of a
    uniformly chosen round, multiple of 128 dividing num_envs (the
    sampling deviation in the module docstring).  Returns a plain dict
    carry (orbax-serializable; resume == continue).

    ``ring_hbm`` (default None = auto, on when the VMEM ring would
    exceed 24 MB): keep the window-slab ring in HBM with DMA staging
    (cf. ops.fused_trainer ring_hbm) -- frees the VMEM margin that the
    width-256 recurrent trunk needs, and unbounds R.  Bit-exact vs the
    VMEM ring (tests/test_fused_drqn_e2e.py runs both modes); the ring
    buffer is DONATED each chunk.
    """
    from merging_gym_tpu.nn.lstm import drqn_init
    from merging_gym_tpu.ops.fused_trainer import _init_env_rows

    if num_envs % 128 != 0:
        raise ValueError(f"num_envs must be a multiple of 128, got {num_envs}")
    B = num_envs if learn_batch is None else int(learn_batch)
    if B % 128 != 0 or num_envs % B != 0:
        raise ValueError("learn_batch must be a multiple of 128 dividing "
                         f"num_envs, got learn_batch={B} num_envs={num_envs}")
    R = cfg.memory_capacity // num_envs
    if R < 2 or cfg.memory_capacity != R * num_envs:
        raise ValueError("memory_capacity must be k*num_envs with k>=2, got "
                         f"capacity={cfg.memory_capacity} num_envs={num_envs}")
    L = int(cfg.seq_len)
    if cfg.opponent == OPP_FROZEN:
        assert opp_params is not None, "frozen opponent needs params"
    k_eval, k_target = jax.random.split(jax.random.fold_in(key, 0))
    p = drqn_params_to_t(drqn_init(k_eval, cfg.obs_dim, cfg.num_actions))
    tp = drqn_params_to_t(drqn_init(k_target, cfg.obs_dim, cfg.num_actions))
    zeros12 = tuple(jnp.zeros_like(a) for a in p)
    opp = drqn_params_to_t(opp_params) if opp_params is not None else p

    n = num_envs
    env = np.zeros((ENV_ROWS, n), np.float32)
    env[0:8] = _init_env_rows(env_params, jax.random.fold_in(key, 7), n)
    WF = (L + 1) * SLOT
    win = np.zeros((WF, n), np.float32)
    # Slot 0 of the first window is the initial observation
    # (agents.drqn.drqn_train_init seeds window obs[0] the same way).
    e = env[0:8]
    win[0:C.OBS_DIM] = np.stack([
        e[6] - e[4], e[7] - e[5], e[3] - e[2], C.END_POINT - e[0], e[2],
        e[4] - e[6], e[5] - e[7], e[2] - e[3], C.END_POINT - e[1], e[3],
    ])
    if ring_hbm is None:
        ring_hbm = R * WF * n * 4 > 24 * 1024 * 1024
    return {
        "p": p, "tp": tp, "m": zeros12, "v": zeros12, "opp": opp,
        "env": jnp.asarray(env), "win": jnp.asarray(win),
        "ring": jnp.zeros((R * WF, n), jnp.float32),
        "ring_hbm": int(bool(ring_hbm)),
        "R": R, "n": n, "B": B, "L": L, "warm": 0, "learns": 0, "steps": 0,
        "env_steps": 0,
        "episodes": 0.0, "collisions": 0.0, "wins": 0.0, "sum_ep_reward": 0.0,
        "last_loss": 0.0,
    }


def coerce_drqn_carry(carry):
    """Fix types after an orbax StandardRestore roundtrip (cf.
    fused_trainer.coerce_carry): static sizes/counters back to Python
    ints, param 12-tuples back to f32 jnp tuples.  Everything streamed
    through HBM round-trips exactly, so a resumed run continues
    bit-for-bit."""
    out = dict(carry)
    for k in ("R", "n", "B", "L", "warm", "learns", "steps", "env_steps"):
        out[k] = int(out.get(k, 0))
    out["ring_hbm"] = int(out.get("ring_hbm", 0))
    for k in ("episodes", "collisions", "wins", "sum_ep_reward", "last_loss"):
        out[k] = float(out[k])
    for k in ("p", "tp", "m", "v", "opp"):
        out[k] = tuple(jnp.asarray(a, jnp.float32) for a in out[k])
    for k in ("env", "win", "ring"):
        out[k] = jnp.asarray(out[k], jnp.float32)
    return out


def drqn_launch_cfg(carry, env_params, seed):
    """SMEM cfg vector [seed, max_steps, warm, learns, base]; ``base`` is
    prior global steps mod L*R, the joint window + ring phase."""
    period = carry["L"] * carry["R"]
    return jnp.stack([
        jnp.asarray(seed, jnp.int32),
        jnp.int32(env_params.max_steps),
        jnp.int32(carry["warm"]),
        jnp.int32(carry["learns"]),
        jnp.int32(carry.get("steps", 0) % period),
    ])


def drqn_chunk_learns(carry, num_steps):
    """Learn count added by a ``num_steps`` launch (ring-full gated)."""
    full_at = carry["R"] * carry["L"] - 1
    prior = carry.get("steps", 0)
    warmup_left = 0 if carry["warm"] else max(full_at - prior, 0)
    return max(num_steps - warmup_left, 0)


def apply_drqn_chunk(carry, out, num_steps, met_sum, loss):
    """Fold a launch's outputs back into the host-side carry dict
    (cf. fused_trainer.apply_chunk; shared with the SPMD wrapper)."""
    NP = 12
    p, tp = out[0:NP], out[NP:2 * NP]
    m, v = out[2 * NP:3 * NP], out[3 * NP:4 * NP]
    env, win, ring = out[4 * NP], out[4 * NP + 1], out[4 * NP + 2]
    steps = carry.get("steps", 0) + num_steps
    full_at = carry["R"] * carry["L"] - 1
    return {
        **carry,
        "p": tuple(p), "tp": tuple(tp), "m": tuple(m), "v": tuple(v),
        "env": env, "win": win, "ring": ring,
        "warm": 1 if steps >= full_at else 0,
        "steps": steps,
        "learns": carry["learns"] + drqn_chunk_learns(carry, num_steps),
        "env_steps": carry["env_steps"] + num_steps * carry["n"],
        "episodes": carry["episodes"] + float(met_sum[0]),
        "collisions": carry["collisions"] + float(met_sum[1]),
        "wins": carry["wins"] + float(met_sum[2]),
        "sum_ep_reward": carry["sum_ep_reward"] + float(met_sum[3]),
        "last_loss": float(loss),
    }


def _interpret_flag():
    return os.environ.get("MGT_FUSED_INTERPRET", "") == "1"


def fused_drqn_chunk(cfg, env_params, carry, num_steps, seed, *,
                     greedy=False, rounds=None, cols=None):
    """Run ``num_steps`` DRQN training steps in ONE kernel launch.

    ``greedy=True`` + explicit ``rounds``/``cols`` streams (both i32
    [num_steps]; default drawn host-side from ``seed``) make the kernel
    deterministic and interpret-testable on CPU, exactly like
    fused_trainer.fused_dqn_chunk (tests/test_fused_drqn_e2e.py).
    """
    R, n, B, L = carry["R"], carry["n"], carry["B"], carry["L"]
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps} (a "
                         "zero-iteration grid would skip the state copy "
                         "and return uninitialized outputs)")
    k_r, k_c = jax.random.split(jax.random.key(seed ^ 0xD7D7))
    if rounds is None:
        rounds = jax.random.randint(k_r, (num_steps,), 0, R, jnp.int32)
    if cols is None:
        cols = jax.random.randint(k_c, (num_steps,), 0, n // B, jnp.int32)
    rounds = jnp.asarray(rounds, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    if rounds.shape != (num_steps,) or cols.shape != (num_steps,):
        raise ValueError("rounds/cols must be i32 [num_steps]")
    rnp, cnp = np.asarray(rounds), np.asarray(cols)
    if rnp.min() < 0 or rnp.max() >= R or cnp.min() < 0 or cnp.max() >= n // B:
        raise ValueError(f"rounds must lie in [0, {R}) and cols in "
                         f"[0, {n // B})")
    if env_params.random_start and greedy:
        raise ValueError("random starts need the on-chip PRNG, which "
                         "greedy mode skips; drop one of the two")
    common = (num_steps, n, R, B, L, int(cfg.burn_in), cfg.opponent,
              _phi(cfg.epsilon), cfg.num_actions, float(cfg.gamma),
              float(cfg.lr), int(cfg.target_sync), bool(greedy))
    kw = dict(random_start=bool(env_params.random_start),
              interpret=_interpret_flag())
    if carry.get("ring_hbm"):
        arrays = (list(carry["p"]) + list(carry["tp"]) + list(carry["m"])
                  + list(carry["v"]) + list(carry["opp"])
                  + [carry["env"], carry["win"]])
        out = _call_hbm(drqn_launch_cfg(carry, env_params, seed),
                        rewards_cfg(env_params), rounds, cols,
                        tuple(arrays), carry["ring"], *common, **kw)
    else:
        arrays = (list(carry["p"]) + list(carry["tp"]) + list(carry["m"])
                  + list(carry["v"]) + list(carry["opp"])
                  + [carry["env"], carry["win"], carry["ring"]])
        out = _call(drqn_launch_cfg(carry, env_params, seed),
                    rewards_cfg(env_params), rounds, cols, tuple(arrays),
                    *common, **kw)
    met = np.asarray(out[51]).sum(axis=1)
    return apply_drqn_chunk(carry, out, num_steps, met,
                            float(np.asarray(out[52])[0, 0]))
