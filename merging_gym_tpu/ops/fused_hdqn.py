"""Pallas TPU kernel: the ENTIRE hierarchical DQN trainer as one kernel.

Third member of the single-kernel family (cf. ops.fused_trainer for
flat DQN, ops.fused_rainbow for C51+NoisyNet+Dueling):
T training steps of the two-timescale h-DQN of scripts/hdqn.py run as
the Pallas grid with EVERY component resident on-chip --

  * meta-controller actor: Phi(eps)-greedy over 3 goals, re-chosen at
    option boundaries AND from the post-step state every step (the
    reference's goal-drift quirk, hdqn.py:283-286,303);
  * low-level actor: Phi(eps)-greedy over 5 actions on the 11-dim
    ``[goal] + obs`` input (hdqn.py:291);
  * env: ops.fused_rollout._env_step_math (locked to core.env.step);
  * intrinsic reward ``goal_new == goal_status(pre-step obs)``
    (hdqn.py:314) and option termination ``done | (goal_new ==
    goal_status(post-step obs))`` (hdqn.py:322-323);
  * TWO slab replay rings: the lower ring stores every step
    (hdqn.py:316, no gating); the upper (goal-memory) ring stores at
    option ends with the faithful duplicated final state
    (hdqn.py:320,325) -- lanes mid-option re-store their previous row
    (the stale-duplicate slab semantics of ops.fused_trainer);
  * TWO Double-DQN + Adam learners via the width-generic ``learn_math``
    (autodiff-locked in tests/test_fused_trainer.py), each with its own
    every-``target_sync``-learns pre-update target sync.  The lower
    learner fires every step once its ring holds R_lo rounds; the upper
    learner fires when the upper ring holds R_up rounds AND any option
    ended this step (the vectorised analog of one meta learn per option
    end, hdqn.py:326-327) -- its learn counter is data-dependent, so it
    persists as an on-chip state row.

Sampling deviation (same as ops.fused_trainer, documented there): each
learn consumes one uniformly chosen whole round slab instead of
``batch_size`` i.i.d. draws; upper rounds written before a lane's first
option end carry zero rows for that lane (options end with probability
~1/3 per step under the every-step re-selection, so real rows dominate
within ~10 steps of the gate opening).

Faithful-meta mode only: the textbook (option-start-obs, end-obs) meta
transition needs 10 more state rows; use agents.hdqn (XLA) for
``faithful_meta=False``.  Randomised starts supported via the shared
in-kernel Box-Muller reset (ops.fused_rollout._random_reset_vals;
non-greedy mode only).

tests/test_fused_hdqn_e2e.py locks the whole loop in interpret mode
against an XLA reference built from independently verified components.
"""

from __future__ import annotations

import functools
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
from merging_gym_tpu.ops.fused_trainer import (OPP_FROZEN, OPP_L0,
                                               OPP_SELFPLAY, _argmax0, _fwd,
                                               _init_env_rows, _phi,
                                               learn_math, params_to_t)

# Lower ring fields: [goal;obs] 11 + [goal';next_obs] 11 + a/r/done = 25,
# padded to 32 (dynamic row offsets must be multiples of 8 for Mosaic).
LO_F = 32
# Upper ring fields: obs 10 + next_obs 10 + goal/r/done = 23, padded to 24.
UP_F = 24
# State rows: env 11 (pos2 vel2 xy4 winner t ep_rew) + goal, goal_op,
# extr_return, option_start, upper_lc = 16.
ROWS = 16


def _goal_status(obs10):
    """hdqn.py:223-236 on [10, n] stacked obs."""
    dx1, v2 = obs10[0], obs10[9]
    return jnp.where(dx1 < -0.5 * v2, 0,
                     jnp.where(dx1 < 0.5 * v2, 1, 2)).astype(jnp.int32)


def _kernel(cfg_ref, rewards_ref, lo_rounds_ref, up_rounds_ref, cols_ref,
            *refs,
            n, R_lo, R_up, B, opp, p_greedy, num_actions, num_goals, gamma,
            lr, target_sync, mask_terminal, greedy, random_start,
            compute_dtype="float32"):
    # inputs: u_p 6, u_tp 6, u_m 6, u_v 6, l_p 6, l_tp 6, l_m 6, l_v 6,
    #         opp_u 6, opp_l 6, state 1, lo_ring 1, up_ring 1   (63)
    # outputs: the 48 learner arrays + state + lo_ring + up_ring + met +
    #          loss  (53)
    ins, outs = refs[:63], refs[63:]
    u_in = [ins[k * 6:(k + 1) * 6] for k in range(4)]
    l_in = [ins[24 + k * 6:24 + (k + 1) * 6] for k in range(4)]
    opp_u_in, opp_l_in = ins[48:54], ins[54:60]
    st_in, lo_in, up_in = ins[60], ins[61], ins[62]
    u_o = [outs[k * 6:(k + 1) * 6] for k in range(4)]
    l_o = [outs[24 + k * 6:24 + (k + 1) * 6] for k in range(4)]
    st_o, lo_o, up_o = outs[48], outs[49], outs[50]
    met_o, loss_o = outs[51], outs[52]

    i = pl.program_id(0)
    warm_lo = cfg_ref[2]
    prior_lo = cfg_ref[3]
    base = cfg_ref[4]          # global steps % (R_lo * R_up): exact mod
                               # BOTH ring sizes, and == true prior steps
                               # while either warm flag is 0
    warm_up = cfg_ref[5]

    @pl.when(i == 0)
    def _():
        for group_o, group_i in zip(u_o + l_o, u_in + l_in):
            for dst, src in zip(group_o, group_i):
                dst[:] = src[:]
        st_o[:] = st_in[:]
        lo_o[:] = lo_in[:]
        up_o[:] = up_in[:]
        met_o[:] = jnp.zeros((4, n), jnp.float32)

    if greedy:
        bits = (None,) * 10
    else:
        pltpu.prng_seed(cfg_ref[0] + i)
        bits = pltpu.bitcast(pltpu.prng_random_bits((10, n)), jnp.uint32)
    threshold = jnp.uint32(min(int(p_greedy * 4294967296.0), 4294967295))

    cdt = jnp.dtype(compute_dtype)

    def eps_greedy(params6, x, num_a, mask_b, rand_b):
        _, _, _, _, q = _fwd(params6, x, cdt)
        best = _argmax0(q, num_a)
        if greedy:
            return best
        rand = (rand_b % jnp.uint32(num_a)).astype(jnp.int32)
        return jnp.where(mask_b < threshold, best, rand)

    # --- current state -------------------------------------------------------
    st = st_o[:]
    pos, vel = st[0:2], st[2:4]
    x1, y1, x2, y2 = st[4], st[5], st[6], st[7]
    winner = st[8].astype(jnp.int32)
    tcnt = st[9].astype(jnp.int32)
    ep_rew = st[10]
    goal = st[11].astype(jnp.int32)
    goal_op = st[12].astype(jnp.int32)
    extr = st[13]
    opt_start = st[14] > 0.5
    # Upper learn counter: i32 BITS stored in the f32 state row (plain
    # f32 counting would saturate at 2^24 ~ 16.7M learns, freezing the
    # target-sync cadence and Adam bias correction on long runs).
    up_lc_i = lax.bitcast_convert_type(st[15], jnp.int32)

    obs = jnp.stack([
        x2 - x1, y2 - y1, vel[1] - vel[0], C.END_POINT - pos[0], vel[0],
        x1 - x2, y1 - y2, vel[0] - vel[1], C.END_POINT - pos[1], vel[1],
    ])

    u_p = tuple(r[:] for r in u_o[0])
    l_p = tuple(r[:] for r in l_o[0])

    # --- option boundaries: fresh goal + zeroed return (hdqn.py:283-286) -----
    goal_fresh = eps_greedy(u_p, obs, num_goals, bits[0], bits[1])
    goal = jnp.where(opt_start, goal_fresh, goal)
    extr = jnp.where(opt_start, 0.0, extr)

    def with_goal(g, o):
        return jnp.concatenate([g.astype(jnp.float32)[None], o])

    a1 = eps_greedy(l_p, with_goal(goal, obs), num_actions, bits[2], bits[3])
    if opp == OPP_L0:
        a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
    else:
        obs2 = jnp.concatenate([obs[5:], obs[:5]])
        up_op = u_p if opp == OPP_SELFPLAY else tuple(r[:] for r in opp_u_in)
        lo_op = l_p if opp == OPP_SELFPLAY else tuple(r[:] for r in opp_l_in)
        gof = eps_greedy(up_op, obs2, num_goals, bits[4], bits[5])
        goal_op = jnp.where(opt_start, gof, goal_op)
        a2 = eps_greedy(lo_op, with_goal(goal_op, obs2), num_actions,
                        bits[6], bits[7])
    actions = jnp.stack([a1, a2])

    # --- env step -------------------------------------------------------------
    rcfg = tuple(rewards_ref[k] for k in range(5))
    npos, nvel, nwin, ntcnt, done, col, rewards, next_obs, coords = \
        _env_step_math(pos, vel, winner, tcnt, jnp.zeros((n,), bool),
                       actions, rcfg, cfg_ref[1])

    # --- goal re-chosen from the post-step state (hdqn.py:303) ----------------
    goal_new = eps_greedy(u_p, next_obs, num_goals, bits[8], bits[9])
    intrinsic = (goal_new == _goal_status(obs)).astype(jnp.float32)

    # --- lower ring: unconditional store (hdqn.py:316) ------------------------
    r_lo = lax.rem(base + i, jnp.int32(R_lo))
    lo_slab = jnp.concatenate([
        with_goal(goal, obs), with_goal(goal_new, next_obs),
        jnp.stack([a1.astype(jnp.float32), intrinsic,
                   done.astype(jnp.float32)]),
        jnp.zeros((LO_F - 25, n), jnp.float32),
    ])
    lo_o[pl.ds(r_lo * LO_F, LO_F), :] = lo_slab

    # --- lower learner ---------------------------------------------------------
    can_lo = (warm_lo == 1) | (base + i >= R_lo - 1)
    lc_lo = prior_lo + jnp.where(warm_lo == 1, i,
                                 i - (jnp.int32(R_lo - 1) - base))

    @pl.when(can_lo)
    def _():
        if B == n:
            s = lo_o[pl.ds(lo_rounds_ref[i] * LO_F, LO_F), :]
        else:
            # Uniformly chosen disjoint B-lane window (the fused_trainer
            # learn_batch pattern) -- cuts both learners' matmul work by
            # n/B and restores a reference-scale batch (hdqn.py:17: 128).
            s = lo_o[pl.ds(lo_rounds_ref[i] * LO_F, LO_F),
                     pl.ds(cols_ref[2 * i] * B, B)]
        batch = {"obs": s[0:11], "next_obs": s[11:22],
                 "action": s[22].astype(jnp.int32), "reward": s[23],
                 "done": s[24] > 0.5}
        sync = lax.rem(lc_lo, jnp.int32(target_sync)) == 0
        p6 = tuple(r[:] for r in l_o[0])
        tp6 = tuple(jnp.where(sync, pv, r[:]) for pv, r in zip(p6, l_o[1]))
        new_p, new_m, new_v, loss = learn_math(
            p6, tp6, tuple(r[:] for r in l_o[2]),
            tuple(r[:] for r in l_o[3]), batch, lc_lo + 1, gamma=gamma,
            lr=lr, num_actions=num_actions, mask_terminal=mask_terminal,
            compute_dtype=cdt)
        for dst, val in zip(l_o[0] + l_o[1] + l_o[2] + l_o[3],
                            new_p + tp6 + new_m + new_v):
            dst[:] = val
        loss_o[:] = jnp.full((8, 128), loss, jnp.float32)

    @pl.when(jnp.logical_not(can_lo))
    def _():
        loss_o[:] = jnp.zeros((8, 128), jnp.float32)

    # --- option termination + upper ring (hdqn.py:320-327, faithful meta) -----
    extr = extr + rewards[0]
    opt_end = done | (goal_new == _goal_status(next_obs))
    endf = opt_end[None, :].astype(jnp.float32)
    r_up = lax.rem(base + i, jnp.int32(R_up))
    up_slab = jnp.concatenate([
        next_obs, next_obs,        # duplicated final state (hdqn.py:320,325)
        jnp.stack([goal_new.astype(jnp.float32), extr,
                   done.astype(jnp.float32)]),
        jnp.zeros((UP_F - 23, n), jnp.float32),
    ])
    old_up = up_o[pl.ds(r_up * UP_F, UP_F), :]
    up_o[pl.ds(r_up * UP_F, UP_F), :] = endf * up_slab + (1.0 - endf) * old_up

    # --- upper learner (gate: ring full AND any option ended) -----------------
    any_end = jnp.max(opt_end.astype(jnp.float32)) > 0.5
    can_up = ((warm_up == 1) | (base + i >= R_up - 1)) & any_end
    lc_up = up_lc_i[0]                   # data-dependent; carried in a row

    @pl.when(can_up)
    def _():
        if B == n:
            s = up_o[pl.ds(up_rounds_ref[i] * UP_F, UP_F), :]
        else:
            s = up_o[pl.ds(up_rounds_ref[i] * UP_F, UP_F),
                     pl.ds(cols_ref[2 * i + 1] * B, B)]
        batch = {"obs": s[0:10], "next_obs": s[10:20],
                 "action": s[20].astype(jnp.int32), "reward": s[21],
                 "done": s[22] > 0.5}
        sync = lax.rem(lc_up, jnp.int32(target_sync)) == 0
        p6 = tuple(r[:] for r in u_o[0])
        tp6 = tuple(jnp.where(sync, pv, r[:]) for pv, r in zip(p6, u_o[1]))
        new_p, new_m, new_v, _ = learn_math(
            p6, tp6, tuple(r[:] for r in u_o[2]),
            tuple(r[:] for r in u_o[3]), batch, lc_up + 1, gamma=gamma,
            lr=lr, num_actions=num_goals, mask_terminal=mask_terminal,
            compute_dtype=cdt)
        for dst, val in zip(u_o[0] + u_o[1] + u_o[2] + u_o[3],
                            new_p + tp6 + new_m + new_v):
            dst[:] = val

    up_lc_i = jnp.where(can_up, up_lc_i + 1, up_lc_i)

    # --- metrics (unconditional accumulation, hdqn.py:312) --------------------
    # Win test on the POST-step obs: hdqn.py:342 reads `state` AFTER the
    # `state = next_state` at :320 (unlike main.py, where the break
    # precedes the assignment -- see agents/hdqn.py and docs/PARITY.md).
    ep_rew = ep_rew + rewards[0]
    won = done & (next_obs[8] > next_obs[3])
    met_o[:] = met_o[:] + jnp.stack([
        done.astype(jnp.float32), col.astype(jnp.float32),
        won.astype(jnp.float32), jnp.where(done, ep_rew, 0.0)])
    ep_rew = jnp.where(done, 0.0, ep_rew)

    # --- auto-reset + writeback ------------------------------------------------
    reset = done[None, :]
    if random_start:
        pos_r, vel_r, xy_r = _random_reset_vals(n)
    else:
        pos_r, vel_r = C.START_POINT, C.START_VEL
        sp = jnp.full((n,), C.START_POINT, jnp.float32)
        x1r, y1r = lon2coord(sp, +1.0)
        x2r, y2r = lon2coord(sp, -1.0)
        xy_r = jnp.stack([x1r, y1r, x2r, y2r])
    st_o[0:2] = jnp.where(reset, pos_r, npos)
    st_o[2:4] = jnp.where(reset, vel_r, nvel)
    st_o[4:8] = jnp.where(reset, xy_r, coords)
    st_o[8] = jnp.where(done, 0, nwin).astype(jnp.float32)
    st_o[9] = jnp.where(done, 0, ntcnt).astype(jnp.float32)
    st_o[10] = ep_rew
    st_o[11] = goal_new.astype(jnp.float32)
    st_o[12] = goal_op.astype(jnp.float32)
    st_o[13] = jnp.where(opt_end, 0.0, extr)
    st_o[14] = opt_end.astype(jnp.float32)
    st_o[15] = lax.bitcast_convert_type(up_lc_i, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("num_steps", "n", "R_lo", "R_up", "B", "opp",
                              "p_greedy", "num_actions", "num_goals", "gamma",
                              "lr", "target_sync", "mask_terminal", "greedy",
                              "random_start", "interpret", "compute_dtype"))
def _call(cfg, rewards_vec, lo_rounds, up_rounds, cols, arrays, num_steps, n,
          R_lo, R_up, B, opp, p_greedy, num_actions, num_goals, gamma, lr,
          target_sync, mask_terminal, greedy, random_start=False,
          interpret=False, compute_dtype="float32"):
    kernel = functools.partial(
        _kernel, n=n, R_lo=R_lo, R_up=R_up, B=B, opp=opp, p_greedy=p_greedy,
        num_actions=num_actions, num_goals=num_goals, gamma=gamma, lr=lr,
        target_sync=target_sync, mask_terminal=mask_terminal, greedy=greedy,
        random_start=random_start, compute_dtype=compute_dtype)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
                + [whole(a.shape) for a in arrays])
    learner_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                      for a in arrays[:48]]
    out_shape = tuple(
        learner_shapes
        + [jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
           jax.ShapeDtypeStruct((R_lo * LO_F, n), jnp.float32),
           jax.ShapeDtypeStruct((R_up * UP_F, n), jnp.float32),
           jax.ShapeDtypeStruct((4, n), jnp.float32),
           jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = tuple(
        [whole(s.shape) for s in learner_shapes]
        + [whole((ROWS, n)), whole((R_lo * LO_F, n)), whole((R_up * UP_F, n)),
           whole((4, n)), whole((8, 128))])
    extra = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        kernel, grid=(num_steps,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        **extra,
    )(cfg, rewards_vec, lo_rounds, up_rounds, cols, *arrays)


def fused_hdqn_init(key, cfg, env_params, num_envs, opp_upper=None,
                    opp_lower=None, learn_batch=None):
    """Fresh training state for the single-kernel hierarchical trainer.

    ``cfg``: agents.hdqn.HDQNConfig.  ``cfg.memory_capacity`` (lower) and
    ``cfg.goal_memory_capacity`` (upper) must both be multiples of
    num_envs with at least 2 rounds each (the reference's 200-slot goal
    memory maps to ``goal_memory_capacity = 2 * num_envs`` at vector
    scale).  Faithful-meta mode only (module docstring).
    """
    from merging_gym_tpu.nn.mlp import qnet_init

    if not cfg.faithful_meta:
        raise ValueError("fused_hdqn supports faithful_meta=True only; "
                         "use agents.hdqn for the textbook meta transition")
    if num_envs % 128 != 0:
        raise ValueError(f"num_envs must be a multiple of 128, got {num_envs}")
    B = num_envs if learn_batch is None else int(learn_batch)
    if B % 128 != 0 or num_envs % B != 0:
        raise ValueError("learn_batch must be a multiple of 128 dividing "
                         f"num_envs, got learn_batch={B} num_envs={num_envs}")
    R_lo = cfg.memory_capacity // num_envs
    R_up = cfg.goal_memory_capacity // num_envs
    for name, cap, R in (("memory_capacity", cfg.memory_capacity, R_lo),
                         ("goal_memory_capacity", cfg.goal_memory_capacity,
                          R_up)):
        if R < 2 or cap != R * num_envs:
            raise ValueError(f"{name} must be k*num_envs with k>=2, got "
                             f"{cap} at num_envs={num_envs}")
    ks = jax.random.split(jax.random.fold_in(key, 1), 4)
    u_p = params_to_t(qnet_init(ks[0], cfg.obs_dim, cfg.num_goals, cfg.hidden))
    u_tp = params_to_t(qnet_init(ks[1], cfg.obs_dim, cfg.num_goals, cfg.hidden))
    l_p = params_to_t(qnet_init(ks[2], cfg.obs_dim + 1, cfg.num_actions,
                                cfg.hidden))
    l_tp = params_to_t(qnet_init(ks[3], cfg.obs_dim + 1, cfg.num_actions,
                                 cfg.hidden))
    z = lambda t: tuple(jnp.zeros_like(a) for a in t)
    if cfg.opponent == OPP_FROZEN:
        if opp_upper is None or opp_lower is None:
            raise ValueError("frozen opponent needs opp_upper and opp_lower")
        opp_u, opp_l = params_to_t(opp_upper), params_to_t(opp_lower)
    else:
        opp_u, opp_l = u_p, l_p

    n = num_envs
    st = np.zeros((ROWS, n), np.float32)
    st[0:8] = _init_env_rows(env_params, jax.random.fold_in(key, 7), n)
    st[14] = 1.0   # every lane starts a fresh option
    return {
        "u_p": u_p, "u_tp": u_tp, "u_m": z(u_p), "u_v": z(u_p),
        "l_p": l_p, "l_tp": l_tp, "l_m": z(l_p), "l_v": z(l_p),
        "opp_u": opp_u, "opp_l": opp_l,
        "state": jnp.asarray(st),
        "lo_ring": jnp.zeros((R_lo * LO_F, n), jnp.float32),
        "up_ring": jnp.zeros((R_up * UP_F, n), jnp.float32),
        "R_lo": R_lo, "R_up": R_up, "n": n, "B": B,
        "warm_lo": 0, "warm_up": 0, "lo_learns": 0, "steps": 0,
        "env_steps": 0, "episodes": 0.0, "collisions": 0.0, "wins": 0.0,
        "sum_ep_reward": 0.0, "last_loss": 0.0,
    }


def hdqn_launch_cfg(carry, env_params, seed):
    """The kernel's SMEM cfg vector [seed, max_steps, warm_lo, lo_learns,
    base, warm_up] -- ``seed`` may be traced (the SPMD wrapper folds in
    the device index).  ONE definition shared by the single-chip and
    distributed launch paths (cf. ops.fused_trainer.launch_cfg); base is
    steps % (R_lo*R_up), a common multiple of both ring sizes that still
    equals the true prior step count while either warm flag is 0.
    """
    return jnp.stack([
        jnp.asarray(seed, jnp.int32),
        jnp.int32(env_params.max_steps),
        jnp.int32(carry["warm_lo"]),
        jnp.int32(carry["lo_learns"]),
        jnp.int32(carry["steps"] % (carry["R_lo"] * carry["R_up"])),
        jnp.int32(carry["warm_up"]),
    ])


def apply_hdqn_chunk(carry, groups, state, lo_ring, up_ring, num_steps,
                     met_sum, loss):
    """Fold a launch's outputs back into the host-side carry dict (cf.
    ops.fused_trainer.apply_chunk) -- shared by fused_hdqn_chunk and
    parallel.spmd.spmd_fused_hdqn_chunk so the warm/learn counter
    semantics have one definition."""
    R_lo, R_up = carry["R_lo"], carry["R_up"]
    steps = carry["steps"] + num_steps
    warmup_left = 0 if carry["warm_lo"] else max(R_lo - 1 - carry["steps"], 0)
    return {
        **carry,
        "u_p": groups[0], "u_tp": groups[1], "u_m": groups[2],
        "u_v": groups[3],
        "l_p": groups[4], "l_tp": groups[5], "l_m": groups[6],
        "l_v": groups[7],
        "state": state, "lo_ring": lo_ring, "up_ring": up_ring,
        "warm_lo": 1 if steps >= R_lo - 1 else 0,
        "warm_up": 1 if steps >= R_up - 1 else 0,
        "lo_learns": carry["lo_learns"] + max(num_steps - warmup_left, 0),
        "steps": steps,
        "env_steps": carry["env_steps"] + num_steps * carry["n"],
        "episodes": carry["episodes"] + float(met_sum[0]),
        "collisions": carry["collisions"] + float(met_sum[1]),
        "wins": carry["wins"] + float(met_sum[2]),
        "sum_ep_reward": carry["sum_ep_reward"] + float(met_sum[3]),
        "last_loss": float(loss),
    }


def fused_hdqn_chunk(cfg, env_params, carry, num_steps, seed, *,
                     greedy=False, lo_rounds=None, up_rounds=None,
                     cols=None):
    """Run ``num_steps`` hierarchical training steps in ONE kernel launch.

    ``cols`` (i32 [2*num_steps], default host-drawn): interleaved
    (lower, upper) lane-window draws used when ``learn_batch < n``.
    """
    R_lo, R_up, n = carry["R_lo"], carry["R_up"], carry["n"]
    B = carry.get("B", n)
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps} (a "
                         "zero-iteration grid would skip the state copy "
                         "and return uninitialized outputs)")
    k1, k2 = jax.random.split(jax.random.key(seed ^ 0x4D0))
    if lo_rounds is None:
        lo_rounds = jax.random.randint(k1, (num_steps,), 0, R_lo, jnp.int32)
    if up_rounds is None:
        up_rounds = jax.random.randint(k2, (num_steps,), 0, R_up, jnp.int32)
    if cols is None:
        cols = jax.random.randint(jax.random.key(seed ^ 0xC01),
                                  (2 * num_steps,), 0, n // B, jnp.int32)
    lo_rounds = jnp.asarray(lo_rounds, jnp.int32)
    up_rounds = jnp.asarray(up_rounds, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    if (lo_rounds.shape != (num_steps,) or up_rounds.shape != (num_steps,)
            or cols.shape != (2 * num_steps,)):
        raise ValueError("lo_rounds/up_rounds must be i32 [num_steps], "
                         "cols i32 [2*num_steps]")
    cnp = np.asarray(cols)
    if cnp.min() < 0 or cnp.max() >= n // B:
        raise ValueError(f"cols must lie in [0, {n // B})")
    lnp, unp = np.asarray(lo_rounds), np.asarray(up_rounds)
    if (lnp.min() < 0 or lnp.max() >= R_lo
            or unp.min() < 0 or unp.max() >= R_up):
        raise ValueError(f"lo_rounds must lie in [0, {R_lo}) and up_rounds "
                         f"in [0, {R_up}) (out-of-range values clamp to "
                         "the ring edge and silently train on the wrong "
                         "slab)")
    if env_params.random_start and greedy:
        raise ValueError("random starts need the on-chip PRNG, which "
                         "greedy mode skips; drop one of the two")
    cfgv = hdqn_launch_cfg(carry, env_params, seed)
    from merging_gym_tpu.ops.fused_trainer import rewards_cfg
    rewards_vec = rewards_cfg(env_params)
    arrays = (list(carry["u_p"]) + list(carry["u_tp"]) + list(carry["u_m"])
              + list(carry["u_v"]) + list(carry["l_p"]) + list(carry["l_tp"])
              + list(carry["l_m"]) + list(carry["l_v"])
              + list(carry["opp_u"]) + list(carry["opp_l"])
              + [carry["state"], carry["lo_ring"], carry["up_ring"]])
    out = _call(cfgv, rewards_vec, lo_rounds, up_rounds, cols,
                tuple(arrays),
                num_steps, n, R_lo, R_up, B, cfg.opponent, _phi(cfg.epsilon),
                cfg.num_actions, cfg.num_goals, float(cfg.gamma),
                float(cfg.lr), int(cfg.target_sync), bool(cfg.mask_terminal),
                bool(greedy), random_start=bool(env_params.random_start),
                interpret=os.environ.get("MGT_FUSED_INTERPRET", "") == "1",
                compute_dtype=str(getattr(cfg, "compute_dtype", "float32")))
    groups = [tuple(out[k * 6:(k + 1) * 6]) for k in range(8)]
    met = np.asarray(out[51]).sum(axis=1)
    return apply_hdqn_chunk(carry, groups, out[48], out[49], out[50],
                            num_steps, met,
                            float(np.asarray(out[52])[0, 0]))


def coerce_hdqn_carry(carry):
    """Fix types after an orbax StandardRestore roundtrip (cf.
    ops.fused_trainer.coerce_carry); a resumed run continues exactly."""
    out = dict(carry)
    for k in ("R_lo", "R_up", "n", "warm_lo", "warm_up", "lo_learns",
              "steps", "env_steps"):
        out[k] = int(out[k])
    out["B"] = int(out.get("B", out["n"]))
    for k in ("episodes", "collisions", "wins", "sum_ep_reward", "last_loss"):
        out[k] = float(out[k])
    for k in ("u_p", "u_tp", "u_m", "u_v", "l_p", "l_tp", "l_m", "l_v",
              "opp_u", "opp_l"):
        out[k] = tuple(jnp.asarray(a, jnp.float32) for a in out[k])
    for k in ("state", "lo_ring", "up_ring"):
        out[k] = jnp.asarray(out[k], jnp.float32)
    return out
