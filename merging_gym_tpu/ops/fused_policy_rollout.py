"""Pallas TPU kernel: LEARNED-policy rollout as one kernel.

``ops.fused_rollout`` removed the per-step dispatch cost for random /
precomputed actions; this kernel goes the last mile and computes both
players' actions *inside* the kernel each step -- the 3-layer Q-net MLP
forward (weights VMEM-resident for the whole rollout) plus greedy or
Phi(eps)-greedy selection with the on-chip PRNG -- so a full
policy-driven evaluation (head-to-head, league play, level-k scoring)
runs with zero per-step dispatch and zero HBM action/observation
traffic.  Only per-step events (actions, rewards, done/winner/collision)
are streamed out.

Reference semantics reproduced in-kernel:
  * player 2 sees the half-swapped observation (scripts/main.py:199);
  * "epsilon-greedy" is the reference quirk ``randn() <= eps`` =>
    P(greedy) = Phi(eps) (scripts/main.py:105), realised as a uniform
    32-bit threshold test exactly as in ops.fused_actor;
  * ``params2=None`` is the constant-velocity L0 opponent
    (merging_env.py:152), i.e. the sentinel -1 action.

Layout notes: everything is env-last ([rows, N]); the MLP therefore runs
transposed -- q = W2t @ relu(W1t @ relu(W0t @ obs + b0) + b1) + b2 with
[H, n] activations, which keeps the env axis on the 128-lane dimension
throughout.  Post-step vehicle coordinates are cached in VMEM scratch so
each step pays the lane trig (4 transcendentals) once, not twice.

Randomised starts (``EnvParams.random_start``) are supported in-kernel:
reset candidates are drawn each step from the on-chip PRNG (Box-Muller
normals for player 1, uniforms for player 2, matching core.env.reset's
distributions) -- a static flag, zero cost when off.  TPU only, like
the Phi(eps)-greedy mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.geometry import lon2coord
from merging_gym_tpu.ops.fused_rollout import (_env_step_math,
                                               _random_reset_vals)

ENV_BLOCK = 4096  # sweep-tuned (docs/BENCHMARKS.md); [200, n] activations in VMEM


def _phi(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _mlp_t(obs, w0, b0, w1, b1, w2, b2, dtype=jnp.float32):
    """Transposed MLP on env-last activations: [10, n] -> [A, n].

    ``dtype``: compute dtype per the agents.dqn.compute_dtype contract --
    weights arrive STORED in this dtype (halving their VMEM footprint at
    bf16, which is what lets 4096-wide nets fit resident), activations
    are downcast to it between layers, the MXU accumulates in f32
    (preferred_element_type), and Q-values return f32 so greedy argmax
    and the Phi(eps) selection stay full-precision.  At f32 every cast
    is an identity.
    """
    c = lambda a: a.astype(dtype)
    h = c(jnp.dot(w0[:], c(obs), preferred_element_type=jnp.float32)) + b0[:]
    h = jnp.maximum(h, jnp.zeros((), dtype))
    h = c(jnp.dot(w1[:], h, preferred_element_type=jnp.float32)) + b1[:]
    h = jnp.maximum(h, jnp.zeros((), dtype))
    q = c(jnp.dot(w2[:], h, preferred_element_type=jnp.float32)) + b2[:]
    return q.astype(jnp.float32)


def _argmax0(q):
    """First-occurrence argmax over the (small, static) leading axis."""
    best_q, best_a = q[0], jnp.zeros_like(q[0], jnp.int32)
    for j in range(1, q.shape[0]):
        better = q[j] > best_q
        best_q = jnp.where(better, q[j], best_q)
        best_a = jnp.where(better, j, best_a)
    return best_a


def _select(q, mask_bits, rand_bits, *, greedy, p_greedy, num_actions):
    a = _argmax0(q)
    if greedy:
        return a
    threshold = jnp.uint32(min(int(p_greedy * 4294967296.0), 4294967295))
    rand = (rand_bits % jnp.uint32(num_actions)).astype(jnp.int32)
    return jnp.where(mask_bits < threshold, a, rand)


def _kernel(cfg_ref, rewards_ref,
            w10, b10, w11, b11, w12, b12,
            w20, b20, w21, b21, w22, b22,
            act_ref, rew_ref, done_ref, win_ref, col_ref,
            pos_s, vel_s, xy_s, win_s, t_s,
            *, n, p2_mlp, greedy, p_greedy, num_actions, random_start,
            compute_dtype="float32"):
    i_env = pl.program_id(0)
    i = pl.program_id(1)

    if (not greedy) or random_start:
        pltpu.prng_seed(cfg_ref[0] + i * pl.num_programs(0) + i_env)
    if not greedy:
        bits = pltpu.bitcast(pltpu.prng_random_bits((4, n)), jnp.uint32)
    else:
        bits = None

    if random_start:
        # Randomised starts via the shared Box-Muller reset helper
        # (ops.fused_rollout._random_reset_vals).
        pos_r, vel_r, xy_r = _random_reset_vals(n)
    else:
        pos_r = jnp.full((2, n), C.START_POINT, jnp.float32)
        vel_r = jnp.full((2, n), C.START_VEL, jnp.float32)

        # Reset coordinates: trig on compile-time constants, which Mosaic
        # folds.  (Materialising a [4, n] constant block per step instead
        # measured 1.7x SLOWER end-to-end -- keep the foldable form.)
        def start_coords():
            sp = jnp.full((n,), C.START_POINT, jnp.float32)
            x1, y1 = lon2coord(sp, +1.0)
            x2, y2 = lon2coord(sp, -1.0)
            return jnp.stack([x1, y1, x2, y2])

        xy_r = start_coords()

    @pl.when(i == 0)
    def _():
        pos_s[:] = pos_r
        vel_s[:] = vel_r
        win_s[:] = jnp.zeros((1, n), jnp.int32)
        t_s[:] = jnp.zeros((1, n), jnp.int32)
        xy_s[:] = xy_r

    # Pre-step observation of the CURRENT (post-auto-reset) state, the
    # obs the policy acts on (core.vector.rollout body semantics).
    pos, vel, xy = pos_s[:], vel_s[:], xy_s[:]
    x1, y1, x2, y2 = xy[0], xy[1], xy[2], xy[3]
    obs1 = jnp.stack([
        x2 - x1, y2 - y1, vel[1] - vel[0], C.END_POINT - pos[0], vel[0],
        x1 - x2, y1 - y2, vel[0] - vel[1], C.END_POINT - pos[1], vel[1],
    ])
    cdt = jnp.dtype(compute_dtype)
    sel = functools.partial(_select, greedy=greedy, p_greedy=p_greedy,
                            num_actions=num_actions)
    a1 = sel(_mlp_t(obs1, w10, b10, w11, b11, w12, b12, cdt),
             None if greedy else bits[0], None if greedy else bits[1])
    if p2_mlp:
        # Half-swapped view for player 2 (main.py:199).
        obs2 = jnp.concatenate([obs1[5:], obs1[:5]])
        a2 = sel(_mlp_t(obs2, w20, b20, w21, b21, w22, b22, cdt),
                 None if greedy else bits[2], None if greedy else bits[3])
    else:
        a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)  # L0 opponent
    actions = jnp.stack([a1, a2])

    rcfg = tuple(rewards_ref[k] for k in range(5))
    pos, vel, winner, tcnt, done, col, rewards, _, coords = _env_step_math(
        pos, vel, win_s[:][0], t_s[:][0], jnp.zeros((n,), bool),
        actions, rcfg, cfg_ref[1])

    act_ref[0] = actions
    rew_ref[0] = rewards
    done_ref[0] = done.astype(jnp.int32)[None, :]
    win_ref[0] = winner[None, :]
    col_ref[0] = col.astype(jnp.int32)[None, :]

    # Auto-reset, coords cache included.
    reset = done[None, :]
    pos_s[:] = jnp.where(reset, pos_r, pos)
    vel_s[:] = jnp.where(reset, vel_r, vel)
    win_s[:] = jnp.where(done, 0, winner)[None, :]
    t_s[:] = jnp.where(done, 0, tcnt)[None, :]
    xy_s[:] = jnp.where(reset, xy_r, coords)


@functools.partial(
    jax.jit, static_argnames=("num_steps", "num_envs", "p2_mlp", "greedy",
                              "p_greedy", "num_actions", "random_start",
                              "compute_dtype", "env_block"))
def _call(cfg, rewards_vec, weights, num_steps, num_envs, p2_mlp, greedy,
          p_greedy, num_actions, random_start, compute_dtype="float32",
          env_block=ENV_BLOCK):
    n = min(num_envs, env_block)
    assert num_envs % n == 0
    kernel = functools.partial(_kernel, n=n, p2_mlp=p2_mlp, greedy=greedy,
                               p_greedy=p_greedy, num_actions=num_actions,
                               random_start=random_start,
                               compute_dtype=compute_dtype)
    grid = (num_envs // n, num_steps)
    full = lambda shape: pl.BlockSpec(shape, lambda e, i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cfg [seed, max_steps]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rewards cfg [5]
        ] + [full(w.shape) for w in weights],
        out_specs=(
            pl.BlockSpec((1, 2, n), lambda e, i: (i, 0, e), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n), lambda e, i: (i, 0, e), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda e, i: (i, 0, e), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda e, i: (i, 0, e), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda e, i: (i, 0, e), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_steps, 2, num_envs), jnp.int32),
            jax.ShapeDtypeStruct((num_steps, 2, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((num_steps, 1, num_envs), jnp.int32),
            jax.ShapeDtypeStruct((num_steps, 1, num_envs), jnp.int32),
            jax.ShapeDtypeStruct((num_steps, 1, num_envs), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n), jnp.float32),
            pltpu.VMEM((2, n), jnp.float32),
            pltpu.VMEM((4, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.int32),
            pltpu.VMEM((1, n), jnp.int32),
        ],
        # Wide-net sweeps (benchmarks/fused_width_dtype.py) carry weight
        # sets far past the default scoped-VMEM budget; cap, don't reserve.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(cfg, rewards_vec, *weights)
    actions, rewards, done, winner, col = out
    return {
        "actions": actions,               # i32[T, 2, N]
        "rewards": rewards,               # f32[T, 2, N]
        "done": done[:, 0].astype(bool),  # bool[T, N]
        "winner": winner[:, 0],           # i32[T, N]
        "collision": col[:, 0].astype(bool),
    }


def _weight_args(params, dtype=jnp.float32):
    out = []
    for i in range(3):
        p = params[f"fc{i}"]
        out.append(jnp.asarray(p["w"], jnp.float32).astype(dtype).T)
        out.append(jnp.asarray(p["b"], jnp.float32).astype(dtype)[:, None])
    return out


def fused_policy_rollout(num_steps: int, num_envs: int, params1,
                         params2=None, *, greedy: bool = True,
                         epsilon: float = 0.7, seed: int = 0,
                         env_params=None, compute_dtype: str = "float32",
                         env_block: int | None = None):
    """Run T policy-driven env steps for N envs in one kernel.

    ``params1`` (and optionally ``params2``) are Q-net param dicts as
    produced by ``nn.mlp.qnet_init`` (10 -> 200 -> 100 -> A).
    ``params2=None`` plays the L0 constant-velocity opponent; pass
    ``params2=params1`` for self-play.  ``greedy=False`` applies the
    reference Phi(epsilon)-greedy quirk to BOTH players via the on-chip
    PRNG (TPU only; distribution-equivalent to the jnp actor).
    Returns [T, ...]-stacked event trajectories in env-last layout.

    ``compute_dtype="bfloat16"`` stores the weights bf16-resident (half
    the VMEM, so 4096-wide nets fit) and runs both players' MLPs in
    mixed precision (f32 MXU accumulation, f32 Q-values -- the
    agents.dqn.compute_dtype contract).  ``env_block`` overrides the
    per-grid-step env tile (default 4096); wide nets need a smaller
    block so [H1, block] activations stay inside the VMEM budget.
    """
    assert num_envs % 128 == 0, "num_envs must be a multiple of 128"
    if env_params is None:
        from merging_gym_tpu.core.env import EnvParams
        env_params = EnvParams()
    assert params1["fc0"]["w"].shape[0] == C.OBS_DIM

    rewards_vec = jnp.asarray([
        env_params.r_first, env_params.r_second, env_params.r_collision,
        env_params.vel_penalty, env_params.time_penalty], jnp.float32)
    cfg = jnp.asarray([seed, env_params.max_steps], jnp.int32)
    p2_mlp = params2 is not None
    cdt = jnp.dtype(compute_dtype)
    weights = _weight_args(params1, cdt) + _weight_args(
        params2 if p2_mlp else params1, cdt)  # placeholders ignored when L0
    num_actions = int(params1["fc2"]["w"].shape[1])
    if env_block is None:
        # Keep the dominant per-block buffers ([H1, n] activations + the
        # event outputs) inside the VMEM budget for wide nets.
        h1 = int(params1["fc0"]["w"].shape[1])
        env_block = ENV_BLOCK if h1 <= 1024 else (
            1024 if h1 <= 2048 else 512)
    env_block = min(num_envs, env_block)
    assert num_envs % env_block == 0, (
        f"num_envs above {env_block} must be a multiple of {env_block}")
    return _call(cfg, rewards_vec, tuple(weights), num_steps, num_envs,
                 p2_mlp, greedy, _phi(epsilon), num_actions,
                 bool(env_params.random_start), str(compute_dtype),
                 env_block)
