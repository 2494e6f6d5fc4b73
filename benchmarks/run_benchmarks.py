"""Benchmark suite: one JSON line per benchmark (bench.py runs only the
headline).  All timings use forced host readback of a scalar derived from
the computation's outputs (block_until_ready alone proved unreliable on
tunneled runtimes -- the device can run ahead of the clock).

Covers the BASELINE.json configs that fit on one chip:

  rollout-<n>      vectorized env throughput at n envs, random policies
  fused-rollout-<n>        single-kernel Pallas rollout (random policy)
  fused-policy-rollout-<n> single-kernel rollout with the Q-net MLP
                           policies computed in-kernel (eval path)
  dqn-train        fused actor+replay+learner throughput (config 3)
  dqn-train-fused-<n>      the same trainer as ONE Pallas kernel
                           (ops.fused_trainer; learner batch = n)
  hdqn-train       hierarchical two-net trainer (config 4, 1-chip slice)
  hdqn-train-fused-<n>     the same as ONE Pallas kernel (ops.fused_hdqn)
  rainbow-train    Rainbow with PER + 3-step (config 5, 1-chip slice)
  rainbow-train-fused-<n>  reference-config Rainbow as ONE Pallas kernel
                           (ops.fused_rainbow; uniform ring, 1-step)
  native-serial    C++ host core serial env-steps/s (reference-analogous path)
  oracle-serial    pure-Python float64 oracle (what the reference's stack costs
                   with the QP/GEOS replaced by closed forms)

Usage: python benchmarks/run_benchmarks.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runnable as `python benchmarks/run_benchmarks.py` without installing:
# python puts the script's dir (benchmarks/) on sys.path, not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _report(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 1),
                      "unit": unit, **extra}), flush=True)


def bench_rollout(num_envs, steps, chunks, collect="full"):
    from merging_gym_tpu.core import constants as C
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.core.vector import reset_batch, rollout

    params = EnvParams()
    state = reset_batch(params, jax.random.key(0), num_envs)

    def policy(ps, obs, key):
        return ps, jax.random.randint(key, (obs.shape[0], 2), -1, C.NUM_ACTIONS)

    def sync(state, traj):
        if collect == "full":
            return float(jnp.sum(traj.rewards))
        if collect == "rewards":
            return float(jnp.sum(traj[0]))
        return float(jnp.sum(state.pos))

    run = jax.jit(lambda s, k: rollout(params, s, policy, None, k, steps,
                                       collect=collect))
    (state, _), traj = run(state, jax.random.key(1))
    sync(state, traj)
    t0 = time.perf_counter()
    for i in range(chunks):
        (state, _), traj = run(state, jax.random.key(2 + i))
        sync(state, traj)
    dt = time.perf_counter() - t0
    _report(f"rollout-{num_envs}-{collect}", num_envs * steps * chunks / dt,
            "env-steps/s")


def bench_fused_rollout(num_envs, steps, chunks, unroll=1):
    from merging_gym_tpu.ops.fused_rollout import fused_rollout

    out = fused_rollout(steps, num_envs, seed=0, unroll=unroll)
    float(jnp.sum(out["rewards"]))
    t0 = time.perf_counter()
    for i in range(chunks):
        out = fused_rollout(steps, num_envs, seed=1 + i, unroll=unroll)
        float(jnp.sum(out["rewards"]))
    dt = time.perf_counter() - t0
    _report(f"fused-rollout-{num_envs}", num_envs * steps * chunks / dt,
            "env-steps/s")


def bench_fused_policy_rollout(num_envs, steps, chunks, selfplay, greedy):
    from merging_gym_tpu.core import constants as C
    from merging_gym_tpu.nn.mlp import qnet_init
    from merging_gym_tpu.ops.fused_policy_rollout import fused_policy_rollout

    params = qnet_init(jax.random.key(0), C.OBS_DIM, C.NUM_ACTIONS)
    params = jax.tree.map(lambda w: (w - jnp.mean(w)) * 0.05, params)
    p2 = params if selfplay else None

    def run(seed):
        out = fused_policy_rollout(steps, num_envs, params, p2,
                                   greedy=greedy, seed=seed)
        return float(jnp.sum(out["rewards"]))

    run(0)
    t0 = time.perf_counter()
    for i in range(chunks):
        run(1 + i)
    dt = time.perf_counter() - t0
    tag = "selfplay" if selfplay else "l0"
    tag += "-greedy" if greedy else "-eps"
    _report(f"fused-policy-rollout-{num_envs}-{tag}",
            num_envs * steps * chunks / dt, "env-steps/s")


def bench_dqn(num_envs, steps, chunks):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams

    cfg = D.DQNConfig(memory_capacity=4 * num_envs, opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = D.train_init(jax.random.key(0), cfg, env_params, num_envs)
    carry = D.train_chunk(cfg, env_params, carry, steps)
    float(jnp.sum(carry.dqn.params["fc2"]["b"]))
    t0 = time.perf_counter()
    for _ in range(chunks):
        carry = D.train_chunk(cfg, env_params, carry, steps)
        float(jnp.sum(carry.dqn.params["fc2"]["b"]))
    dt = time.perf_counter() - t0
    _report("dqn-train", num_envs * steps * chunks / dt, "env-steps/s",
            learns_per_sec=round(steps * chunks / dt, 1))


def bench_dqn_fused(num_envs, steps, chunks, learn_batch=None,
                    hidden=(200, 100), compute_dtype="float32"):
    """Single-kernel DQN trainer (ops.fused_trainer): actor + env + ring
    replay + Double-DQN learner + Adam as ONE pallas_call per chunk.
    Learner batch = num_envs (one whole-slab sample per step) unless
    ``learn_batch`` (a random disjoint lane window of that width).
    ``hidden``/``compute_dtype``: production-width / mixed-precision
    variants (the full sweep lives in benchmarks/fused_width_dtype.py)."""
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_trainer as FT

    cfg = D.DQNConfig(memory_capacity=4 * num_envs, opponent=D.OPP_SELFPLAY,
                      hidden=tuple(hidden), compute_dtype=compute_dtype)
    env_params = EnvParams()
    carry = FT.fused_dqn_init(jax.random.key(0), cfg, env_params, num_envs,
                              learn_batch=learn_batch)
    carry = FT.fused_dqn_chunk(cfg, env_params, carry, steps, seed=0)
    float(jnp.sum(carry["p"][0]))
    t0 = time.perf_counter()
    for k in range(chunks):
        carry = FT.fused_dqn_chunk(cfg, env_params, carry, steps, seed=1 + k)
        float(jnp.sum(carry["p"][0])); float(jnp.sum(carry["env"]))
    dt = time.perf_counter() - t0
    tag = f"-b{learn_batch}" if learn_batch else ""
    if hidden != (200, 100):
        tag += f"-w{hidden[0]}x{hidden[1]}"
    if compute_dtype != "float32":
        tag += "-bf16"
    _report(f"dqn-train-fused-{num_envs}{tag}",
            num_envs * steps * chunks / dt,
            "env-steps/s", learns_per_sec=round(steps * chunks / dt, 1))


def bench_hdqn_fused(num_envs, steps, chunks, learn_batch=None):
    """Single-kernel hierarchical trainer (ops.fused_hdqn)."""
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents.hdqn import HDQNConfig
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_hdqn as FH

    cfg = HDQNConfig(memory_capacity=4 * num_envs,
                     goal_memory_capacity=2 * num_envs,
                     opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = FH.fused_hdqn_init(jax.random.key(0), cfg, env_params, num_envs,
                               learn_batch=learn_batch)
    carry = FH.fused_hdqn_chunk(cfg, env_params, carry, steps, seed=0)
    float(jnp.sum(carry["l_p"][0]))
    t0 = time.perf_counter()
    for k in range(chunks):
        carry = FH.fused_hdqn_chunk(cfg, env_params, carry, steps,
                                    seed=(1 + k) * steps)
        float(jnp.sum(carry["l_p"][0])); float(jnp.sum(carry["state"]))
    dt = time.perf_counter() - t0
    tag = f"-b{learn_batch}" if learn_batch else ""
    _report(f"hdqn-train-fused-{num_envs}{tag}",
            num_envs * steps * chunks / dt, "env-steps/s")


def bench_rainbow_fused(num_envs, steps, chunks, learn_batch=None,
                        per=False, n_step=1):
    """Single-kernel Rainbow trainer (ops.fused_rainbow); ``per``/
    ``n_step`` exercise the on-chip prioritised sampling + sample-time
    n-step reconstruction paths (round 3)."""
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_rainbow as FRB

    cfg = RainbowConfig(memory_capacity=8 * num_envs, obs_scale=0.01,
                        opponent=D.OPP_SELFPLAY, per=per, n_step=n_step,
                        batch_size=learn_batch or 128)
    env_params = EnvParams()
    carry = FRB.fused_rainbow_init(jax.random.key(0), cfg, env_params,
                                   num_envs, learn_batch=learn_batch)
    carry = FRB.fused_rainbow_chunk(cfg, env_params, carry, steps, seed=0)
    float(jnp.sum(carry["p"][0]))
    t0 = time.perf_counter()
    for k in range(chunks):
        carry = FRB.fused_rainbow_chunk(cfg, env_params, carry, steps,
                                        seed=(1 + k) * steps)
        float(jnp.sum(carry["p"][0])); float(jnp.sum(carry["env"]))
    dt = time.perf_counter() - t0
    tag = f"-b{learn_batch}" if learn_batch else ""
    if per:
        tag += f"-per{n_step}step"
    elif n_step != 1:
        tag += f"-{n_step}step"
    _report(f"rainbow-train-fused-{num_envs}{tag}",
            num_envs * steps * chunks / dt, "env-steps/s")


def bench_hdqn(num_envs, steps, chunks):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents import hdqn as H
    from merging_gym_tpu.core.env import EnvParams

    cfg = H.HDQNConfig(memory_capacity=4 * num_envs, opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = H.hdqn_init(jax.random.key(0), cfg, env_params, num_envs)
    carry = H.hdqn_train_chunk(cfg, env_params, carry, steps)
    float(jnp.sum(carry.lower.params["fc2"]["b"]))
    t0 = time.perf_counter()
    for _ in range(chunks):
        carry = H.hdqn_train_chunk(cfg, env_params, carry, steps)
        float(jnp.sum(carry.lower.params["fc2"]["b"]))
    dt = time.perf_counter() - t0
    _report("hdqn-train", num_envs * steps * chunks / dt, "env-steps/s")


def bench_drqn(num_envs, steps, chunks):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents import drqn as DR
    from merging_gym_tpu.core.env import EnvParams

    cfg = DR.DRQNConfig(memory_capacity=max(512, num_envs),
                        opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = DR.drqn_train_init(jax.random.key(0), cfg, env_params, num_envs)
    carry = DR.drqn_train_chunk(cfg, env_params, carry, steps)
    float(jnp.sum(carry.params["fc4"]["b"]))
    t0 = time.perf_counter()
    for _ in range(chunks):
        carry = DR.drqn_train_chunk(cfg, env_params, carry, steps)
        float(jnp.sum(carry.params["fc4"]["b"]))
    dt = time.perf_counter() - t0
    _report("drqn-train", num_envs * steps * chunks / dt, "env-steps/s")


def bench_drqn_fused(num_envs, steps, chunks, learn_batch=None):
    """Single-kernel DRQN trainer (ops.fused_drqn): recurrent actor +
    env + sequence-window ring + truncated-BPTT learner + Adam as ONE
    pallas_call per chunk (round 4)."""
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents.drqn import DRQNConfig
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_drqn as FD

    cfg = DRQNConfig(memory_capacity=4 * num_envs, opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = FD.fused_drqn_init(jax.random.key(0), cfg, env_params, num_envs,
                               learn_batch=learn_batch)
    carry = FD.fused_drqn_chunk(cfg, env_params, carry, steps, seed=0)
    float(jnp.sum(carry["p"][0]))
    t0 = time.perf_counter()
    for k in range(chunks):
        carry = FD.fused_drqn_chunk(cfg, env_params, carry, steps,
                                    seed=1 + k)
        float(jnp.sum(carry["p"][0])); float(jnp.sum(carry["env"]))
    dt = time.perf_counter() - t0
    tag = f"-b{learn_batch}" if learn_batch else ""
    _report(f"drqn-train-fused-{num_envs}{tag}",
            num_envs * steps * chunks / dt,
            "env-steps/s", learns_per_sec=round(steps * chunks / dt, 1))


def bench_rainbow(num_envs, steps, chunks):
    from merging_gym_tpu.agents import rainbow as R
    from merging_gym_tpu.core.env import EnvParams

    cfg = R.RainbowConfig(memory_capacity=4 * num_envs, per=True, n_step=3)
    env_params = EnvParams()
    carry = R.rainbow_train_init(jax.random.key(0), cfg, env_params, num_envs)
    carry = R.rainbow_train_chunk(cfg, env_params, carry, steps)
    float(jnp.sum(carry.params["linear1"]["b"]))
    t0 = time.perf_counter()
    for _ in range(chunks):
        carry = R.rainbow_train_chunk(cfg, env_params, carry, steps)
        float(jnp.sum(carry.params["linear1"]["b"]))
    dt = time.perf_counter() - t0
    _report("rainbow-train", num_envs * steps * chunks / dt, "env-steps/s")


def bench_native_serial(steps):
    from merging_gym_tpu.core import native

    if not native.available():
        return
    rng = np.random.default_rng(0)
    a1 = rng.integers(0, 5, size=steps).astype(np.int32)
    a2 = rng.integers(0, 5, size=steps).astype(np.int32)
    env = native.NativeMergeEnv(1)
    done_total = 0
    t0 = time.perf_counter()
    remaining = steps
    while remaining > 0:
        env.reset()
        n, _, _ = env.rollout(a1[:remaining], a2[:remaining])
        remaining -= n
        done_total += n
    dt = time.perf_counter() - t0
    _report("native-serial", done_total / dt, "env-steps/s")


def bench_oracle_serial(steps):
    from merging_gym_tpu.core.oracle import OracleMergeEnv

    rng = np.random.default_rng(0)
    env = OracleMergeEnv()
    t0 = time.perf_counter()
    done_count = 0
    for _ in range(steps):
        _, _, done, _ = env.step(int(rng.integers(0, 5)), int(rng.integers(0, 5)))
        done_count += 1
        if done:
            env.reset()
    dt = time.perf_counter() - t0
    _report("oracle-serial", done_count / dt, "env-steps/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    q = args.quick

    for n in ([1024] if q else [256, 1024, 4096, 16384]):
        bench_rollout(n, 256 if q else 1024, 2 if q else 4)
    for collect in ("rewards", "none"):
        bench_rollout(1024 if q else 4096, 256 if q else 1024,
                      2 if q else 4, collect)
    if jax.default_backend() == "tpu":  # in-kernel PRNG needs real hardware
        # Launch lengths chosen so one launch carries enough env steps to
        # amortise the ~25 ms per-launch dispatch of the tunneled runtime
        # (docs/BENCHMARKS.md steps-per-launch sweep), capped by the HBM
        # footprint of the trajectory outputs at large env counts.
        for n, t in ([(4096, 1024)] if q
                     else [(4096, 16384), (65536, 1024), (262144, 256)]):
            bench_fused_rollout(n, t, 2 if q else 3, unroll=8)
        for n, t in ([(4096, 1024)] if q
                     else [(4096, 16384), (65536, 2048), (262144, 512)]):
            bench_fused_policy_rollout(n, t, 2 if q else 3,
                                       selfplay=True, greedy=True)
        if not q:
            bench_fused_policy_rollout(65536, 2048, 3, selfplay=True,
                                       greedy=False)
            bench_fused_policy_rollout(65536, 2048, 3, selfplay=False,
                                       greedy=True)
    bench_dqn(256 if q else 1024, 100 if q else 200, 2 if q else 5)
    if jax.default_backend() == "tpu":  # in-kernel PRNG needs real hardware
        for n, t in ([(4096, 512)] if q
                     else [(4096, 8192), (16384, 4096)]):
            bench_dqn_fused(n, t, 2 if q else 5)
        # Production-width mixed-precision row (full sweep:
        # benchmarks/fused_width_dtype.py).
        bench_dqn_fused(4096 if not q else 1024, 512 if q else 2048,
                        2 if q else 3, learn_batch=1024 if not q else 512,
                        hidden=(1024, 512), compute_dtype="bfloat16")
        if not q:
            bench_dqn_fused(16384, 4096, 5, learn_batch=128)
    bench_hdqn(256 if q else 1024, 100 if q else 200, 2 if q else 5)
    bench_drqn(256 if q else 1024, 100 if q else 200, 2 if q else 5)
    if jax.default_backend() == "tpu":  # in-kernel PRNG needs real hardware
        bench_drqn_fused(1024, 512 if q else 4096, 2 if q else 5,
                         learn_batch=128)
        if not q:
            bench_drqn_fused(4096, 4096, 3, learn_batch=128)
            bench_drqn_fused(1024, 4096, 3)
    bench_rainbow(256 if q else 1024, 100 if q else 200, 2 if q else 5)
    if jax.default_backend() == "tpu":  # in-kernel PRNG needs real hardware
        bench_hdqn_fused(1024, 512 if q else 2000, 2 if q else 5)
        bench_rainbow_fused(1024, 512 if q else 2000, 2 if q else 5)
        bench_rainbow_fused(1024, 512 if q else 2000, 2 if q else 5,
                            learn_batch=128, per=True, n_step=3)
        if not q:
            bench_hdqn_fused(4096, 8192, 3, learn_batch=128)
            bench_rainbow_fused(4096, 8192, 3, learn_batch=128)
            bench_rainbow_fused(4096, 4096, 3, learn_batch=128,
                                per=True, n_step=3)
            bench_rainbow_fused(4096, 8192, 3, learn_batch=128, n_step=3)
    bench_native_serial(20000 if q else 200000)
    bench_oracle_serial(5000 if q else 20000)


if __name__ == "__main__":
    main()
