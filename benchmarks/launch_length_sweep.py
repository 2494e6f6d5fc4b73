"""Steps-per-launch sweep for the three single-kernel Pallas paths.

Reproduces the docs/BENCHMARKS.md finding that per-launch dispatch on
this tunneled TPU runtime costs ~25 ms, so throughput is set almost
entirely by how many env steps one launch carries: the plain rollout
goes 72M -> 1.04-1.10B env-steps/s at 4,096 envs as the launch grows
512 -> 16,384 steps, the learned-policy rollout 56M -> 478M, and the
single-kernel DQN trainer 16.5M -> 110M (plus learn_batch=128 -> 160M).

All timings are forced-readback fenced (a host float() of a scalar sum
over the outputs per launch); each config reports the median of 5.

Usage: python benchmarks/launch_length_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _median_rate(run, work_per_launch, reps=5):
    run(0)  # compile + warm
    rates = []
    for seed in range(1, reps + 1):
        t0 = time.perf_counter()
        run(seed)
        rates.append(work_per_launch / (time.perf_counter() - t0))
    return statistics.median(rates)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "TPU required (in-kernel PRNG)"}))
        return

    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core import constants as C
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.nn.mlp import qnet_init
    from merging_gym_tpu.ops import fused_trainer as FT
    from merging_gym_tpu.ops.fused_policy_rollout import fused_policy_rollout
    from merging_gym_tpu.ops.fused_rollout import fused_rollout

    env_params = EnvParams()

    rollout_cfgs = ([(4096, 512), (4096, 4096)] if args.quick else
                    [(4096, 512), (4096, 2048), (4096, 4096),
                     (4096, 8192), (4096, 16384)])
    for n, t in rollout_cfgs:
        def run(seed, n=n, t=t):
            out = fused_rollout(t, n, seed=seed, env_params=env_params,
                                unroll=8)
            float(jnp.sum(out["rewards"]))
        r = _median_rate(run, n * t)
        print(json.dumps({"kernel": "fused_rollout", "num_envs": n,
                          "steps_per_launch": t,
                          "env_steps_per_sec": round(r, 0)}), flush=True)

    params = qnet_init(jax.random.key(0), C.OBS_DIM, C.NUM_ACTIONS)
    params = jax.tree.map(lambda w: (w - jnp.mean(w)) * 0.05, params)
    policy_cfgs = ([(4096, 512)] if args.quick else
                   [(4096, 512), (4096, 4096), (4096, 16384)])
    for n, t in policy_cfgs:
        def run(seed, n=n, t=t):
            out = fused_policy_rollout(t, n, params, params, greedy=True,
                                       seed=seed)
            float(jnp.sum(out["rewards"]))
        r = _median_rate(run, n * t)
        print(json.dumps({"kernel": "fused_policy_rollout", "num_envs": n,
                          "steps_per_launch": t,
                          "env_steps_per_sec": round(r, 0)}), flush=True)

    trainer_cfgs = ([(4096, 512, None)] if args.quick else
                    [(4096, 512, None), (4096, 8192, None),
                     (16384, 4096, None), (16384, 4096, 128)])
    for n, t, b in trainer_cfgs:
        cfg = D.DQNConfig(memory_capacity=4 * n, opponent=D.OPP_SELFPLAY)
        carry = FT.fused_dqn_init(jax.random.key(0), cfg, env_params, n,
                                  learn_batch=b)
        holder = {"c": carry}

        def run(seed, holder=holder, cfg=cfg, t=t):
            holder["c"] = FT.fused_dqn_chunk(cfg, env_params, holder["c"],
                                             t, seed=seed)
            float(jnp.sum(holder["c"]["p"][0]))
            float(jnp.sum(holder["c"]["env"]))
        r = _median_rate(run, n * t)
        print(json.dumps({"kernel": "fused_trainer", "num_envs": n,
                          "steps_per_launch": t, "learn_batch": b or n,
                          "env_steps_per_sec": round(r, 0),
                          "learns_per_sec": round(r / n, 1)}), flush=True)


if __name__ == "__main__":
    main()
