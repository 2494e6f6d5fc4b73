"""Mixed-precision scaling study: trainer throughput vs Q-net width/dtype.

The reference's net is 10-200-100-5 (main.py:30-47) -- far too small to
light up the MXU: at that width the trainer is bound by this runtime's
per-iteration floor, not FLOPs.  Production-scale deployments want wider
nets; this study measures the fused actor+replay+learner trainer
(agents.dqn.train_chunk, self-play so BOTH players' forwards run) across
hidden widths, in float32 vs bfloat16 compute (DQNConfig.compute_dtype:
forwards in bf16, f32 master params / grads / Adam / MXU accumulation).

Timing is forced-readback (see docs/BENCHMARKS.md methodology).
Prints one JSON line per configuration.

    python benchmarks/width_dtype.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WIDTHS = [(200, 100), (1024, 512), (2048, 1024), (4096, 2048)]
DTYPES = ["float32", "bfloat16"]


def bench_one(hidden, dtype, num_envs, steps, reps):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams

    cfg = D.DQNConfig(memory_capacity=2 * num_envs, batch_size=num_envs,
                      hidden=hidden, opponent=D.OPP_SELFPLAY,
                      compute_dtype=dtype)
    env_params = EnvParams()
    carry = D.train_init(jax.random.key(0), cfg, env_params, num_envs)

    def fence(c):
        # Force a host readback derived from the learner output.
        return float(jnp.sum(c.dqn.params["fc0"]["w"][0])) + float(c.metrics.env_steps)

    carry = D.train_chunk(cfg, env_params, carry, steps)  # compile + warm
    fence(carry)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = D.train_chunk(cfg, env_params, carry, steps)
        fence(carry)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    n_params = sum(x.size for x in jax.tree.leaves(carry.dqn.params))
    return {
        "metric": f"dqn-train-w{hidden[0]}x{hidden[1]}-{dtype}",
        "value": round(num_envs * steps / dt, 1),
        "unit": "env-steps/s",
        "learns_per_s": round(steps / dt, 1),
        "params": n_params,
        "loss_finite": bool(jnp.isfinite(carry.dqn.last_loss)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--num-envs", type=int, default=None)
    args = ap.parse_args()
    q = args.quick
    num_envs = args.num_envs or (256 if q else 4096)
    steps = 20 if q else 200
    reps = 2 if q else 5
    for hidden in (WIDTHS[:2] if q else WIDTHS):
        for dtype in DTYPES:
            r = bench_one(tuple(hidden), dtype, num_envs, steps, reps)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
