"""Fused-kernel mixed-precision width sweep (VERDICT r4 item 2).

benchmarks/width_dtype.py measures the XLA trainer across Q-net widths
and compute dtypes; this is the same study for the PALLAS kernels --
the single-kernel DQN trainer (ops.fused_trainer, compute_dtype now
threaded through the kernel) and the policy-in-kernel rollout
(ops.fused_policy_rollout, bf16-STORED weights) -- with counted-FLOP
MXU utilisation per row against the 197 TFLOP/s nominal bf16 peak for
BOTH dtype labels: on TPU, JAX's DEFAULT dot precision runs f32 matmuls
as bf16 multiplies with f32 accumulation (benchmarks/mxu_peak_probe.py:
HIGHEST-precision f32 is ~3x slower, DEFAULT ~= bf16), so 197e12 is the
one honest ceiling -- the 90 TFLOP/s "measured f32 ceiling" the roofline
used was an end-to-end XLA-trainer number that these Pallas kernels
exceed (weights stay VMEM-resident, no inter-op HBM traffic; the w4096
rollout sustains ~148 TFLOP/s counted, ~75% of nominal, verified by a
launch-length linearity + full-output-fence cross-check).

VMEM arithmetic for the trainer rows: the kernel holds FOUR f32 master
sets resident (params, target, both Adam moments; the opponent set is
unused outside frozen mode) plus learner activations.  At 4096x2048
the state alone is 4 x 33.8 MB = 135 MB -- past the 128 MB/core
physical VMEM, so that width cannot run all-resident in ANY compute
dtype and the row records the boundary with the XLA-path number as the
cross-reference (the policy ROLLOUT carries only weight sets, so its
4096x2048 rows run, bf16 halving them to 2 x 16.9 MB).

    python benchmarks/fused_width_dtype.py [--quick] [--rollout-only]

Timing is forced-readback per the docs/BENCHMARKS.md methodology.
Prints one JSON line per configuration.
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

# One ceiling for both dtype labels: DEFAULT-precision f32 dots already
# run bf16 multiplies on TPU (see module docstring / mxu_peak_probe.py).
MXU_PEAK = 197e12

WIDTHS = [(200, 100), (1024, 512), (2048, 1024), (4096, 2048)]
DTYPES = ["float32", "bfloat16"]


def mlp_flops_per_lane(h1, h2, a=5, inp=10):
    return 2.0 * (inp * h1 + h1 * h2 + h2 * a)


def state_mb(h1, h2, a=5, inp=10, sets=4):
    params = inp * h1 + h1 + h1 * h2 + h2 + h2 * a + a
    return sets * params * 4 / 1e6


def bench_trainer(hidden, dtype, num_envs, learn_batch, steps, reps):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_trainer as FT

    h1, h2 = hidden
    cfg = D.DQNConfig(memory_capacity=2 * num_envs, hidden=hidden,
                      opponent=D.OPP_SELFPLAY, compute_dtype=dtype)
    ep = EnvParams()
    carry = FT.fused_dqn_init(jax.random.key(0), cfg, ep, num_envs,
                              learn_batch=learn_batch)
    carry["p"] = tuple((a - jnp.mean(a)) * 0.05 for a in carry["p"])
    carry["tp"] = carry["p"]
    carry["opp"] = carry["p"]

    def fence(c):
        return float(jnp.sum(c["p"][0][0])) + c["env_steps"]

    carry = FT.fused_dqn_chunk(cfg, ep, carry, steps, seed=1)
    fence(carry)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        carry = FT.fused_dqn_chunk(cfg, ep, carry, steps, seed=2 + r)
        fence(carry)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    rate = num_envs * steps / dt
    per_lane = mlp_flops_per_lane(h1, h2)
    # selfplay actor: 2 forwards over n; learner: 3 forwards + ~2x-fwd
    # backward over B lanes, every step once the ring is warm.
    flops_step = per_lane * (2 * num_envs + 5 * learn_batch)
    mxu = flops_step * (steps / dt) / MXU_PEAK
    return {
        "metric": f"fused-dqn-train-w{h1}x{h2}-{dtype}",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "learns_per_s": round(steps / dt, 1),
        "learn_batch": learn_batch,
        "num_envs": num_envs,
        "mxu_pct": round(100 * mxu, 1),
        "tflops": round(flops_step * (steps / dt) / 1e12, 1),
        "state_mb_f32_4sets": round(state_mb(h1, h2), 1),
        "loss_finite": bool(jnp.isfinite(jnp.asarray(carry["last_loss"]))),
    }


def bench_rollout(hidden, dtype, num_envs, steps, reps):
    from merging_gym_tpu.nn.mlp import qnet_init
    from merging_gym_tpu.ops.fused_policy_rollout import fused_policy_rollout

    h1, h2 = hidden
    params = qnet_init(jax.random.key(0), 10, 5, hidden)
    params = jax.tree.map(lambda w: (w - jnp.mean(w)) * 0.05, params)

    def run(seed):
        out = fused_policy_rollout(steps, num_envs, params, params,
                                   greedy=True, seed=seed,
                                   compute_dtype=dtype)
        return float(jnp.sum(out["rewards"][-1]))

    run(0)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        run(1 + r)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    rate = num_envs * steps / dt
    flops_step = mlp_flops_per_lane(h1, h2) * 2 * num_envs  # both players
    return {
        "metric": f"fused-policy-rollout-w{h1}x{h2}-{dtype}",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "num_envs": num_envs,
        "mxu_pct": round(100 * flops_step * (steps / dt) / MXU_PEAK, 1),
        "tflops": round(flops_step * (steps / dt) / 1e12, 1),
        "weights_mb": round(2 * state_mb(h1, h2, sets=1)
                            * (0.5 if dtype == "bfloat16" else 1.0), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rollout-only", action="store_true")
    ap.add_argument("--trainer-only", action="store_true")
    args = ap.parse_args()
    q = args.quick
    # Long launches amortise the ~25 ms tunnel dispatch (CLAUDE.md);
    # 2048 steps puts dispatch <2% at every width here.
    steps = 50 if q else 2048
    reps = 2 if q else 3

    for (h1, h2) in (WIDTHS[:2] if q else WIDTHS):
        for dtype in DTYPES:
            if not args.trainer_only:
                n_roll = 4096 if h1 <= 1024 else (2048 if h1 <= 2048 else 1024)
                try:
                    print(json.dumps(bench_rollout((h1, h2), dtype, n_roll,
                                                   steps, reps)), flush=True)
                except Exception as e:  # noqa: BLE001 -- record the boundary
                    print(json.dumps({
                        "metric": f"fused-policy-rollout-w{h1}x{h2}-{dtype}",
                        "error": repr(e)[:200]}), flush=True)
            if args.rollout_only:
                continue
            # Trainer: shrink envs/batch as width grows -- the actor's
            # [H1, n] activations and the learner slabs both feed the
            # register-spill scoped VMEM (w2048 at n=4096 spills 56 MB
            # and exceeds the 128 MB core even though the master state
            # is only 42 MB).
            n_tr = 4096 if h1 <= 1024 else 1024
            B = n_tr if h1 <= 200 else (1024 if h1 <= 1024 else 512)
            if state_mb(h1, h2) > 120.0:
                print(json.dumps({
                    "metric": f"fused-dqn-train-w{h1}x{h2}-{dtype}",
                    "skipped": "state exceeds physical VMEM",
                    "state_mb_f32_4sets": round(state_mb(h1, h2), 1),
                    "note": "4 f32 master sets cannot be chip-resident; "
                            "use the XLA path (benchmarks/width_dtype.py) "
                            "at this width"}), flush=True)
                continue
            # Learner activations/grad slabs scale with B; on a VMEM
            # compile failure retry with a smaller learn batch and record
            # which B ran.
            last_err = None
            while B >= 256:
                try:
                    print(json.dumps(bench_trainer((h1, h2), dtype, n_tr, B,
                                                   steps, reps)), flush=True)
                    break
                except Exception as e:  # noqa: BLE001 -- record boundary
                    last_err = e
                    B //= 2
            else:
                print(json.dumps({
                    "metric": f"fused-dqn-train-w{h1}x{h2}-{dtype}",
                    "error": repr(last_err)[:200]}), flush=True)


if __name__ == "__main__":
    main()
