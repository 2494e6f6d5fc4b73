"""Calibrate the chip's REAL matmul ceilings for the roofline/width docs.

benchmarks/roofline.py uses 90 TFLOP/s as the "measured f32 ceiling" --
derived from the widest XLA trainer, not from a pure matmul.  The
round-5 fused width sweep then posted f32 rows at 111-127% of that
"ceiling", which exposes what the 90 number really was: on TPU, JAX's
DEFAULT dot precision runs float32 matmuls as bf16 multiplies with f32
accumulation, so a "f32" kernel already gets (most of) the bf16 MXU
rate, and the 90 TFLOP/s was an end-to-end trainer number, not a peak.

This probe measures the actual ceilings with pure dot chains, fenced by
forced readback (docs/BENCHMARKS.md methodology):

  * f32 operands, DEFAULT precision  (what every kernel in this repo
    labelled "f32" actually runs);
  * f32 operands, HIGHEST precision  (true f32: 6-pass bf16 emulation);
  * bf16 operands, f32 accumulation  (compute_dtype="bfloat16");

at a large square shape (pure MXU) and at the fused-kernel learner
shapes.  Prints one JSON line per configuration.

    python benchmarks/mxu_peak_probe.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def bench(m, k, n, dtype, precision, chain=8, reps=5):
    a = jax.random.normal(jax.random.key(0), (m, k), jnp.float32).astype(dtype)
    b = jax.random.normal(jax.random.key(1), (k, n), jnp.float32).astype(dtype)

    @jax.jit
    def run(a, b):
        # Chain of dependent dots so the MXU stays busy for >> dispatch
        # time; the [m, n] @ [n, n]-style reuse keeps shapes static.
        acc = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=jnp.float32)
        for _ in range(chain - 1):
            acc = lax.dot_general(acc.astype(dtype), b.T.astype(dtype)
                                  if n == k else b,
                                  (((1,), (0,)), ((), ())),
                                  precision=precision,
                                  preferred_element_type=jnp.float32)
        return jnp.sum(acc)

    if n != k:  # dependent chain needs n == k; fall back to repeat-sum
        @jax.jit
        def run(a, b):  # noqa: F811
            acc = 0.0
            for i in range(chain):
                c = lax.dot_general(a + i, b, (((1,), (0,)), ((), ())),
                                    precision=precision,
                                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(c)
            return acc

    float(run(a, b))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(a, b))  # forced readback fence
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    flops = 2.0 * m * k * n * chain
    return flops / dt


def main():
    shapes = [
        ("square8k", 8192, 8192, 8192, 4),
        ("learner-w1024", 1024, 512, 4096, 64),
        ("learner-w2048", 2048, 1024, 4096, 64),
    ]
    modes = [
        ("f32-default", jnp.float32, lax.Precision.DEFAULT),
        ("f32-highest", jnp.float32, lax.Precision.HIGHEST),
        ("bf16", jnp.bfloat16, lax.Precision.DEFAULT),
    ]
    for name, m, k, n, chain in shapes:
        for mode, dtype, prec in modes:
            try:
                r = bench(m, k, n, dtype, prec, chain=chain)
                print(json.dumps({
                    "metric": f"mxu-peak-{name}-{mode}",
                    "value": round(r / 1e12, 1), "unit": "TFLOP/s",
                    "shape": [m, k, n], "chain": chain}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"metric": f"mxu-peak-{name}-{mode}",
                                  "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
