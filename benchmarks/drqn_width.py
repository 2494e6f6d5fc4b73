"""Recurrent-family width scaling: the fused DRQN trainer at LSTM
widths past the reference's 16 (main.py:52-66).

The roofline table (docs/BENCHMARKS.md) reads the fused DRQN's ~4% MXU
occupancy as "the price of recurrence at width 16, not a kernel
inefficiency -- wider LSTMs would raise MFU at near-flat wall time".
This script turns that sentence into a measurement, the recurrent
sibling of benchmarks/width_dtype.py's MLP study: one subprocess per
width drives ops.fused_drqn with the LSTM/fc3 trunk widened
(nn.lstm.drqn_init's ``hidden``), readback-fenced medians, and a
counted-FLOPs MFU column against the 90 TFLOP/s in-repo f32 matmul
ceiling (benchmarks/roofline.py).

Width is threaded by patching the module constants ``fused_drqn.HID``/
``ENV_ROWS`` before anything is built -- they are only read at trace
time, and every jitted call's cache key includes the param/env array
shapes, so a single width per process is exact.  The package default
stays reference-faithful.

Usage: python benchmarks/drqn_width.py [--envs N] [widths...]
(width >= 256 runs with the HBM-resident ring by default; override with
MGT_DRQN_WIDTH_HBM=0/1)
"""

import json
import os
import subprocess
import sys

WIDTHS = (16, 32, 64, 128)
NUM_ENVS = 1024
STEPS = 4096
LEARN_BATCH = 128
REPS = 5
MXU_CEIL_TFLOPS = 90.0  # in-repo measured f32 matmul ceiling (roofline.py)


def flops_per_env_step(h, n, B, L, num_actions=5, obs_dim=10):
    """Counted matmul FLOPs per env step: 2 actor cell forwards (both
    seats, n lanes) + one BPTT learn per step (B lanes, (L+1)-step
    forward x2 nets + backward ~2x forward of the eval net)."""
    cell = 2 * (obs_dim * 200 + 200 * h + h * 4 * h + h * 4 * h
                + h * h + h * num_actions)
    actor = 2 * n * cell
    fwd2 = 2 * (L + 1) * B * cell
    bwd = 2 * (L + 1) * B * cell  # dL/dx chain + param-grad contractions
    return (actor + fwd2 + bwd) / n


def child(width):
    global NUM_ENVS
    NUM_ENVS = int(os.environ.get("MGT_DRQN_WIDTH_ENVS", NUM_ENVS))
    import time

    import jax
    import jax.numpy as jnp

    import merging_gym_tpu.nn.lstm as NL
    import merging_gym_tpu.ops.fused_drqn as FD

    FD.HID = width
    FD.ENV_ROWS = 11 + 4 * width
    orig = NL.drqn_init
    NL.drqn_init = (lambda key, ni, na, dtype=jnp.float32:
                    orig(key, ni, na, dtype, hidden=width))

    from merging_gym_tpu.agents.drqn import DRQNConfig
    from merging_gym_tpu.core.env import EnvParams

    cfg = DRQNConfig(memory_capacity=4 * NUM_ENVS, opponent="selfplay",
                     seq_len=16, burn_in=4)
    ep = EnvParams()
    # HBM ring at width >= 256: frees the VMEM slab that put width 256
    # past the 110 MB scope limit (docs/BENCHMARKS.md OOM boundary).
    hbm_env = os.environ.get("MGT_DRQN_WIDTH_HBM", "auto")
    ring_hbm = (width >= 256) if hbm_env == "auto" else hbm_env == "1"
    c = FD.fused_drqn_init(jax.random.key(0), cfg, ep, NUM_ENVS,
                           learn_batch=LEARN_BATCH, ring_hbm=ring_hbm)
    t0 = time.time()
    c = FD.fused_drqn_chunk(cfg, ep, c, STEPS, seed=0)
    float(jnp.sum(c["p"][0]) + jnp.sum(c["env"]))
    compile_s = time.time() - t0
    rates = []
    for i in range(REPS):
        t0 = time.time()
        c = FD.fused_drqn_chunk(cfg, ep, c, STEPS, seed=i + 1)
        float(jnp.sum(c["p"][0]) + jnp.sum(c["env"]))
        rates.append(STEPS * NUM_ENVS / (time.time() - t0))
    rates.sort()
    rate = rates[len(rates) // 2]
    fpe = flops_per_env_step(width, NUM_ENVS, LEARN_BATCH, cfg.seq_len)
    tflops = rate * fpe / 1e12
    print(json.dumps({
        "width": width, "num_envs": NUM_ENVS, "learn_batch": LEARN_BATCH,
        "ring_hbm": int(ring_hbm),
        "chunk_steps": STEPS, "env_steps_per_sec": round(rate),
        "compile_s": round(compile_s, 1),
        "flops_per_env_step": round(fpe),
        "achieved_tflops": round(tflops, 2),
        "mxu_frac": round(tflops / MXU_CEIL_TFLOPS, 4),
        "last_loss": float(c["last_loss"]),
        "learns": int(c["learns"]),
    }), flush=True)


def main():
    global NUM_ENVS
    # Explicit flags (ADVICE r4: a positional magnitude-based num_envs
    # made `drqn_width.py 256` unable to request width 256 alone).
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=NUM_ENVS)
    ap.add_argument("widths", type=int, nargs="*", default=list(WIDTHS))
    a = ap.parse_args()
    NUM_ENVS = a.envs
    widths = a.widths or list(WIDTHS)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    env["MGT_DRQN_WIDTH_ENVS"] = str(NUM_ENVS)
    for w in widths:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(w)],
            env=env, capture_output=True, text=True, timeout=900)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            print(lines[-1], flush=True)
        else:
            print(json.dumps({"width": w, "error":
                              out.stderr.strip().splitlines()[-1][:300]
                              if out.stderr.strip() else "no output"}),
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
