"""Cost attribution probe for the fused rollout kernel's per-step chain.

Measures the headline bench configuration (4096 envs, 16384-step launch,
unroll 8) with parts of the per-step math stubbed out -- NOT for
correctness, purely to attribute time between the transcendentals
(lon2coord's sin/cos), the collision rounding, and the rest -- so
optimization effort goes where the cycles are.  Results inform whether
an incremental-rotation lon2coord (replace per-step sin/cos with an
f32-exact small-angle rotation + periodic resync) is worth building.

    python benchmarks/rollout_cost_probe.py
"""

import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T, N, UNROLL, REPS = 16384, 4096, 8, 5


def measure(label):
    from merging_gym_tpu.ops import fused_rollout as FR

    def run(seed):
        return FR.fused_rollout(T, N, seed=seed, unroll=UNROLL)

    traj = run(0)
    float(jnp.sum(traj["rewards"]))
    rates = []
    for s in range(1, REPS + 1):
        t0 = time.perf_counter()
        traj = run(s)
        float(jnp.sum(traj["rewards"]))
        rates.append(T * N / (time.perf_counter() - t0))
    print(f"{label}: {statistics.median(rates)/1e9:.3f} B steps/s", flush=True)
    return statistics.median(rates)


def main():
    from merging_gym_tpu.ops import fused_rollout as FR

    base = measure("stock")

    # (b) transcendental share: lon2coord -> linear sham.
    orig_lon2coord = FR.lon2coord
    FR.lon2coord = lambda lon, side: (1000.0 - lon * 0.03, side * lon * 1e-3)
    FR._call.clear_cache()
    no_trig = measure("no-trig (sham lon2coord)")
    FR.lon2coord = orig_lon2coord

    # (c) rounding share: round_half_away -> identity.
    orig_round = FR.round_half_away
    FR.round_half_away = lambda v: v
    FR._call.clear_cache()
    no_round = measure("no-round (identity)")
    FR.round_half_away = orig_round

    # (d) both out.
    FR.lon2coord = lambda lon, side: (1000.0 - lon * 0.03, side * lon * 1e-3)
    FR.round_half_away = lambda v: v
    FR._call.clear_cache()
    neither = measure("no-trig + no-round")
    FR.lon2coord = orig_lon2coord
    FR.round_half_away = orig_round

    print(f"trig share ~= {(1 - base/no_trig)*100:.0f}% | "
          f"round share ~= {(1 - base/no_round)*100:.0f}% | "
          f"ceiling without both: {neither/1e9:.3f} B steps/s")


if __name__ == "__main__":
    main()
