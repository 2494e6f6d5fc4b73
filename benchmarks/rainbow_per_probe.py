"""Cost attribution for the fused Rainbow PER+3-step learn chain
(VERDICT r4 item 10: name what binds the 11.2% MXU roofline row).

Drives the ONE existing kernel (ops.fused_rainbow) under configs that
add the chain's components one at a time, all at the same env count and
learn batch, so successive rate gaps attribute the cost:

  uniform-1step          C51 learner chain alone (3 distributional
                         forwards + hand backprop) over a lane-window
                         batch;
  uniform-3step          + n-step return reconstruction from 3
                         consecutive slabs (elementwise, cheap);
  per-1step              + on-chip prioritised sampling: per_pick's
                         full-[R, n]-grid inverse-CDF, the B one-hot
                         gather contractions over all R slabs, and the
                         priority write-back scan;
  per-3step              + the x3 slab gathers of per_gather_slabs
                         (the headline PER+3-step row);
  greedy per-3step       - noise regeneration (no PRNG): the
                         reset_noise share under PER.

Reads are forced (metrics readback in fused_rainbow_chunk) so rates are
fence-honest.  Results feed the roofline "binding notes" paragraph in
docs/BENCHMARKS.md.

    python benchmarks/rainbow_per_probe.py [--quick]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPS = 3


def drive(label, cfg_kwargs, num_envs, steps, chunks, greedy=False):
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_rainbow as FR

    ep = EnvParams()
    cfg = RainbowConfig(memory_capacity=8 * num_envs, obs_scale=0.01,
                        opponent="selfplay", **cfg_kwargs)
    c = FR.fused_rainbow_init(jax.random.key(0), cfg, ep, num_envs,
                              learn_batch=128, ring_hbm=False)
    c = FR.fused_rainbow_chunk(cfg, ep, c, steps, seed=0, greedy=greedy)
    rates = []
    for s in range(1, chunks + 1):
        t0 = time.perf_counter()
        c = FR.fused_rainbow_chunk(cfg, ep, c, steps, seed=s, greedy=greedy)
        rates.append(num_envs * steps / (time.perf_counter() - t0))
    r = statistics.median(rates)
    print(f"{label:>18}: {r/1e6:6.1f} M env-steps/s "
          f"(loss {c['last_loss']:.3f})", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--envs", type=int, default=1024)
    args = ap.parse_args()
    steps = 1000 if args.quick else 4000
    chunks = 2 if args.quick else REPS

    rows = [
        ("uniform-1step", dict(per=False, n_step=1), False),
        ("uniform-3step", dict(per=False, n_step=3), False),
        ("per-1step", dict(per=True, n_step=1), False),
        ("per-3step", dict(per=True, n_step=3), False),
        ("greedy per-3step", dict(per=True, n_step=3), True),
    ]
    rates = {}
    for label, kw, greedy in rows:
        rates[label] = drive(label, kw, args.envs, steps, chunks,
                             greedy=greedy)

    u1, u3 = rates["uniform-1step"], rates["uniform-3step"]
    p1, p3 = rates["per-1step"], rates["per-3step"]
    g3 = rates["greedy per-3step"]
    t = lambda r: 1e9 / r  # ns per env-step

    print("\nattribution (ns/env-step at %d envs):" % args.envs)
    print(f"  C51 learner + actor+env floor : {t(u1):7.1f}")
    print(f"  n-step reconstruction         : {t(u3) - t(u1):+7.1f}")
    print(f"  PER pick+gather+update (1step): {t(p1) - t(u1):+7.1f}")
    print(f"  PER 3-slab gather extra       : {t(p3) - t(p1) - (t(u3) - t(u1)):+7.1f}")
    print(f"  noise regeneration (PER path) : {t(p3) - t(g3):+7.1f}")


if __name__ == "__main__":
    main()
