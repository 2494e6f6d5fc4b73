"""Fused-trainer batch-composition ablation (VERDICT r1 item 6).

The fused kernel's learn batch is one slab (or lane window) of a single
uniformly chosen ring round, so a batch shares a common age -- a
correlation the reference's 128 i.i.d. draws (main.py:130) do not have.
``learn_rounds=K`` composes each batch from K independent
(round, lane-window) draws instead.  This script measures the
learning-quality cost/benefit at equal learn counts on one chip:

  * xla_iid_128:    agents.dqn.train_chunk, batch 128 i.i.d. over slots
                    (the reference's sampling semantics, vectorized)
  * fused_slab:     fused kernel, learn_batch=512, K=1 (common age +
                    common lane window)
  * fused_mixed_k4: fused kernel, learn_batch=512, K=4 (age-mixed:
                    4 x 128-lane independent draws)
  * fused_full:     fused kernel, learn_batch=num_envs (the r1 default)

All runs: 1024 envs, 4096-slot ring, L0 opponent, default reference
hypers, same per-step learn cadence; per-window rates over thirds of
training.  Writes docs/parity/batch_decorrelation.json; the summary
table lives in docs/BENCHMARKS.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "parity", "batch_decorrelation.json")


def _windows(history):
    """Per-third rates from cumulative counters."""
    out = []
    prev = {"episodes": 0, "collisions": 0, "wins": 0, "sum_ep_reward": 0.0}
    for h in history:
        d = {k: h[k] - prev[k] for k in prev}
        eps = max(d["episodes"], 1)
        out.append({"episodes": d["episodes"],
                    "collision_rate": d["collisions"] / eps,
                    "win_rate": d["wins"] / eps,
                    "reward": d["sum_ep_reward"] / eps,
                    "loss": h["loss"]})
        prev = {k: h[k] for k in prev}
    return out


def run_fused(seed, num_envs, steps, learn_batch, learn_rounds):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_trainer as FT

    cfg = D.DQNConfig(memory_capacity=4 * num_envs, opponent=D.OPP_L0)
    ep = EnvParams()
    carry = FT.fused_dqn_init(jax.random.key(seed), cfg, ep, num_envs,
                              learn_batch=learn_batch,
                              learn_rounds=learn_rounds)
    hist = []
    for third in range(3):
        carry = FT.fused_dqn_chunk(cfg, ep, carry, steps // 3,
                                   seed=seed * 1_000_000 + carry["steps"])
        hist.append({"episodes": carry["episodes"],
                     "collisions": carry["collisions"],
                     "wins": carry["wins"],
                     "sum_ep_reward": carry["sum_ep_reward"],
                     "loss": carry["last_loss"],
                     "learns": carry["learns"]})
    return hist


def run_xla(seed, num_envs, steps, batch_size):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams

    cfg = D.DQNConfig(memory_capacity=4 * num_envs, batch_size=batch_size,
                      opponent=D.OPP_L0)
    ep = EnvParams()
    carry = D.train_init(jax.random.key(seed), cfg, ep, num_envs)
    hist = []
    for third in range(3):
        carry = D.train_chunk(cfg, ep, carry, steps // 3)
        m = jax.device_get(carry.metrics)
        hist.append({"episodes": float(m.episodes),
                     "collisions": float(m.collisions),
                     "wins": float(m.wins),
                     "sum_ep_reward": float(m.sum_ep_reward),
                     "loss": float(carry.dqn.last_loss),
                     "learns": int(carry.dqn.learn_counter)})
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=12000)
    args = ap.parse_args()

    configs = [
        ("xla_iid_128", lambda s: run_xla(s, args.num_envs, args.steps, 128)),
        # Matched-batch i.i.d. control: isolates batch COMPOSITION from
        # batch SIZE when compared against the 512-lane fused variants.
        ("xla_iid_512", lambda s: run_xla(s, args.num_envs, args.steps, 512)),
        ("fused_slab_512_k1",
         lambda s: run_fused(s, args.num_envs, args.steps, 512, 1)),
        ("fused_mixed_512_k4",
         lambda s: run_fused(s, args.num_envs, args.steps, 512, 4)),
        ("fused_full_slab",
         lambda s: run_fused(s, args.num_envs, args.steps, None, 1)),
    ]
    results = {"config": vars(args)}
    for name, runner in configs:
        runs = []
        for seed in range(args.seeds):
            t0 = time.time()
            hist = runner(seed)
            runs.append({"seed": seed, "windows": _windows(hist),
                         "learns": hist[-1]["learns"],
                         "wall_s": round(time.time() - t0, 1)})
            w = runs[-1]["windows"][-1]
            print(f"{name} seed {seed}: tail coll {w['collision_rate']:.3f} "
                  f"win {w['win_rate']:.3f} rew {w['reward']:.2f} "
                  f"loss {w['loss']:.4g} learns {runs[-1]['learns']} "
                  f"({runs[-1]['wall_s']}s)", flush=True)
        results[name] = runs

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
