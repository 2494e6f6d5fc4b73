"""Learning-curve parity run: faithful single-env DQN vs the L0 opponent.

Reproduces the reference's training configuration exactly
(scripts/main.py): ONE environment, 2000-slot replay sampled with
replacement, batch 128, Adam lr 0.01, gamma 0.90, Phi(0.7)-greedy,
target sync every 100 learns, one SGD step per env step after the ring
fills, transitions gated on the ego not having won, 2000 episodes.  The
actor-learner still runs fully on device (num_envs=1 in the fused scan),
so the whole run takes seconds instead of the reference's hours.

Outputs into --out: scalars.jsonl + the 4-panel curves.png matching the
reference's saved learning-curve PNGs (reward, loss, collision-rate,
win-rate -- cf. test_params/dqn/*/​*.png), plus summary.json with the
final rates for quantitative comparison.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def aggregate(files, out):
    """Repo-side seed bands (cf. examples/parity_hdqn.py aggregate)."""
    import glob

    import numpy as np
    runs = []
    for f in sorted(set(sum((glob.glob(g) for g in files), []))):
        with open(f) as fh:
            runs.append(json.load(fh))
    runs.sort(key=lambda r: r["seed"])

    def band(key):
        vals = [r[key] for r in runs]
        return {"mean": float(np.mean(vals)), "std": float(np.std(vals))}

    doc = {
        "what": ("Faithful single-env DQN (examples/parity_dqn.py, "
                 "scripts/main.py configuration) trained vs L0; bands over "
                 "seeds -- the repo side of the torch-vs-repo comparison "
                 "in docs/parity/reference_torch_runs.json."),
        "summary": {"seeds": len(runs),
                    **{k: band(k) for k in ("collision_rate", "win_rate",
                                            "reward")}},
        "runs": runs,
    }
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps(doc["summary"], indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="parity_run")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--opponent", default="L0")
    ap.add_argument("--summary-only", action="store_true",
                    help="write only <out>.json with the final rates")
    ap.add_argument("--aggregate", nargs="*", default=None,
                    help="glob(s) of per-seed summary JSONs to combine")
    args = ap.parse_args()

    if args.aggregate is not None:
        aggregate(args.aggregate,
                  args.out if args.out != "parity_run"
                  else "docs/parity/seed_variance.json")
        return

    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.io.analysis import plot_training_curves
    from merging_gym_tpu.io.metrics import MetricsWriter, rates_from_counters

    cfg = D.DQNConfig(  # main.py:13-18 exactly
        batch_size=128, lr=0.01, gamma=0.90, memory_capacity=2000,
        target_sync=100, opponent=args.opponent
        if args.opponent in (D.OPP_L0, D.OPP_SELFPLAY) else D.OPP_L0)
    env_params = EnvParams()
    carry = D.train_init(jax.random.key(args.seed), cfg, env_params, num_envs=1)

    writer = None
    if not args.summary_only:
        os.makedirs(args.out, exist_ok=True)
        writer = MetricsWriter(args.out)
    chunk = 0
    prev = None
    while int(carry.metrics.episodes) < args.episodes:
        carry = D.train_chunk(cfg, env_params, carry, 2000)
        jax.block_until_ready(carry.metrics.episodes)
        scalars = rates_from_counters(carry.metrics)
        scalars["loss"] = float(carry.dqn.last_loss)
        scalars["learns"] = int(carry.dqn.learn_counter)
        # Windowed (since last log) rates for curve shape, not only
        # cumulative ones.
        if prev is not None:
            de = scalars["episodes"] - prev["episodes"]
            if de > 0:
                scalars["collision_rate_window"] = (
                    int(carry.metrics.collisions) - prev["collisions"]) / de
                scalars["win_rate_window"] = (
                    int(carry.metrics.wins) - prev["wins"]) / de
        prev = {"episodes": scalars["episodes"],
                "collisions": int(carry.metrics.collisions),
                "wins": int(carry.metrics.wins)}
        if writer:
            writer.log(chunk, scalars)
        if not args.summary_only or chunk % 25 == 0:
            print(json.dumps(scalars), flush=True)
        chunk += 1
        if chunk > 2000:
            break
    if writer:
        writer.close()
        plot_training_curves(args.out)
    final = rates_from_counters(carry.metrics)
    final["seed"] = args.seed
    dst = (args.out + ".json") if args.summary_only \
        else os.path.join(args.out, "summary.json")
    with open(dst, "w") as f:
        json.dump(final, f, indent=2)
        f.write("\n")
    print("done:", final)


if __name__ == "__main__":
    main()
