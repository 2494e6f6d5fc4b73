"""Learning-curve parity run: faithful single-env HDQN vs the L0 opponent.

Companion to examples/parity_dqn.py for the hierarchical trainer:
reproduces the reference's configuration exactly (scripts/hdqn.py:17-24,
239-346) -- ONE environment, meta ring 200 / lower ring 2000 sampled
with replacement, batch 128, Adam 0.01, gamma 0.90, Phi(0.7)-greedy for
both controllers, target sync every 100 learns, the goal re-chosen
every env step, the faithful duplicated-state meta transition
(faithful_meta=True) -- for --episodes episodes, fully on device.

With --summary-only it appends the final rates as one JSON line
(aggregate three seeds into docs/parity/hdqn_seed_variance.json with
--aggregate, the band benchmarks/reference_torch_hdqn.py compares its
torch runs against).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def aggregate(files, out):
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
        "what": ("Faithful single-env HDQN (examples/parity_hdqn.py, "
                 "scripts/hdqn.py configuration) trained vs L0; bands over "
                 "seeds -- the repo side of the torch-vs-repo comparison "
                 "in docs/parity/reference_torch_hdqn.json."),
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
    ap.add_argument("--out", default="parity_hdqn_run")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--summary-only", action="store_true",
                    help="write only <out>.json with the final rates")
    ap.add_argument("--aggregate", nargs="*", default=None,
                    help="glob(s) of per-seed summary JSONs to combine")
    args = ap.parse_args()

    if args.aggregate is not None:
        aggregate(args.aggregate,
                  args.out or "docs/parity/hdqn_seed_variance.json")
        return

    from merging_gym_tpu.agents import hdqn as H
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.io.metrics import rates_from_counters

    cfg = H.HDQNConfig()  # defaults ARE hdqn.py:17-24 (faithful_meta incl.)
    env_params = EnvParams()
    carry = H.hdqn_init(jax.random.key(args.seed), cfg, env_params,
                        num_envs=1)

    writer = None
    if not args.summary_only:
        from merging_gym_tpu.io.metrics import MetricsWriter
        os.makedirs(args.out, exist_ok=True)
        writer = MetricsWriter(args.out)
    chunk = 0
    while int(carry.metrics.episodes) < args.episodes:
        carry = H.hdqn_train_chunk(cfg, env_params, carry, 2000)
        jax.block_until_ready(carry.metrics.episodes)
        scalars = rates_from_counters(carry.metrics)
        scalars["loss"] = float(carry.lower.last_loss)
        scalars["meta_loss"] = float(carry.upper.last_loss)
        if writer:
            writer.log(chunk, scalars)
        if chunk % 25 == 0:
            print(json.dumps(scalars), flush=True)
        chunk += 1
        if chunk > 3000:
            break
    if writer:
        writer.close()
        from merging_gym_tpu.io.analysis import plot_training_curves
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
