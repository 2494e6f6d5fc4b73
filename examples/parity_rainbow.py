"""Learning-curve parity run: faithful single-env Rainbow self-play.

Companion to examples/parity_dqn.py / parity_hdqn.py for the third
trainer family: reproduces the reference's configuration exactly
(scripts/ranbowdqn.py:623-700) -- ONE environment, SELF-PLAY with the
roll-3 slice bug (``opponent_roll=3``), uniform 10,000-slot ring, batch
32, Adam 1e-3, gamma 0.99, hard target sync every 20 episodes, the
faithful support-weighted C51 projection, raw observations (no
obs_scale), pure noisy-greedy actor (no epsilon) -- for --episodes
episodes on device.

Known vectorization deviation (documented): the reference skips the
learn on an episode's terminal step (its ``done: break`` precedes the
learn, ranbowdqn.py:676-683); the repo's scan learns every step.  At
the timeout-dominated equilibrium this is < 0.04% of learns.

With --summary-only it writes <out>.json with the final rates;
aggregate seeds into docs/parity/rainbow_seed_variance.json with
--aggregate (the band benchmarks/reference_torch_rainbow.py compares
its torch runs against, at MATCHED episode count).
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
        "what": ("Faithful single-env Rainbow self-play "
                 "(examples/parity_rainbow.py, scripts/ranbowdqn.py "
                 "configuration incl. the roll-3 bug); bands over seeds -- "
                 "the repo side of the torch-vs-repo comparison in "
                 "docs/parity/reference_torch_rainbow.json."),
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
    ap.add_argument("--out", default="parity_rainbow_run")
    ap.add_argument("--episodes", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--summary-only", action="store_true")
    ap.add_argument("--max-chunks", type=int, default=1000,
                    help="safety cap on 2,500-step chunks (a timeout-mode "
                         "4,000-episode run needs ~4,000 chunks)")
    ap.add_argument("--aggregate", nargs="*", default=None)
    args = ap.parse_args()

    if args.aggregate is not None:
        aggregate(args.aggregate,
                  args.out or "docs/parity/rainbow_seed_variance.json")
        return

    from merging_gym_tpu.agents import rainbow as R
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.io.metrics import rates_from_counters

    cfg = R.RainbowConfig(  # ranbowdqn.py:645-652 + the :669 slice bug
        batch_size=32, lr=1e-3, gamma=0.99, memory_capacity=10000,
        target_sync_episodes=20, opponent_roll=3, faithful_c51=True,
        opponent="selfplay", obs_scale=None, epsilon=None)
    env_params = EnvParams()
    carry = R.rainbow_train_init(jax.random.key(args.seed), cfg, env_params,
                                 num_envs=1)

    writer = None
    if not args.summary_only:
        from merging_gym_tpu.io.metrics import MetricsWriter
        os.makedirs(args.out, exist_ok=True)
        writer = MetricsWriter(args.out)
    chunk = 0
    while int(carry.metrics.episodes) < args.episodes:
        carry = R.rainbow_train_chunk(cfg, env_params, carry, 2500)
        jax.block_until_ready(carry.metrics.episodes)
        scalars = rates_from_counters(carry.metrics)
        scalars["loss"] = float(carry.last_loss)
        if writer:
            writer.log(chunk, scalars)
        if chunk % 20 == 0:
            print(json.dumps(scalars), flush=True)
        chunk += 1
        if chunk > args.max_chunks:
            break
    if writer:
        writer.close()
        from merging_gym_tpu.io.analysis import plot_training_curves
        plot_training_curves(args.out)

    final = rates_from_counters(carry.metrics)
    final["seed"] = args.seed
    final["loss"] = float(carry.last_loss)
    dst = (args.out + ".json") if args.summary_only \
        else os.path.join(args.out, "summary.json")
    with open(dst, "w") as f:
        json.dump(final, f, indent=2)
        f.write("\n")
    print("done:", final)


if __name__ == "__main__":
    main()
