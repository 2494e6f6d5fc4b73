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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="parity_run")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--opponent", default="L0")
    args = ap.parse_args()

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
        writer.log(chunk, scalars)
        print(json.dumps(scalars), flush=True)
        chunk += 1
        if chunk > 2000:
            break
    writer.close()
    plot_training_curves(args.out)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(rates_from_counters(carry.metrics), f, indent=2)
    print("done:", rates_from_counters(carry.metrics))


if __name__ == "__main__":
    main()
