"""Run the REFERENCE's own torch DQN learner against the float64 oracle env.

This closes BASELINE target 4 ("DQN return parity within seed variance")
quantitatively: the reference never published numbers, so we execute its
actual learner -- the torch ``Net``/``DQN`` semantics of
scripts/main.py:30-157 and the training loop of main.py:160-237,
reproduced operation-for-operation below -- against
``merging_gym_tpu.core.oracle.OracleMergeEnv`` (which keeps the reference
env API exactly for this purpose) and record collision / win / reward
bands that the repo's faithful JAX configuration can be compared against
numerically (docs/parity/reference_torch_runs.json).

Faithfully reproduced semantics (each cited):
* Net 10->200->100->5, ReLU, ``weight.data.uniform_(0,1)`` with torch's
  default bias init (main.py:30-47).
* eval and target nets are INDEPENDENT random nets at t=0; the first
  learn() hard-syncs them (main.py:80,125-126).
* Phi(0.7)-greedy: ``np.random.randn() <= 0.7`` -> greedy, else
  ``np.random.randint(0,5)`` (main.py:105-110); one randn consumed per
  choose_action call, all through the legacy global numpy RNG.
* Flat (2000, 22) float64 numpy replay ring, uniform sampling WITH
  replacement over the full capacity (main.py:92,115-119,130).
* Double-DQN target (argmax from eval, value from target), MSE loss,
  Adam lr=0.01, gamma=0.90, target sync every 100 learns
  (main.py:122-157).
* Transitions stored / ep_reward accumulated only while
  ``env.winner is not 1`` (main.py:209-211); learning starts once
  memory_counter >= 2000 and then fires once per env step
  (main.py:213-214).
* L0 opponent: ``action2 = None`` (main.py:196-197).
* Win metric ``state[8] > state[3]`` evaluated on the obs from BEFORE
  the final step -- the loop breaks on done before ``state = next_state``
  (main.py:218-225); collision rate is cumulative over episodes
  (main.py:203-205,224).

Deviation from the reference (documented, statistically irrelevant):
the reference also constructs an unused frozen-opponent DQN for the L0
mode (main.py:168), consuming torch RNG draws for its init; we skip it.
The reference is also unseeded -- we seed numpy+torch per run purely for
reproducibility of THIS artifact.

Usage:
    python benchmarks/reference_torch_dqn.py --seed 0 --out /tmp/ref0.json
    python benchmarks/reference_torch_dqn.py --aggregate /tmp/ref*.json \
        --repo docs/parity/seed_variance.json \
        --out docs/parity/reference_torch_runs.json
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH_SIZE = 128      # main.py:13-18
LR = 0.01
GAMMA = 0.90
EPSILON = 0.7
MEMORY_CAPACITY = 2000
TARGET_SYNC = 100
NUM_STATES = 10
NUM_ACTIONS = 5


def build_net(torch, nn):
    """main.py:30-47: 10->200->100->5 with U(0,1) weights, default bias."""
    net = nn.Sequential(
        nn.Linear(NUM_STATES, 200), nn.ReLU(),
        nn.Linear(200, 100), nn.ReLU(),
        nn.Linear(100, NUM_ACTIONS),
    )
    for mod in net:
        if isinstance(mod, nn.Linear):
            mod.weight.data.uniform_(0, 1)
    return net


def run(seed, episodes, progress_every=100):
    import torch
    import torch.nn as nn

    from merging_gym_tpu.core.oracle import OracleMergeEnv

    torch.set_num_threads(1)
    np.random.seed(seed)
    torch.manual_seed(seed)

    env = OracleMergeEnv()
    eval_net = build_net(torch, nn)
    target_net = build_net(torch, nn)   # independent init, main.py:80
    optimizer = torch.optim.Adam(eval_net.parameters(), lr=LR)
    loss_fn = nn.MSELoss()

    memory = np.zeros((MEMORY_CAPACITY, NUM_STATES * 2 + 2))
    memory_counter = 0
    learn_counter = 0

    def choose_action(state):
        # main.py:99-112
        if np.random.randn() <= EPSILON:
            with torch.no_grad():
                q = eval_net(torch.FloatTensor(state).unsqueeze(0))
            return int(q.argmax(dim=1).item())
        return int(np.random.randint(0, NUM_ACTIONS))

    def learn():
        nonlocal learn_counter
        # main.py:122-157
        if learn_counter % TARGET_SYNC == 0:
            target_net.load_state_dict(eval_net.state_dict())
        learn_counter += 1
        idx = np.random.choice(MEMORY_CAPACITY, BATCH_SIZE)
        batch = memory[idx, :]
        b_state = torch.FloatTensor(batch[:, :NUM_STATES])
        b_action = torch.LongTensor(batch[:, NUM_STATES:NUM_STATES + 1].astype(int))
        b_reward = torch.FloatTensor(batch[:, NUM_STATES + 1:NUM_STATES + 2])
        b_next = torch.FloatTensor(batch[:, -NUM_STATES:])

        q_eval = eval_net(b_state).gather(1, b_action)
        with torch.no_grad():
            q_next = target_net(b_next)
            best_next = eval_net(b_next).max(1)[1]
        q_target = b_reward + GAMMA * q_next[range(BATCH_SIZE), best_next].view(BATCH_SIZE, 1)
        loss = loss_fn(q_eval, q_target)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

    reward_list, collision_list, win_list = [], [], []
    win_flags = []
    collision_count = 0
    win_count = 0
    env_steps = 0
    t0 = time.time()

    for i in range(episodes):
        state = env.reset()
        ep_reward = 0.0
        while True:
            action = choose_action(state)
            next_state, rewards, done, info = env.step(action, None)  # L0
            env_steps += 1
            if info["collision"]:
                collision_count += 1
            if env.winner is not 1:  # noqa: F632 -- faithful, main.py:209
                memory[memory_counter % MEMORY_CAPACITY, :] = np.hstack(
                    (state, [action, rewards[0]], next_state))
                memory_counter += 1
                ep_reward += rewards[0]
            if memory_counter >= MEMORY_CAPACITY:
                learn()
            if done:
                break
            state = next_state
        reward_list.append(ep_reward)
        collision_list.append(collision_count / (i + 1))
        won = state[8] > state[3]  # pre-final obs, main.py:218-225
        win_flags.append(bool(won))
        win_count += int(won)
        win_list.append(win_count / (i + 1))
        if progress_every and (i + 1) % progress_every == 0:
            print(f"seed {seed} ep {i+1}/{episodes} "
                  f"coll {collision_list[-1]:.3f} win {win_list[-1]:.3f} "
                  f"rew {np.mean(reward_list[-100:]):.2f} "
                  f"steps {env_steps} {time.time()-t0:.0f}s", flush=True)

    return {
        "seed": seed,
        "episodes": episodes,
        "env_steps": env_steps,
        "learns": learn_counter,
        "wall_seconds": round(time.time() - t0, 1),
        "collision_rate": collision_count / episodes,
        "win_rate": win_count / episodes,
        "reward": float(np.mean(reward_list)),
        "reward_tail_mean": float(np.mean(reward_list[-500:])),
        "win_rate_tail": float(np.mean(win_flags[-500:])),
        "curves": {
            "reward": [round(r, 4) for r in reward_list],
            "collision_rate": [round(c, 5) for c in collision_list],
            "win_rate": [round(w, 5) for w in win_list],
        },
    }


def aggregate(run_files, repo_file, out):
    """Mode-aware bands + the falsifiable 2-SEM difference-of-means test
    (benchmarks/parity_stats.py -- the round-4 Rainbow statistics
    applied to DQN, VERDICT r4 item 3)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_stats import aggregate_doc

    runs = []
    for f in run_files:
        with open(f) as fh:
            runs.append(json.load(fh))
    repo_doc = None
    if repo_file and os.path.exists(repo_file):
        with open(repo_file) as fh:
            repo_doc = json.load(fh)
    doc = aggregate_doc(
        runs, repo_doc,
        what=("The reference's own torch DQN learner (scripts/main.py "
              "semantics, see benchmarks/reference_torch_dqn.py) run "
              "against the f64 oracle env vs L0; bands over seeds, "
              "compared with the repo's faithful JAX config "
              "(docs/parity/seed_variance.json)."))
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    # Keep the full curves next to it for plotting.
    curves_path = os.path.splitext(out)[0] + "_curves.json"
    with open(curves_path, "w") as fh:
        json.dump({r["seed"]: r["curves"] for r in runs if "curves" in r},
                  fh)
    print(json.dumps({"summary": doc["summary"],
                      "comparison": doc["comparison"]}, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--aggregate", nargs="*", default=None,
                    help="glob(s) of per-seed run JSONs to aggregate")
    ap.add_argument("--repo", default="docs/parity/seed_variance.json")
    args = ap.parse_args()

    if args.aggregate is not None:
        files = sorted(set(sum((glob.glob(g) for g in args.aggregate), [])))
        if not files:
            sys.exit("no run files matched")
        aggregate(files, args.repo, args.out or "docs/parity/reference_torch_runs.json")
        return

    result = run(args.seed, args.episodes)
    out = args.out or f"reference_torch_seed{args.seed}.json"
    with open(out, "w") as fh:
        json.dump(result, fh)
    print(json.dumps({k: v for k, v in result.items() if k != "curves"}, indent=1))


if __name__ == "__main__":
    main()
