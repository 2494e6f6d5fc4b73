"""Run the REFERENCE's own torch hierarchical-DQN learner against the
float64 oracle env.

Companion to benchmarks/reference_torch_dqn.py (which closed BASELINE
target 4 for flat DQN): this executes the reference's ACTUAL
hierarchical learner -- the ``Net``/``Goal_DQN``/``HDQN`` semantics of
scripts/hdqn.py:38-236 and the two-timescale training loop of
hdqn.py:239-346, reproduced operation-for-operation below -- against
``merging_gym_tpu.core.oracle.OracleMergeEnv`` and records collision /
win / reward bands for numeric comparison with the repo's faithful HDQN
configuration (docs/parity/reference_torch_hdqn.json).

Faithfully reproduced semantics (each cited):
* Nets 10->200->100->3 (meta) and 11->200->100->5 (lower), ReLU,
  ``weight.data.uniform_(0,1)`` with torch's default bias init
  (hdqn.py:38-55); eval and target nets independent at t=0, first
  learn() hard-syncs (hdqn.py:62-64,104-107 and :144-146,187-189).
* Phi(0.7)-greedy for BOTH controllers: ``np.random.randn() <= 0.7``
  -> greedy else uniform random (hdqn.py:85-95,163-175); one legacy
  global-numpy randn per choose call.
* Replays: meta ring (200, 22) -- NUM_STATES*2+2 even though it stores
  10-dim states and a goal (hdqn.py:75) -- and lower ring (2000, 24)
  over 11-dim goal-augmented states (hdqn.py:156); uniform sampling
  WITH replacement over full capacity (hdqn.py:111,192); learn gates
  ``memory_counter >= capacity`` (hdqn.py:316-318,325-327).
* Double-DQN target (argmax from eval, value from target), MSE, Adam
  lr=0.01, gamma=0.90, target sync every 100 learns -- both learners
  (hdqn.py:104-137,185-220; the hardcoded ``range(128)`` matches
  BATCH_SIZE=128).
* The option loop quirks: the goal is RE-CHOSEN after every env step
  (hdqn.py:303); the intrinsic reward compares the re-chosen goal with
  ``goal_status`` of the PRE-step state (hdqn.py:314 -- ``state`` is
  assigned ``next_state`` only afterwards at :315); the inner loop
  breaks when done or the (re-chosen) goal matches the post-step
  status (hdqn.py:322-323); the meta transition is stored AFTER
  ``state = next_state``, so its state and next_state are the SAME
  array -- the "faithful-meta" duplicated-state quirk
  (hdqn.py:325, agents/hdqn.py faithful_meta=True).
* goal_status thresholds dx1 vs +-0.5*v2 (hdqn.py:223-236).
* Win metric ``state[8] > state[3]`` on the POST-step obs (unlike
  main.py's pre-step obs: hdqn.py's loop updates ``state`` before the
  episode ends, hdqn.py:338-341); collision rate cumulative
  (hdqn.py:305-307).
* ep_reward accumulates every step with NO winner store-gating
  (hdqn.py:311 -- unlike main.py:209).

Deviation (documented): the reference is unseeded; we seed numpy+torch
per run purely for this artifact's reproducibility.  The tensorboardX
writer, prints and matplotlib panels are dropped.

Usage:
    python benchmarks/reference_torch_hdqn.py --seed 0 --out /tmp/h0.json
    python benchmarks/reference_torch_hdqn.py --aggregate /tmp/h*.json \
        --repo docs/parity/hdqn_seed_variance.json \
        --out docs/parity/reference_torch_hdqn.json
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH_SIZE = 128       # hdqn.py:17-24
LR = 0.01
GAMMA = 0.90
EPSILON = 0.7
MEMORY_CAPACITY = 2000
GOAL_MEMORY_CAPACITY = 200
TARGET_SYNC = 100
NUM_STATES = 10
NUM_ACTIONS = 5
NUM_GOALS = 3


def build_net(torch, nn, num_in, num_out):
    """hdqn.py:38-55: num_in->200->100->num_out, U(0,1) weights."""
    net = nn.Sequential(
        nn.Linear(num_in, 200), nn.ReLU(),
        nn.Linear(200, 100), nn.ReLU(),
        nn.Linear(100, num_out),
    )
    for mod in net:
        if isinstance(mod, nn.Linear):
            mod.weight.data.uniform_(0, 1)
    return net


def goal_status(state):
    """hdqn.py:223-236."""
    dx1, v2 = state[0], state[9]
    if dx1 < -0.5 * v2:
        return 0
    elif dx1 < 0.5 * v2:
        return 1
    return 2


class _Learner:
    """One Double-DQN learner (shared by meta and lower controllers):
    hdqn.py:58-137 == :142-220 modulo dimensions."""

    def __init__(self, torch, nn, num_in, num_out, capacity):
        self.torch, self.num_out = torch, num_out
        self.eval_net = build_net(torch, nn, num_in, num_out)
        self.target_net = build_net(torch, nn, num_in, num_out)
        self.optimizer = torch.optim.Adam(self.eval_net.parameters(), lr=LR)
        self.loss_fn = nn.MSELoss()
        self.capacity = capacity
        self.width = num_in
        self.memory = np.zeros((capacity, num_in * 2 + 2))
        self.memory_counter = 0
        self.learn_counter = 0

    def choose(self, state):
        # hdqn.py:85-95 / :163-175.
        if np.random.randn() <= EPSILON:
            with self.torch.no_grad():
                q = self.eval_net(
                    self.torch.FloatTensor(state).unsqueeze(0))
            return int(q.argmax(dim=1).item())
        return int(np.random.randint(0, self.num_out))

    def store(self, state, action, reward, next_state):
        self.memory[self.memory_counter % self.capacity, :] = np.hstack(
            (state, [action, reward], next_state))
        self.memory_counter += 1

    def learn(self):
        torch = self.torch
        # hdqn.py:104-137 / :185-220.
        if self.learn_counter % TARGET_SYNC == 0:
            self.target_net.load_state_dict(self.eval_net.state_dict())
        self.learn_counter += 1
        idx = np.random.choice(self.capacity, BATCH_SIZE)
        batch = self.memory[idx, :]
        w = self.width
        b_state = torch.FloatTensor(batch[:, :w])
        b_action = torch.LongTensor(batch[:, w:w + 1].astype(int))
        b_reward = torch.FloatTensor(batch[:, w + 1:w + 2])
        b_next = torch.FloatTensor(batch[:, -w:])
        q_eval = self.eval_net(b_state).gather(1, b_action)
        with torch.no_grad():
            q_next = self.target_net(b_next)
            best_next = self.eval_net(b_next).max(1)[1]
        q_target = b_reward + GAMMA * q_next[
            range(BATCH_SIZE), best_next].view(BATCH_SIZE, 1)
        loss = self.loss_fn(q_eval, q_target)
        self.optimizer.zero_grad()
        loss.backward()
        self.optimizer.step()


def run(seed, episodes, progress_every=100):
    import torch
    import torch.nn as nn

    from merging_gym_tpu.core.oracle import OracleMergeEnv

    torch.set_num_threads(1)
    np.random.seed(seed)
    torch.manual_seed(seed)

    env = OracleMergeEnv()
    # Construction order matches hdqn.py:256-257 (upper then lower) so
    # the torch init stream is faithful.
    upper = _Learner(torch, nn, NUM_STATES, NUM_GOALS, GOAL_MEMORY_CAPACITY)
    lower = _Learner(torch, nn, NUM_STATES + 1, NUM_ACTIONS, MEMORY_CAPACITY)

    reward_list, collision_list, win_list, win_flags = [], [], [], []
    collision_count = win_count = env_steps = options = 0
    t0 = time.time()

    for i in range(episodes):
        state = env.reset()
        ep_reward = 0.0
        done = False
        while not done:                      # outer: option timescale
            goal = upper.choose(state)       # hdqn.py:283
            extrinsic = 0.0
            options += 1
            while not done:                  # inner: action timescale
                goal_state = [float(goal)] + list(state)   # hdqn.py:291
                action = lower.choose(goal_state)
                next_state, rewards, done, info = env.step(action, None)
                env_steps += 1
                goal = upper.choose(next_state)            # hdqn.py:303
                next_goal_state = [float(goal)] + list(next_state)
                if info["collision"]:
                    collision_count += 1
                reward = rewards[0]
                ep_reward += reward
                extrinsic += reward
                # Intrinsic: re-chosen goal vs PRE-step status
                # (hdqn.py:314; state updated only at :315).
                intrinsic = 1.0 if goal == goal_status(state) else 0.0
                lower.store(goal_state, action, intrinsic, next_goal_state)
                if lower.memory_counter >= MEMORY_CAPACITY:
                    lower.learn()
                state = next_state
                if done or goal == goal_status(state):     # hdqn.py:322-323
                    break
            # Faithful-meta: state == next_state here (hdqn.py:325).
            upper.store(state, goal, extrinsic, state)
            if upper.memory_counter >= GOAL_MEMORY_CAPACITY:
                upper.learn()

        reward_list.append(ep_reward)
        collision_list.append(collision_count / (i + 1))
        won = state[8] > state[3]            # POST-step obs, hdqn.py:338
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
        "options": options,
        "lower_learns": lower.learn_counter,
        "upper_learns": upper.learn_counter,
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
    applied to HDQN, VERDICT r4 item 3)."""
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
        what=("The reference's own torch hierarchical-DQN learner "
              "(scripts/hdqn.py semantics, see "
              "benchmarks/reference_torch_hdqn.py) run against the f64 "
              "oracle env vs L0; bands over seeds, compared with the "
              "repo's faithful HDQN config."))
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
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
    ap.add_argument("--repo", default="docs/parity/hdqn_seed_variance.json")
    args = ap.parse_args()

    if args.aggregate is not None:
        files = sorted(set(sum((glob.glob(g) for g in args.aggregate), [])))
        if not files:
            sys.exit("no run files matched")
        aggregate(files, args.repo,
                  args.out or "docs/parity/reference_torch_hdqn.json")
        return

    result = run(args.seed, args.episodes)
    out = args.out or f"reference_torch_hdqn_seed{args.seed}.json"
    with open(out, "w") as fh:
        json.dump(result, fh)
    print(json.dumps({k: v for k, v in result.items() if k != "curves"},
                     indent=1))


if __name__ == "__main__":
    main()
