"""Rebuild model_zoo/league.json: round-robin over L0 + every zoo entry.

All matchups are played under the reference's Phi(0.7)-greedy actor
(human_player.py:158 -> main.py:99-112) -- pure-greedy from the
deterministic start would collapse every env to one trajectory.

``--greedy`` (VERDICT r4 item 9) re-runs the league under PURE-greedy
actors with RANDOMIZED starts (core.env's random_start mode, the
commented-out merging_env.py:219-221 distribution): trajectory
diversity then comes from the start distribution instead of
exploration noise, so the dominance table isolates the policies'
deterministic play -- the mode a human effectively faces in
human_player.py.  Writes league_greedy.json.

    python model_zoo/make_league.py [--num-envs 256] [--episodes 512]
                                    [--greedy]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

ZOO = os.path.dirname(os.path.abspath(__file__))


def build_policies(greedy=False):
    """Load every zoo entry into the league's (stateless, recurrent)
    policy dicts -- dqn/rainbow/hdqn entries as stateless Policies,
    drqn entries as raw params for the recurrent rollout.  Factored out
    of main() so tests can lock the loader against every entry layout
    actually shipped in the zoo (a dispatch gap here crashes the league
    rebuild; it did once, when hdqn entries landed)."""
    from merging_gym_tpu.agents.hdqn import HDQNConfig
    from merging_gym_tpu.agents.policies import (hdqn_policy, l0_policy,
                                                 q_policy, rainbow_policy)
    from merging_gym_tpu.io.checkpoint import load_params_npz
    from merging_gym_tpu.nn.lstm import drqn_init
    from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init
    from merging_gym_tpu.nn.rainbow_net import rainbow_init

    like = qnet_init(jax.random.key(0), 10, 5)
    rb_like = rainbow_init(jax.random.key(0), 10, 5)
    hcfg = HDQNConfig()
    hd_like = {"lower": qnet_init(jax.random.key(0), hcfg.obs_dim + 1,
                                  hcfg.num_actions, hcfg.hidden),
               "upper": qnet_init(jax.random.key(0), hcfg.obs_dim,
                                  hcfg.num_goals, hcfg.hidden)}
    dr_like = drqn_init(jax.random.key(0), 10, 5)
    policies = {"L0": l0_policy()}
    recurrent = {}     # drqn entries: raw params, recurrent rollout
    for name in sorted(os.listdir(ZOO)):
        npz = os.path.join(ZOO, name, "params.npz")
        meta = os.path.join(ZOO, name, "meta.json")
        if not (os.path.isdir(os.path.join(ZOO, name)) and os.path.exists(npz)):
            continue
        algo, m = "dqn", {}
        if os.path.exists(meta):
            m = json.load(open(meta))
            algo = m.get("algo", "dqn")
        if algo == "rainbow":
            policies[name] = rainbow_policy(load_params_npz(npz, rb_like),
                                            obs_scale=m.get("obs_scale"),
                                            greedy=greedy)
        elif algo == "hdqn":
            nets = load_params_npz(npz, hd_like)
            policies[name] = hdqn_policy(nets["upper"], nets["lower"],
                                         greedy=greedy)
        elif algo == "drqn":
            recurrent[name] = load_params_npz(npz, dr_like)
        else:
            params = load_params_npz(npz, like)
            policies[name] = q_policy(qnet_apply, params, greedy=greedy)
    return policies, recurrent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--episodes", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--greedy", action="store_true",
                    help="pure-greedy actors + randomized starts; writes "
                         "league_greedy.json")
    args = ap.parse_args()

    from merging_gym_tpu.agents.evaluate import evaluate_mixed, round_robin
    from merging_gym_tpu.core.env import EnvParams

    policies, recurrent = build_policies(greedy=args.greedy)
    print("league over:", ", ".join(list(policies) + list(recurrent)))

    env_params = EnvParams(random_start=True) if args.greedy else EnvParams()
    results = round_robin(policies, env_params, jax.random.key(args.seed),
                          num_envs=args.num_envs, min_episodes=args.episodes)

    # Recurrent (drqn) entries cannot ride the stateless two_player
    # round-robin; play their matchups through evaluate_mixed (both seat
    # orders, plus drqn-vs-drqn).
    key = jax.random.key(args.seed + 1)
    seats = {n: ("policy", p) for n, p in policies.items()}
    seats.update({n: ("drqn", p) for n, p in recurrent.items()})
    for rname in recurrent:
        for oname, oseat in seats.items():
            if oname == rname:
                continue
            key, k1, k2 = jax.random.split(key, 3)
            results[f"{rname} vs {oname}"] = evaluate_mixed(
                seats[rname], oseat, env_params, k1,
                num_envs=args.num_envs, min_episodes=args.episodes,
                greedy=args.greedy)
            if oname not in recurrent:   # else covered by the outer loop
                results[f"{oname} vs {rname}"] = evaluate_mixed(
                    oseat, seats[rname], env_params, k2,
                    num_envs=args.num_envs, min_episodes=args.episodes,
                    greedy=args.greedy)
    rounded = {
        k: {m: (round(v, 3) if isinstance(v, float) else v)
            for m, v in r.items()
            if m in ("p1_first_rate", "p2_first_rate", "collision_rate",
                     "timeout_rate", "mean_return_p1", "mean_return_p2")}
        for k, r in results.items()
    }
    out = os.path.join(ZOO,
                       "league_greedy.json" if args.greedy else "league.json")
    with open(out, "w") as f:
        json.dump(rounded, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
