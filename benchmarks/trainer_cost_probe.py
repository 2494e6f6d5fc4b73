"""Cost attribution for the fused TRAINER kernels.

Answers "where does the time go once a learner is in the loop?" by
comparing kernels that share the actor+env chain but differ in learner
work -- all existing, unmodified kernels:

  * policy-rollout   ops.fused_policy_rollout (Q-net actors + env +
                     auto-reset; NO ring, NO learner) -- the actor+env
                     floor for the DQN family;
  * dqn full-slab    ops.fused_trainer, learner batch = num_envs;
  * dqn b128         ops.fused_trainer, learn_batch=128 (the
                     reference's batch scale -- learner matmul work
                     cut by num_envs/128);
  * hdqn             ops.fused_hdqn (two learners, two rings);
  * rainbow noisy    ops.fused_rainbow (C51 learner + on-chip noise
                     resampling every step);
  * rainbow greedy   the same kernel with greedy=True (no PRNG, no
                     noise regeneration, learner still runs) -- the
                     noise-generation share.

The difference between the trainer and the policy-rollout at the same
env count is the ring+learner cost; the full-slab vs b128 gap is the
learner-matmul batch-width share of that.  Results feed the
"Single-kernel ... trainer" sections of docs/BENCHMARKS.md.

    python benchmarks/trainer_cost_probe.py [--quick]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 3


def _rate(label, fn, fence, steps_per_rep):
    fence(fn(0))
    rates = []
    for s in range(1, REPS + 1):
        t0 = time.perf_counter()
        fence(fn(s))
        rates.append(steps_per_rep / (time.perf_counter() - t0))
    r = statistics.median(rates)
    print(f"{label}: {r/1e6:.1f} M env-steps/s", flush=True)
    return r


def policy_rollout(n, t):
    from merging_gym_tpu.nn.mlp import qnet_init
    from merging_gym_tpu.ops.fused_policy_rollout import fused_policy_rollout

    params = qnet_init(jax.random.key(0), 10, 5)
    # params2=params1: self-play (two Q-net forwards per step, matching
    # the trainer's selfplay actor work).
    fn = lambda s: fused_policy_rollout(t, n, params, params, seed=s,
                                        greedy=True)
    return _rate(f"policy-rollout n={n}", fn,
                 lambda out: float(jnp.sum(out["rewards"])), n * t)


def dqn_trainer(n, t, learn_batch=None):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_trainer as FT

    cfg = D.DQNConfig(memory_capacity=4 * n, opponent=D.OPP_SELFPLAY)
    ep = EnvParams()
    carry = FT.fused_dqn_init(jax.random.key(0), cfg, ep, n,
                              learn_batch=learn_batch)
    state = {"c": carry}

    def fn(s):
        state["c"] = FT.fused_dqn_chunk(cfg, ep, state["c"], t, seed=s)
        return state["c"]

    tag = f" b={learn_batch}" if learn_batch else " full-slab"
    return _rate(f"dqn-trainer n={n}{tag}", fn,
                 lambda c: float(jnp.sum(c["p"][0])), n * t)


def hdqn_trainer(n, t):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents.hdqn import HDQNConfig
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_hdqn as FH

    cfg = HDQNConfig(memory_capacity=4 * n, goal_memory_capacity=2 * n,
                     opponent=D.OPP_SELFPLAY)
    ep = EnvParams()
    carry = FH.fused_hdqn_init(jax.random.key(0), cfg, ep, n)
    state = {"c": carry}

    def fn(s):
        state["c"] = FH.fused_hdqn_chunk(cfg, ep, state["c"], t, seed=s * t)
        return state["c"]

    return _rate(f"hdqn-trainer n={n}", fn,
                 lambda c: float(jnp.sum(c["l_p"][0])), n * t)


def rainbow_trainer(n, t, greedy):
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.ops import fused_rainbow as FRB

    cfg = RainbowConfig(memory_capacity=8 * n, obs_scale=0.01,
                        opponent=D.OPP_SELFPLAY)
    ep = EnvParams()
    carry = FRB.fused_rainbow_init(jax.random.key(0), cfg, ep, n)
    state = {"c": carry}

    def fn(s):
        state["c"] = FRB.fused_rainbow_chunk(cfg, ep, state["c"], t,
                                             seed=s * t, greedy=greedy)
        return state["c"]

    tag = "greedy (no noise-gen)" if greedy else "noisy"
    return _rate(f"rainbow-trainer n={n} {tag}", fn,
                 lambda c: float(jnp.sum(c["p"][0])), n * t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    t = 2000 if args.quick else 8192
    t_small = 2000

    base = policy_rollout(4096, t)
    full = dqn_trainer(4096, t)
    b128 = dqn_trainer(4096, t, learn_batch=128)
    us = lambda r: 1e6 * 4096 / r
    print(f"-> actor+env floor {us(base):.2f} us/step(4096 lanes); "
          f"ring+learner adds {us(full)-us(base):.2f} (full-slab) / "
          f"{us(b128)-us(base):.2f} (b128); learner-batch share "
          f"{(us(full)-us(b128))/(us(full)-us(base))*100:.0f}% of the "
          "full-slab ring+learner cost", flush=True)

    hdqn_trainer(1024, t_small)
    noisy = rainbow_trainer(1024, t_small, greedy=False)
    greedy = rainbow_trainer(1024, t_small, greedy=True)
    us1 = lambda r: 1e6 * 1024 / r
    print(f"-> rainbow noise-gen share: {us1(noisy)-us1(greedy):.2f} of "
          f"{us1(noisy):.2f} us/step(1024 lanes) "
          f"({(us1(noisy)-us1(greedy))/us1(noisy)*100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
