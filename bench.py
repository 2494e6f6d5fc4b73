"""Headline benchmark: vectorised env throughput on one chip.

Measures env-steps/s of the jitted 4096-env rollout with random policies
(BASELINE.json config 2).  The reference runs one serial Python env with
two quadprog QP solves and a shapely polygon test per step -- order 1e3
env-steps/s on CPU at best (BASELINE.md "implied throughput"); that 1e3
upper bound is the ``vs_baseline`` denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import reset_batch, rollout

NUM_ENVS = 4096
STEPS_PER_CHUNK = 1024
REFERENCE_STEPS_PER_SEC = 1e3  # BASELINE.md: implied 1e2-1e3 on CPU


def policy(ps, obs, key):
    # Random joint policy incl. the None-action opponent arm.
    a = jax.random.randint(key, (obs.shape[0], 2), -1, C.NUM_ACTIONS)
    return ps, a


def main():
    params = EnvParams()
    state = reset_batch(params, jax.random.key(0), NUM_ENVS)

    run = jax.jit(lambda s, k: rollout(params, s, policy, None, k, STEPS_PER_CHUNK))

    # Warmup / compile.
    (state, _), traj = run(state, jax.random.key(1))
    jax.block_until_ready(traj.rewards)

    n_chunks = 8
    t0 = time.perf_counter()
    for i in range(n_chunks):
        (state, _), traj = run(state, jax.random.key(2 + i))
    jax.block_until_ready(traj.rewards)
    dt = time.perf_counter() - t0

    steps_per_sec = NUM_ENVS * STEPS_PER_CHUNK * n_chunks / dt
    print(json.dumps({
        "metric": "env_steps_per_sec_1chip_4096envs",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
