"""Headline benchmark: vectorised env throughput on one chip.

Measures env-steps/s of the jitted 4096-env rollout with random policies
and full trajectory collection (BASELINE.json config 2).  The reference
runs one serial Python env with two quadprog QP solves and a shapely
polygon test per step -- order 1e3 env-steps/s on CPU at best
(BASELINE.md "implied throughput"); that 1e3 upper bound is the
``vs_baseline`` denominator.

Timing is forced-readback: every chunk ends with a host read of a scalar
reduction over the produced rewards, so the device cannot run ahead of
the clock (``block_until_ready`` alone proved unreliable on tunneled
runtimes).  The reported value is the median of several repetitions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import reset_batch, rollout

NUM_ENVS = 4096
STEPS_PER_CHUNK = 512
CHUNKS_PER_REP = 4
REPS = 5
REFERENCE_STEPS_PER_SEC = 1e3  # BASELINE.md: implied 1e2-1e3 on CPU


def policy(ps, obs, key):
    # Random joint policy incl. the None-action opponent arm.
    a = jax.random.randint(key, (obs.shape[0], 2), -1, C.NUM_ACTIONS)
    return ps, a


def main():
    params = EnvParams()
    state = reset_batch(params, jax.random.key(0), NUM_ENVS)

    run = jax.jit(lambda s, k: rollout(params, s, policy, None, k, STEPS_PER_CHUNK))

    # Warmup / compile, with a forced sync.
    (state, _), traj = run(state, jax.random.key(1))
    float(jnp.sum(traj.rewards))

    rates = []
    key_i = 2
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_REP):
            (state, _), traj = run(state, jax.random.key(key_i))
            key_i += 1
            float(jnp.sum(traj.rewards))  # forced readback fence
        dt = time.perf_counter() - t0
        rates.append(NUM_ENVS * STEPS_PER_CHUNK * CHUNKS_PER_REP / dt)

    steps_per_sec = statistics.median(rates)
    print(json.dumps({
        "metric": "env_steps_per_sec_1chip_4096envs",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
