"""Gymnasium VectorEnv over the native core (NEXT_STEP autoreset)."""

import numpy as np
import pytest

from merging_gym_tpu.core import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_vector_env_episodes_and_next_step_autoreset():
    from merging_gym_tpu.envs.vector_env import NativeVectorEnv

    env = NativeVectorEnv(num_envs=16)
    obs, info = env.reset(seed=0)
    assert obs.shape == (16, 10)
    total_dones = 0
    pending = np.zeros(16, bool)
    for t in range(500):
        actions = np.full(16, 4, np.int32)  # floor it vs L0
        obs, rew, term, trunc, infos = env.step(actions)
        done = term | trunc
        # Envs flagged done last step restarted now: fresh obs near start.
        if pending.any():
            i = np.nonzero(pending)[0][0]
            assert obs[i, 3] > 890.0
        if done.any():
            total_dones += int(done.sum())
            # Terminal step returns the TRUE terminal obs (both crossed:
            # distance-to-go <= 0 for the winner side).
            i = np.nonzero(done)[0][0]
            assert obs[i, 3] < 0.0 or infos["collision"][i]
        pending = done
    assert total_dones >= 16


def test_vector_env_termination_vs_truncation():
    from merging_gym_tpu.envs.vector_env import NativeVectorEnv

    # Mirror matchup: collisions -> terminated, never truncated.
    env = NativeVectorEnv(num_envs=8, opponent=lambda obs, rng: np.full(len(obs), 2))
    env.reset()
    for _ in range(300):
        obs, rew, term, trunc, infos = env.step(np.full(8, 2, np.int32))
        if term.any():
            assert not trunc[term].any()
            assert infos["collision"][term].all()
            break
    else:
        pytest.fail("no collision episode within 300 steps")


def test_vector_env_custom_rewards():
    from merging_gym_tpu.envs.vector_env import NativeVectorEnv

    env = NativeVectorEnv(num_envs=8, opponent=lambda obs, rng: np.full(len(obs), 2),
                          rewards=(2.0, 1.0, -100.0, 0.001, 0.0))
    env.reset()
    min_r = 0.0
    for _ in range(300):
        obs, rew, term, trunc, infos = env.step(np.full(8, 2, np.int32))
        min_r = min(min_r, float(rew.min()))
        if (term | trunc).any():
            break
    assert min_r < -90.0
