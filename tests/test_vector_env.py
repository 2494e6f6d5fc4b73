"""Gymnasium VectorEnv over the native core."""

import numpy as np
import pytest

from merging_gym_tpu.core import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_vector_env_episodes_and_autoreset():
    from merging_gym_tpu.envs.vector_env import NativeVectorEnv

    env = NativeVectorEnv(num_envs=16)
    obs, info = env.reset(seed=0)
    assert obs.shape == (16, 10)
    total_dones = 0
    for t in range(400):
        actions = np.full(16, 4, np.int32)  # floor it vs L0
        obs, rew, term, trunc, infos = env.step(actions)
        assert obs.shape == (16, 10) and rew.shape == (16,)
        done = term | trunc
        if done.any():
            total_dones += int(done.sum())
            assert "final_observation" in infos
            # auto-reset: fresh obs back near the start line
            i = np.nonzero(done)[0][0]
            assert obs[i, 3] > 890.0
    assert total_dones >= 16  # every env finished at least once


def test_vector_env_custom_opponent_and_rewards():
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
    assert min_r < -90.0  # mirror matchup collides with the custom penalty
