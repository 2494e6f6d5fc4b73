"""Gymnasium VectorEnv over the native C++ batch core.

For consumers outside the JAX ecosystem (SB3-style trainers, evaluation
scripts) who want batched stepping without a TPU: wraps
``core.native.NativeMergeEnv`` -- the bit-exact C++ env core -- in the
``gymnasium.vector.VectorEnv`` interface with auto-reset.  Single-agent
view: player 2 is a pluggable opponent callable (default L0), as in
``envs.gym_env.GymnasiumMergeEnv``.

Throughput is the native core's (~0.4-1.8M serial env-steps/s on this
host's CPU); for TPU-scale throughput use core.vector / ops.fused_rollout.
"""

from __future__ import annotations

import gymnasium as gym
import numpy as np

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core import native


class NativeVectorEnv(gym.vector.VectorEnv):
    """Batched single-agent merging env backed by the C++ core."""

    metadata = {"render_modes": []}

    def __init__(self, num_envs: int = 64, opponent=None,
                 rewards=(C.R_FIRST, C.R_SECOND, C.R_COLLISION,
                          C.VEL_PENALTY, C.TIME_PENALTY)):
        self.num_envs = num_envs
        self.single_observation_space = gym.spaces.Box(
            low=-np.inf, high=np.inf, shape=(C.OBS_DIM,), dtype=np.float32)
        self.single_action_space = gym.spaces.Discrete(C.NUM_ACTIONS)
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, num_envs)
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs)
        self.opponent = opponent
        self._env = native.NativeMergeEnv(num_envs, rewards)
        self._rng = np.random.default_rng(0)

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        obs = self._env.reset()
        return obs.astype(np.float32), {}

    def _opponent_actions(self, obs: np.ndarray) -> np.ndarray:
        if self.opponent is None:
            return np.full(self.num_envs, -1, np.int32)  # L0
        swapped = np.concatenate([obs[:, 5:], obs[:, :5]], axis=1)
        return np.asarray(self.opponent(swapped, self._rng), np.int32)

    def step(self, actions):
        a1 = np.asarray(actions, np.int32)
        obs_now = self._env.observe().astype(np.float32)
        a2 = self._opponent_actions(obs_now)
        obs, rewards, done, collision, winner = self._env.step(a1, a2)

        terminated = done & ~self._timeout_mask()
        truncated = done & self._timeout_mask()
        infos = {
            "collision": collision,
            "winner": winner,
            "reward_opponent": rewards[:, 1].astype(np.float32),
        }
        # Gymnasium autoreset convention: reset finished envs, return the
        # fresh observation, expose the terminal one in infos.
        if done.any():
            infos["final_observation"] = obs.astype(np.float32).copy()
            st = self._env.state
            for i in np.nonzero(done)[0]:
                st[i] = (C.START_POINT, C.START_VEL, 0.0,
                         C.START_POINT, C.START_VEL, 0.0,
                         0.0, 0.0, 0.0, 0, 0, 0)
            obs = self._env.observe()
        return (obs.astype(np.float32), rewards[:, 0].astype(np.float32),
                terminated, truncated, infos)

    def _timeout_mask(self):
        return self._env.state["t"] >= C.TIMEOUT_STEPS

    def close(self):
        pass
