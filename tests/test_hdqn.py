"""HDQN tests: goal_status truth table, goal-conditioned input, and a
short end-to-end hierarchical training run."""

import jax
import jax.numpy as jnp
import numpy as np

from merging_gym_tpu.agents import dqn as D
from merging_gym_tpu.agents import hdqn as H
from merging_gym_tpu.core.env import EnvParams


def test_goal_status_truth_table():
    """hdqn.py:223-236: dx1 < -0.5*v2 -> 0; < 0.5*v2 -> 1; else 2."""
    def mk(dx1, v2):
        o = np.zeros(10, np.float32)
        o[0] = dx1
        o[9] = v2
        return o

    cases = [
        (mk(-11.0, 20.0), 0),
        (mk(-10.0, 20.0), 1),   # boundary: not < -10 -> class 1
        (mk(0.0, 20.0), 1),
        (mk(9.99, 20.0), 1),
        (mk(10.0, 20.0), 2),    # boundary: not < 10 -> class 2
        (mk(50.0, 20.0), 2),
        (mk(0.0, 0.0), 2),      # v2=0: only dx1 < 0 is class 0... dx1=0 -> 2
        (mk(-0.1, 0.0), 0),
    ]
    obs = jnp.asarray(np.stack([c[0] for c in cases]))
    got = np.asarray(H.goal_status(obs))
    np.testing.assert_array_equal(got, [c[1] for c in cases])


def test_goal_obs_shape_and_order():
    obs = jnp.arange(10, dtype=jnp.float32)
    g = jnp.asarray(2, jnp.int32)
    go = H.goal_obs(g, obs)
    assert go.shape == (11,)
    assert float(go[0]) == 2.0 and float(go[1]) == 0.0

    # batched
    obs_b = jnp.tile(obs, (4, 1))
    g_b = jnp.asarray([0, 1, 2, 1], jnp.int32)
    go_b = H.goal_obs(g_b, obs_b)
    assert go_b.shape == (4, 11)
    np.testing.assert_array_equal(np.asarray(go_b[:, 0]), [0, 1, 2, 1])


def test_hdqn_end_to_end_l0():
    cfg = H.HDQNConfig(memory_capacity=256, goal_memory_capacity=64,
                       batch_size=16, opponent=D.OPP_L0)
    env_params = EnvParams()
    carry = H.hdqn_init(jax.random.key(0), cfg, env_params, num_envs=16)
    carry = H.hdqn_train_chunk(cfg, env_params, carry, 64)
    assert int(carry.metrics.env_steps) == 64 * 16
    assert int(carry.lower.learn_counter) > 0
    assert int(carry.upper_replay.cursor) > 0  # options do terminate
    assert not bool(jnp.isnan(carry.lower.last_loss))
    assert not bool(jnp.isnan(carry.upper.last_loss))


def test_hdqn_selfplay_compiles():
    cfg = H.HDQNConfig(memory_capacity=128, goal_memory_capacity=32,
                       batch_size=8, opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = H.hdqn_init(jax.random.key(1), cfg, env_params, num_envs=8)
    carry = H.hdqn_train_chunk(cfg, env_params, carry, 24)
    assert int(carry.metrics.env_steps) == 24 * 8
    # goals stay in range
    assert int(carry.goal.min()) >= 0 and int(carry.goal.max()) < 3
