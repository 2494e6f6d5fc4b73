"""Reward-sweep-as-vmap tests."""

import jax
import jax.numpy as jnp
import numpy as np

from merging_gym_tpu.agents import dqn as D
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.parallel import sweep


def test_sweep_trains_configs_independently():
    cfg = D.DQNConfig(memory_capacity=64, batch_size=8, opponent=D.OPP_L0)
    params = sweep.stack_env_params([
        EnvParams(),
        EnvParams(r_collision=-100.0),
        EnvParams(vel_penalty=0.01),
    ])
    carries = sweep.sweep_train_init(jax.random.key(0), cfg, params, num_envs=8)
    carries = sweep.sweep_train_chunk(cfg, params, carries, 300)
    eps = np.asarray(carries.metrics.episodes)
    assert eps.shape == (3,) and (eps > 0).all()
    assert (np.asarray(carries.dqn.learn_counter) > 0).all()
    # Sweep entries are independent: different reward params give
    # different accumulated episode rewards.
    rewards = np.asarray(carries.metrics.sum_ep_reward)
    assert len(np.unique(rewards.round(4))) > 1
    assert not np.isnan(np.asarray(carries.dqn.last_loss)).any()


def test_sweep_entry_matches_single_run():
    """Entry 0 of a sweep must reproduce a plain single-config run with
    the same key."""
    cfg = D.DQNConfig(memory_capacity=32, batch_size=8, opponent=D.OPP_L0)
    p0 = EnvParams()
    stacked = sweep.stack_env_params([p0, EnvParams(r_first=5.0)])
    carries = sweep.sweep_train_init(jax.random.key(1), cfg, stacked, 4)
    carries = sweep.sweep_train_chunk(cfg, stacked, carries, 25)

    single = D.train_init(jax.random.split(jax.random.key(1), 2)[0], cfg, p0, 4)
    single = D.train_chunk(cfg, p0, single, 25)
    np.testing.assert_allclose(
        np.asarray(carries.dqn.params["fc0"]["w"][0]),
        np.asarray(single.dqn.params["fc0"]["w"]), rtol=2e-5, atol=2e-5)
    assert int(carries.metrics.episodes[0]) == int(single.metrics.episodes)
