"""Distributed-without-a-cluster tests: shard_map DQN training on a
virtual 8-device CPU mesh (SURVEY.md section 4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents import dqn as D
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.parallel.mesh import make_mesh
from merging_gym_tpu.parallel import spmd


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_spmd_train_runs(devices8, dp, tp):
    mesh = make_mesh(data=dp, model=tp, devices=devices8)
    cfg = D.DQNConfig(memory_capacity=64, batch_size=16, opponent=D.OPP_L0)
    env_params = EnvParams()
    carry = spmd.spmd_train_init(jax.random.key(0), cfg, env_params,
                                 num_envs=dp * 8, mesh=mesh)
    carry = spmd.spmd_train_chunk(mesh, cfg, env_params, carry, 40)
    assert int(carry.metrics.env_steps) == 40 * dp * 8
    assert int(carry.dqn.learn_counter) > 0
    assert not bool(jnp.isnan(carry.dqn.last_loss))


def test_spmd_params_stay_replicated(devices8):
    """DP psum + identical updates must keep params bitwise-replicated."""
    mesh = make_mesh(data=4, model=2, devices=devices8)
    cfg = D.DQNConfig(memory_capacity=32, batch_size=8, opponent=D.OPP_SELFPLAY)
    env_params = EnvParams()
    carry = spmd.spmd_train_init(jax.random.key(1), cfg, env_params, 32, mesh)
    carry = spmd.spmd_train_chunk(mesh, cfg, env_params, carry, 16)
    w = carry.dqn.params["fc0"]["w"]
    # fc0 is model-sharded on its out dim, replicated over data: gathering
    # must give a well-defined global array with finite values.
    gathered = np.asarray(jax.device_get(w))
    assert gathered.shape == (10, 200)
    assert np.isfinite(gathered).all()


def test_tp_qnet_matches_single_device(devices8):
    """Tensor-parallel forward == single-device forward."""
    from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1, model=4, devices=devices8[:4])
    params = qnet_init(jax.random.key(2), 10, 5, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(3), (64, 10), jnp.float32)
    expect = qnet_apply(params, x)

    specs = spmd.qnet_pspecs(params)
    sharded = jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda v: isinstance(v, P)))
    fn = jax.shard_map(spmd.qnet_apply_tp, mesh=mesh,
                       in_specs=(specs, P()), out_specs=P(), check_vma=False)
    got = jax.jit(fn)(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_spmd_metrics_accumulate_across_chunks(devices8):
    """Regression: per-step psum'd metric increments must not double-count
    when running multiple chunks."""
    mesh = make_mesh(data=4, model=1, devices=devices8[:4])
    cfg = D.DQNConfig(memory_capacity=32, batch_size=8, opponent=D.OPP_L0)
    env_params = EnvParams()
    carry = spmd.spmd_train_init(jax.random.key(7), cfg, env_params, 16, mesh)
    carry = spmd.spmd_train_chunk(mesh, cfg, env_params, carry, 10)
    assert int(carry.metrics.env_steps) == 10 * 16
    carry = spmd.spmd_train_chunk(mesh, cfg, env_params, carry, 10)
    assert int(carry.metrics.env_steps) == 20 * 16
    carry = spmd.spmd_train_chunk(mesh, cfg, env_params, carry, 5)
    assert int(carry.metrics.env_steps) == 25 * 16


def test_spmd_rainbow(devices8):
    from merging_gym_tpu.agents import rainbow as R

    mesh = make_mesh(data=4, model=1, devices=devices8[:4])
    cfg = R.RainbowConfig(memory_capacity=64, batch_size=8, per=True,
                          n_step=3, pmean_axis="data")
    env_params = EnvParams(random_start=True)
    carry = spmd.spmd_rainbow_init(jax.random.key(8), cfg, env_params,
                                   num_envs=16, mesh=mesh)
    carry = spmd.spmd_rainbow_chunk(mesh, cfg, env_params, carry, 30)
    assert int(carry.metrics.env_steps) == 30 * 16
    carry = spmd.spmd_rainbow_chunk(mesh, cfg, env_params, carry, 30)
    assert int(carry.metrics.env_steps) == 60 * 16
    assert not bool(jnp.isnan(carry.last_loss))
    # params replicated: gather works and is finite
    w = np.asarray(jax.device_get(carry.params["linear1"]["w"]))
    assert np.isfinite(w).all()


def test_spmd_drqn(devices8):
    from merging_gym_tpu.agents import drqn as DR

    mesh = make_mesh(data=4, model=1, devices=devices8[:4])
    cfg = DR.DRQNConfig(memory_capacity=16, batch_size=4, seq_len=8,
                        burn_in=2, opponent=D.OPP_SELFPLAY,
                        pmean_axis="data")
    env_params = EnvParams()
    carry = spmd.spmd_drqn_init(jax.random.key(21), cfg, env_params,
                                num_envs=16, mesh=mesh)
    carry = spmd.spmd_drqn_chunk(mesh, cfg, env_params, carry, 40)
    assert int(carry.metrics.env_steps) == 40 * 16
    carry = spmd.spmd_drqn_chunk(mesh, cfg, env_params, carry, 40)
    assert int(carry.metrics.env_steps) == 80 * 16
    assert int(carry.learn_counter) > 0
    assert not bool(jnp.isnan(carry.last_loss))
    # Params must stay bitwise-replicated across the pmean updates:
    # compare every device's addressable shard, not just finiteness.
    w = carry.params["lstm"]["w_ih"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    assert len(shards) == 4
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert np.isfinite(shards[0]).all()


def test_spmd_hdqn(devices8):
    from merging_gym_tpu.agents import hdqn as H

    mesh = make_mesh(data=4, model=1, devices=devices8[:4])
    cfg = H.HDQNConfig(memory_capacity=64, goal_memory_capacity=16,
                       batch_size=8, opponent=D.OPP_SELFPLAY,
                       pmean_axis="data")
    env_params = EnvParams()
    carry = spmd.spmd_hdqn_init(jax.random.key(9), cfg, env_params,
                                num_envs=16, mesh=mesh)
    carry = spmd.spmd_hdqn_chunk(mesh, cfg, env_params, carry, 30)
    assert int(carry.metrics.env_steps) == 30 * 16
    carry = spmd.spmd_hdqn_chunk(mesh, cfg, env_params, carry, 30)
    assert int(carry.metrics.env_steps) == 60 * 16
    assert not bool(jnp.isnan(carry.lower.last_loss))
    assert int(carry.goal.max()) < 3
