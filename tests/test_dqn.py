"""DQN agent tests: init scheme, target-sync timing, TD loss descent,
epsilon quirk statistics, and a short end-to-end jitted training run."""

import jax
import jax.numpy as jnp
import numpy as np

from merging_gym_tpu.agents import dqn as D
from merging_gym_tpu.agents.policies import eps_greedy_from_q
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init
from merging_gym_tpu.ops import replay as rp


def test_qnet_init_scheme():
    p = qnet_init(jax.random.key(0), 10, 5)
    # Weights U(0,1) (main.py:35-39); biases torch-default U(-k, k).
    w = np.asarray(p["fc0"]["w"])
    assert w.shape == (10, 200) and w.min() >= 0.0 and w.max() <= 1.0
    b = np.asarray(p["fc0"]["b"])
    k = 1 / np.sqrt(10)
    assert b.min() >= -k and b.max() <= k and b.min() < 0 < b.max()
    assert p["fc1"]["w"].shape == (200, 100)
    assert p["fc2"]["w"].shape == (100, 5)


def test_eps_greedy_quirk_statistics():
    # P(greedy) = Phi(0.7) ~ 0.758 (main.py:105).
    q = jnp.asarray([0.0, 0.0, 10.0, 0.0, 0.0])
    keys = jax.random.split(jax.random.key(1), 20000)
    acts = jax.vmap(lambda k: eps_greedy_from_q(q, k))(keys)
    frac_greedy_action = float(jnp.mean(acts == 2))
    import math
    phi = 0.5 * (1 + math.erf(0.7 / math.sqrt(2)))
    expect = phi + (1 - phi) / 5  # random branch also picks 2 sometimes
    assert abs(frac_greedy_action - expect) < 0.02


def test_target_sync_every_100():
    cfg = D.DQNConfig(memory_capacity=64, batch_size=8)
    st = D.dqn_init(jax.random.key(0), cfg)
    # eval and target are independently initialised (main.py:80)
    assert not np.allclose(np.asarray(st.params["fc0"]["w"]),
                           np.asarray(st.target_params["fc0"]["w"]))
    batch = {
        "obs": jnp.ones((8, 10), jnp.float32),
        "action": jnp.zeros((8,), jnp.int32),
        "reward": jnp.zeros((8,), jnp.float32),
        "next_obs": jnp.ones((8, 10), jnp.float32),
        "done": jnp.zeros((8,), bool),
    }
    st1 = D.learn(st, batch, cfg)
    # First learn syncs target to pre-update eval params (main.py:125-126).
    np.testing.assert_allclose(np.asarray(st1.target_params["fc0"]["w"]),
                               np.asarray(st.params["fc0"]["w"]))
    st2 = D.learn(st1, batch, cfg)
    # Second learn must NOT sync (counter 1 % 100 != 0).
    np.testing.assert_allclose(np.asarray(st2.target_params["fc0"]["w"]),
                               np.asarray(st1.target_params["fc0"]["w"]))
    assert int(st2.learn_counter) == 2


def test_td_loss_decreases_on_fixed_batch():
    cfg = D.DQNConfig(lr=0.001)
    st = D.dqn_init(jax.random.key(2), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "obs": jnp.asarray(rng.normal(size=(128, 10)), jnp.float32),
        "action": jnp.asarray(rng.integers(0, 5, 128), jnp.int32),
        "reward": jnp.asarray(rng.normal(size=128), jnp.float32),
        "next_obs": jnp.asarray(rng.normal(size=(128, 10)), jnp.float32),
        "done": jnp.zeros((128,), bool),
    }
    learn = jax.jit(lambda s: D.learn(s, batch, cfg))
    st = learn(st)
    first = float(st.last_loss)
    for _ in range(200):
        st = learn(st)
    assert float(st.last_loss) < first * 0.5


def test_end_to_end_training_chunk():
    cfg = D.DQNConfig(memory_capacity=512, batch_size=32, opponent=D.OPP_L0)
    env_params = EnvParams()
    carry = D.train_init(jax.random.key(3), cfg, env_params, num_envs=32)
    carry = D.train_chunk(cfg, env_params, carry, 64)
    assert int(carry.metrics.env_steps) == 64 * 32
    assert int(carry.replay.cursor) > 0
    # After 16 steps the 512-slot ring is full (32 envs/step) -> learning ran.
    assert int(carry.dqn.learn_counter) > 0
    assert not bool(jnp.isnan(carry.dqn.last_loss))
    q = qnet_apply(carry.dqn.params, carry.obs)
    assert not bool(jnp.isnan(q).any())


def test_sample_valid_corrected_mode():
    # Corrected replay mode (main.py:130,213-214 quirk pair): draws come
    # from filled slots only and learning starts at one stored batch,
    # not at buffer-full.  16 steps x 32 envs = 512 stores << 8192
    # capacity: the faithful gate stays shut, the corrected one opens.
    env_params = EnvParams()
    for sample_valid, expect_learns in ((False, 0), (True, 1)):
        cfg = D.DQNConfig(memory_capacity=8192, batch_size=32,
                          opponent=D.OPP_L0, sample_valid=sample_valid)
        carry = D.train_init(jax.random.key(3), cfg, env_params, num_envs=32)
        carry = D.train_chunk(cfg, env_params, carry, 16)
        if expect_learns:
            assert int(carry.dqn.learn_counter) > 0
            assert not bool(jnp.isnan(carry.dqn.last_loss))
        else:
            assert int(carry.dqn.learn_counter) == 0


def test_selfplay_and_frozen_modes_compile():
    env_params = EnvParams()
    for mode in (D.OPP_SELFPLAY, D.OPP_FROZEN):
        cfg = D.DQNConfig(memory_capacity=128, batch_size=16, opponent=mode)
        opp = qnet_init(jax.random.key(9), cfg.obs_dim, cfg.num_actions, cfg.hidden)
        carry = D.train_init(jax.random.key(4), cfg, env_params, 8,
                             opp_params=opp if mode == D.OPP_FROZEN else None)
        carry = D.train_chunk(cfg, env_params, carry, 20)
        assert int(carry.metrics.env_steps) == 160


def test_bf16_compute_trains_with_f32_master_params():
    """Mixed precision: forwards in bf16, master params/opt state f32.

    bf16 is opt-in (compute_dtype); defaults are unchanged f32."""
    cfg = D.DQNConfig(memory_capacity=512, batch_size=32, opponent=D.OPP_L0,
                      compute_dtype="bfloat16")
    env_params = EnvParams()
    carry = D.train_init(jax.random.key(3), cfg, env_params, num_envs=32)
    carry = D.train_chunk(cfg, env_params, carry, 64)
    assert int(carry.dqn.learn_counter) > 0
    assert not bool(jnp.isnan(carry.dqn.last_loss))
    # Master params and Adam moments never leave f32.
    for leaf in jax.tree.leaves(carry.dqn.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(carry.dqn.opt_state):
        assert jnp.issubdtype(leaf.dtype, jnp.integer) or leaf.dtype == jnp.float32


def test_bf16_forward_close_to_f32():
    """A bf16 forward of the same params tracks the f32 Q-values within
    bf16 resolution (the MXU still accumulates in f32, nn/mlp.py)."""
    cfg32 = D.DQNConfig()
    cfg16 = D.DQNConfig(compute_dtype="bfloat16")
    params = qnet_init(jax.random.key(0), cfg32.obs_dim, cfg32.num_actions)
    obs = jax.random.normal(jax.random.key(1), (64, cfg32.obs_dim), jnp.float32)
    q32 = D._qnet_fwd(params, obs, cfg32)
    q16 = D._qnet_fwd(params, obs, cfg16)
    assert q16.dtype == jnp.float32
    # U(0,1) weights give Q ~ O(1e2); bf16 keeps ~2-3 significant digits
    # and rounding compounds across the three layers.
    np.testing.assert_allclose(np.asarray(q16), np.asarray(q32),
                               rtol=5e-2, atol=5e-2)
