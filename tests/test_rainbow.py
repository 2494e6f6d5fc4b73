"""Rainbow tests: C51 projection vs a torch-faithful numpy oracle, noisy
layer statistics, PER sampling distribution, end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents import rainbow as R
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.nn.noisy import noisy_apply, noisy_init, noisy_sample_noise
from merging_gym_tpu.nn.rainbow_net import (rainbow_apply, rainbow_init,
                                            rainbow_q_values,
                                            rainbow_sample_noise, support)
from merging_gym_tpu.ops import per as per_ops
from merging_gym_tpu.ops.projection import categorical_projection


def _np_projection(next_dist, rewards, dones, vmin=-10.0, vmax=10.0,
                   num_atoms=51, weight=True):
    """Numpy re-statement of ranbowdqn.py:554-582 (post action-gather).

    ``weight=False`` is the textbook variant with mass conserved on exact
    atom hits (which the clip to [vmin, vmax] makes common)."""
    delta_z = (vmax - vmin) / (num_atoms - 1)
    sup = np.linspace(vmin, vmax, num_atoms)
    mass = next_dist * sup if weight else next_dist
    B = next_dist.shape[0]
    tz = rewards[:, None] + (1 - dones[:, None]) * 0.99 * sup[None, :]
    tz = np.clip(tz, vmin, vmax)
    b = (tz - vmin) / delta_z
    lo = np.floor(b).astype(int)
    hi = np.ceil(b).astype(int)
    proj = np.zeros_like(mass)
    for i in range(B):
        for j in range(num_atoms):
            lo_w = hi[i, j] - b[i, j]
            if not weight and lo[i, j] == hi[i, j]:
                lo_w += 1.0
            proj[i, lo[i, j]] += mass[i, j] * lo_w
            proj[i, hi[i, j]] += mass[i, j] * (b[i, j] - lo[i, j])
    return proj


def test_projection_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B = 16
    logits = rng.normal(size=(B, 51))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    rewards = rng.normal(size=B) * 3
    dones = (rng.random(B) < 0.3).astype(np.float64)
    for weight in (True, False):
        expect = _np_projection(probs, rewards, dones, weight=weight)
        got = categorical_projection(
            jnp.asarray(probs), jnp.asarray(rewards), jnp.asarray(dones),
            support(jnp.float64), 0.99, weight)
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-8)


def test_projection_on_support_atom_edge():
    """When Tz lands exactly on an atom, lo == hi and both interpolation
    weights are zero: the reference *loses* that mass (ranbowdqn.py:
    572-580).  Faithful mode reproduces the loss; textbook mode conserves
    it on the exact atom."""
    probs = np.full((1, 51), 1 / 51.0)
    # done=1 -> Tz = 0 for every atom, which is exactly atom 25.
    faithful = categorical_projection(
        jnp.asarray(probs), jnp.zeros(1), jnp.ones(1),
        support(jnp.float64), 0.99, True)
    assert abs(float(faithful.sum())) < 1e-9  # reference mass loss

    textbook = categorical_projection(
        jnp.asarray(probs), jnp.zeros(1), jnp.ones(1),
        support(jnp.float64), 0.99, False)
    g = np.asarray(textbook)[0]
    assert abs(g[25] - 1.0) < 1e-9
    assert abs(g.sum() - 1.0) < 1e-9


def test_noisy_layer_statistics_and_eval_mode():
    p = noisy_init(jax.random.key(0), 64, 64, std_init=0.4)
    k = 1 / np.sqrt(64)
    w = np.asarray(p["w_mu"])
    assert w.min() >= -k - 1e-6 and w.max() <= k + 1e-6
    np.testing.assert_allclose(np.asarray(p["w_sigma"]), 0.4 / np.sqrt(64))
    x = jnp.ones((3, 64), jnp.float32)
    out_eval = noisy_apply(p, x, None)
    noise = noisy_sample_noise(jax.random.key(1), 64, 64)
    out_noisy = noisy_apply(p, x, noise)
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_noisy))
    # factorised noise: rank-1 weight epsilon
    eps = np.asarray(noise["w_eps"])
    assert np.linalg.matrix_rank(eps, tol=1e-5) == 1


def test_rainbow_net_shapes_and_simplex():
    params = rainbow_init(jax.random.key(0), 10, 5)
    noise = rainbow_sample_noise(jax.random.key(1), 5)
    x = jax.random.normal(jax.random.key(2), (7, 10), jnp.float32)
    dist = rainbow_apply(params, x, noise)
    assert dist.shape == (7, 5, 51)
    np.testing.assert_allclose(np.asarray(dist.sum(-1)), 1.0, atol=1e-5)
    q = rainbow_q_values(dist)
    assert q.shape == (7, 5)


def test_per_sampling_proportional():
    example = {"v": jnp.zeros((), jnp.float32)}
    st = per_ops.per_init(8, example, alpha=1.0)
    items = {"v": jnp.arange(8, dtype=jnp.float32)}
    st = per_ops.per_add_batch(st, items)
    # Set priorities 1..8; sampling frequency must be ~proportional.
    st = per_ops.per_update_priorities(
        st, jnp.arange(8), jnp.arange(1.0, 9.0))
    counts = np.zeros(8)
    for i in range(64):
        batch, idx, w = per_ops.per_sample(st, jax.random.key(i), 128, beta=1.0)
        np.testing.assert_array_equal(np.asarray(batch["v"]), np.asarray(idx))
        counts += np.bincount(np.asarray(idx), minlength=8)
    freq = counts / counts.sum()
    expect = np.arange(1.0, 9.0) / 36.0
    np.testing.assert_allclose(freq, expect, atol=0.01)
    # IS weights: w_i ∝ (p_i)^-beta normalised by max -> max weight == 1.
    _, idx, w = per_ops.per_sample(st, jax.random.key(99), 256, beta=0.5)
    assert np.asarray(w).max() <= 1.0 + 1e-5


def test_rainbow_end_to_end():
    cfg = R.RainbowConfig(memory_capacity=256, batch_size=16)
    env_params = EnvParams()
    carry = R.rainbow_train_init(jax.random.key(0), cfg, env_params, 16)
    carry = R.rainbow_train_chunk(cfg, env_params, carry, 48)
    assert int(carry.metrics.env_steps) == 48 * 16
    assert not bool(jnp.isnan(carry.last_loss))
    q = rainbow_q_values(rainbow_apply(carry.params, carry.obs, carry.noise))
    assert not bool(jnp.isnan(q).any())


def test_rainbow_per_nstep_end_to_end():
    cfg = R.RainbowConfig(memory_capacity=256, batch_size=16, per=True,
                          n_step=3)
    env_params = EnvParams()
    carry = R.rainbow_train_init(jax.random.key(1), cfg, env_params, 8)
    carry = R.rainbow_train_chunk(cfg, env_params, carry, 48)
    assert not bool(jnp.isnan(carry.last_loss))
    assert int(carry.replay.base.cursor) > 0


def test_rainbow_opponent_modes():
    """L0 and frozen-Q-net opponents (the level-k workflow the DQN
    trainer has, main.py:161-168, now first-class for Rainbow too)."""
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core import constants as C
    from merging_gym_tpu.nn.mlp import qnet_init

    env_params = EnvParams()

    cfg = R.RainbowConfig(memory_capacity=256, batch_size=16,
                          opponent=D.OPP_L0)
    carry = R.rainbow_train_init(jax.random.key(2), cfg, env_params, 8)
    p0 = carry.params
    carry = R.rainbow_train_chunk(cfg, env_params, carry, 48)
    assert not bool(jnp.isnan(carry.last_loss))
    assert any(bool(jnp.any(a != b)) for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(carry.params)))

    opp = qnet_init(jax.random.key(3), C.OBS_DIM, C.NUM_ACTIONS)
    cfg = R.RainbowConfig(memory_capacity=256, batch_size=16,
                          opponent=D.OPP_FROZEN)
    carry = R.rainbow_train_init(jax.random.key(4), cfg, env_params, 8, opp)
    carry = R.rainbow_train_chunk(cfg, env_params, carry, 48)
    assert not bool(jnp.isnan(carry.last_loss))
    # Frozen params must pass through the scan untouched.
    for a, b in zip(jax.tree.leaves(opp), jax.tree.leaves(carry.opp_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError):
        R.rainbow_train_init(jax.random.key(5), cfg, env_params, 8)


def test_rainbow_obs_scale():
    """obs_scale conditions the net without changing anything else: the
    scaled config must produce finite loss and a LIVE advantage stream
    (Q-values not all tied) where the raw-obs net is prone to collapse;
    and rainbow_policy(obs_scale=s) must act identically to scaling the
    obs by hand."""
    from merging_gym_tpu.agents.policies import rainbow_policy

    cfg = R.RainbowConfig(memory_capacity=256, batch_size=16,
                          obs_scale=0.01, epsilon=0.7,
                          opponent=__import__(
                              'merging_gym_tpu.agents.dqn',
                              fromlist=['OPP_L0']).OPP_L0)
    env_params = EnvParams()
    carry = R.rainbow_train_init(jax.random.key(6), cfg, env_params, 8)
    carry = R.rainbow_train_chunk(cfg, env_params, carry, 48)
    assert not bool(jnp.isnan(carry.last_loss))
    q = rainbow_q_values(rainbow_apply(carry.params, carry.obs * 0.01,
                                       carry.noise))
    assert bool(jnp.any(jnp.abs(q - q[:, :1]) > 1e-6)), "Q all tied"

    pol = rainbow_policy(carry.params, greedy=True, obs_scale=0.01)
    obs = carry.obs[0]
    a = pol.act(pol.params, obs, jax.random.key(0))
    q1 = rainbow_q_values(rainbow_apply(carry.params, obs * 0.01))
    assert int(a) == int(jnp.argmax(q1))
