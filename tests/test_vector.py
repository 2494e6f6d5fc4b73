"""Vectorised env tests: vmap consistency, auto-reset, scan rollout,
no-NaN property (SURVEY.md section 4c)."""

import jax
import jax.numpy as jnp
import numpy as np

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams, observe, reset, step
from merging_gym_tpu.core.vector import autoreset_step, reset_batch, rollout, step_batch


def test_vmap_matches_single_env():
    params = EnvParams()
    n = 16
    state = reset_batch(params, jax.random.key(0), n, jnp.float64)
    single = reset(params, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    for _ in range(300):
        a = jnp.asarray(rng.integers(-1, 5, size=(n, 2)), jnp.int32)
        a = a.at[0].set(a[3])  # make two rows identical
        state, ts = step_batch(params, state, a)
        single, ts1 = step(params, single, a[5])
        np.testing.assert_allclose(np.asarray(ts.obs[5]), np.asarray(ts1.obs), atol=0)
        np.testing.assert_array_equal(np.asarray(ts.rewards[0]), np.asarray(ts.rewards[3]))
        if bool(ts1.done):
            break


def test_autoreset_restores_start_state():
    params = EnvParams()
    n = 8
    state = reset_batch(params, jax.random.key(0), n, jnp.float64)
    # Drive env 0 to collision quickly (both constant speed converge).
    done_seen = False
    for i in range(200):
        a = jnp.tile(jnp.asarray([2, 2], jnp.int32), (n, 1))
        state, ts = autoreset_step(params, state, a, jax.random.key(i))
        if bool(ts.done[0]):
            done_seen = True
            # Post-reset state must equal the deterministic start.
            np.testing.assert_allclose(np.asarray(state.pos[0]),
                                       [C.START_POINT, C.START_POINT])
            np.testing.assert_allclose(np.asarray(state.vel[0]), [20.0, 20.0])
            assert int(state.t[0]) == 0 and int(state.winner[0]) == 0
            assert not bool(state.done[0])
            break
    assert done_seen


def test_rollout_scan_matches_loop():
    params = EnvParams()
    n = 4
    steps = 50

    def policy(ps, obs, key):
        a = jax.random.randint(key, (obs.shape[0], 2), 0, C.NUM_ACTIONS)
        return ps, a

    state0 = reset_batch(params, jax.random.key(1), n)
    (state_f, _), traj = jax.jit(
        lambda s, k: rollout(params, s, policy, None, k, steps)
    )(state0, jax.random.key(2))

    # Replay manually with the same keys.
    state = state0
    obs = jax.vmap(observe)(state)
    keys = jax.random.split(jax.random.key(2), steps)
    for i in range(steps):
        k_act, k_reset = jax.random.split(keys[i])
        _, a = policy(None, obs, k_act)
        state, ts = autoreset_step(params, state, a, k_reset)
        obs = jax.vmap(observe)(state)
        np.testing.assert_allclose(np.asarray(traj.rewards[i]), np.asarray(ts.rewards), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_f.pos), np.asarray(state.pos), rtol=1e-6, atol=1e-4)


def test_rollout_no_nans_long():
    params = EnvParams(random_start=True)
    n = 64

    def policy(ps, obs, key):
        a = jax.random.randint(key, (obs.shape[0], 2), -1, C.NUM_ACTIONS)
        return ps, a

    state = reset_batch(params, jax.random.key(3), n)
    (state, _), traj = jax.jit(
        lambda s, k: rollout(params, s, policy, None, k, 500)
    )(state, jax.random.key(4))
    assert not bool(jnp.isnan(traj.obs).any())
    assert not bool(jnp.isnan(traj.rewards).any())
    assert bool(traj.done.any())  # episodes do terminate and auto-reset
    assert not bool(jnp.isnan(state.pos).any())


def test_random_start_distribution():
    params = EnvParams(random_start=True)
    state = reset_batch(params, jax.random.key(5), 4096)
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    # P1: pos ~ N(50, 5), vel ~ N(20, 3) (merging_env.py:220)
    assert abs(pos[:, 0].mean() - 50) < 0.5 and 4 < pos[:, 0].std() < 6
    assert abs(vel[:, 0].mean() - 20) < 0.3 and 2.5 < vel[:, 0].std() < 3.5
    # P2: pos ~ U(46, 54), vel ~ U(15, 30) (merging_env.py:221)
    assert pos[:, 1].min() >= 46 and pos[:, 1].max() <= 54
    assert vel[:, 1].min() >= 15 and vel[:, 1].max() <= 30
    assert abs(vel[:, 1].mean() - 22.5) < 0.3


def test_rollout_collect_modes():
    params = EnvParams()
    n = 8

    def policy(ps, obs, key):
        return ps, jax.random.randint(key, (obs.shape[0], 2), 0, C.NUM_ACTIONS)

    state = reset_batch(params, jax.random.key(9), n)
    (_, _), full = jax.jit(
        lambda s, k: rollout(params, s, policy, None, k, 20, collect="full")
    )(state, jax.random.key(10))
    (_, _), rew = jax.jit(
        lambda s, k: rollout(params, s, policy, None, k, 20, collect="rewards")
    )(state, jax.random.key(10))
    (end_state, _), none = jax.jit(
        lambda s, k: rollout(params, s, policy, None, k, 20, collect="none")
    )(state, jax.random.key(10))
    rewards, done = rew
    np.testing.assert_allclose(np.asarray(rewards), np.asarray(full.rewards),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(done), np.asarray(full.done))
    assert none is None
    assert not bool(jnp.isnan(end_state.pos).any())
