"""Golden-trajectory parity: the jitted env (x64) against the float64
oracle -- observations, rewards, done/winner/collision event sequences
(SURVEY.md section 4b, BASELINE.json parity config 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams, observe, reset, step
from merging_gym_tpu.core.oracle import OracleMergeEnv

JIT_STEP = jax.jit(step)


def run_pair(action_seq, params=None, max_steps=4000):
    """Run oracle and jax env in lockstep until the oracle reports done."""
    params = params or EnvParams()
    oracle = OracleMergeEnv(*params.reward_tuple())
    state = reset(params, dtype=jnp.float64)

    obs_o = oracle.reset()
    obs_j = observe(state)
    np.testing.assert_allclose(np.asarray(obs_j), obs_o, atol=1e-9)

    for i in range(max_steps):
        a1, a2 = action_seq(i, obs_o)
        obs_o, r_o, done_o, info_o = oracle.step(a1, a2)
        a2j = C.ACTION_NONE if a2 is None else a2
        state, ts = JIT_STEP(params, state, jnp.asarray([a1, a2j], jnp.int32))

        np.testing.assert_allclose(np.asarray(ts.obs), obs_o, atol=1e-9,
                                   err_msg=f"obs mismatch at step {i}")
        np.testing.assert_allclose(np.asarray(ts.rewards), r_o, atol=1e-9,
                                   err_msg=f"reward mismatch at step {i}")
        assert bool(ts.done) == done_o, f"done mismatch at step {i}"
        assert bool(ts.collision) == info_o["collision"], f"collision mismatch at step {i}"
        w = int(ts.winner)
        assert (oracle.winner or 0) == w, f"winner mismatch at step {i}"
        if done_o:
            np.testing.assert_allclose(float(state.r_acc[0]), oracle.r1_accumulate, atol=1e-9)
            np.testing.assert_allclose(float(state.r_acc[1]), oracle.r2_accumulate, atol=1e-9)
            return i + 1
    raise AssertionError("episode did not terminate")


def test_parity_l0_opponent_constant_ego():
    # Ego holds target 40; P2 is the None/L0 opponent. Ego wins, then P2
    # coasts to the line -> RSecond + done.
    n = run_pair(lambda i, o: (4, None))
    assert n > 40


def test_parity_both_constant_equal_speed_collision():
    # Identical actions keep the cars abreast; lanes converge -> collision.
    n = run_pair(lambda i, o: (2, 2))
    assert n > 10


def test_parity_ego_slow_opponent_fast():
    n = run_pair(lambda i, o: (1, 4))
    assert n > 20


def test_parity_full_stop_timeout():
    # Both brake to zero: nobody crosses, collision never happens
    # (laterally separated at standstill) -> timeout at step 2501.
    n = run_pair(lambda i, o: (0, 0), max_steps=2600)
    assert n == C.TIMEOUT_STEPS


def test_parity_winner_overwrite_zero_reward():
    # Ego crosses first and keeps driving: its per-step reward is
    # overwritten to 0 each step after winning (merging_env.py:167-168).
    params = EnvParams()
    oracle = OracleMergeEnv()
    state = reset(params, dtype=jnp.float64)
    won_steps = 0
    for i in range(4000):
        already_won = oracle.winner == 1
        obs_o, r_o, done_o, _ = oracle.step(4, 1)
        state, ts = JIT_STEP(params, state, jnp.asarray([4, 1], jnp.int32))
        np.testing.assert_allclose(np.asarray(ts.rewards), r_o, atol=1e-9)
        if already_won and not done_o:
            won_steps += 1
            assert r_o[0] == 0.0
            assert float(ts.rewards[0]) == 0.0
        if done_o:
            assert bool(ts.done)
            break
    assert won_steps > 5


def test_parity_random_policies():
    rng = np.random.default_rng(12345)
    for ep in range(8):
        def seq(i, obs, rng=rng):
            a1 = int(rng.integers(0, 5))
            a2 = None if rng.random() < 0.2 else int(rng.integers(0, 5))
            return a1, a2
        run_pair(seq)


def test_parity_reward_params_sweep():
    params = EnvParams(r_first=5.0, r_second=0.5, r_collision=-100.0,
                       vel_penalty=0.01)
    oracle = OracleMergeEnv(5.0, 0.5, -100.0, 0.01)
    state = reset(params, dtype=jnp.float64)
    for i in range(4000):
        obs_o, r_o, done_o, _ = oracle.step(3, 2)
        state, ts = JIT_STEP(params, state, jnp.asarray([3, 2], jnp.int32))
        np.testing.assert_allclose(np.asarray(ts.rewards), r_o, atol=1e-9)
        if done_o:
            break
    assert done_o


def test_simultaneous_cross_tie_break():
    """Both cross in the same step from a winner-less state: player 1 is
    checked first (merging_env.py:163-181), so P1 gets RFirst, P2 gets
    RSecond, and the episode ends."""
    params = EnvParams()
    oracle = OracleMergeEnv()
    # Drive both identically is collision; instead place them by simulating
    # asymmetric speed then re-syncing is fiddly -- exercise via oracle
    # state surgery mirrored into the jax state.
    oracle.state1["pos"] = 949.9
    oracle.state2["pos"] = 949.9
    oracle.state1["vel"] = 30.0
    oracle.state2["vel"] = 10.0  # laterally still near merge -> collision?
    state = reset(params, dtype=jnp.float64)
    state = state.replace(pos=jnp.asarray([949.9, 949.9]),
                          vel=jnp.asarray([30.0, 10.0]))
    obs_o, r_o, done_o, info_o = oracle.step(4, 4)
    state, ts = JIT_STEP(params, state, jnp.asarray([4, 4], jnp.int32))
    np.testing.assert_allclose(np.asarray(ts.rewards), r_o, atol=1e-9)
    assert bool(ts.done) == done_o
    assert int(ts.winner) == oracle.winner
    assert oracle.winner == 1


def test_timeout_step_count_matches_float_accumulation():
    """TIMEOUT_STEPS encodes the reference's f64 time accumulation."""
    t, k = 0.0, 0
    while t <= C.TIME_LIMIT:
        t += C.DT
        k += 1
    assert k == C.TIMEOUT_STEPS
