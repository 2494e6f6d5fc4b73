"""Policy-in-kernel fused rollout vs the XLA scan path.

Greedy mode is deterministic, so the kernel (interpret mode on CPU) is
compared in lockstep against ``core.vector.rollout`` driving the same
Q-net through ``agents.policies.q_policy(greedy=True)``.  The
Phi(eps)-greedy mode uses the TPU PRNG and is exercised by the
benchmark drives, like ops.fused_rollout's PRNG mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents.policies import l0_policy, q_policy, two_player
from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import reset_batch, rollout
from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init
from merging_gym_tpu.ops import fused_policy_rollout as FPR


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FPR.pl, "pallas_call", patched)
    yield


def _params(seed):
    # Small-magnitude weights; with ~1e2-scale observation components the
    # resulting Q-gaps are O(1), far above any f32 layout-order jitter,
    # so greedy argmax is robust across the two implementations.
    p = qnet_init(jax.random.key(seed), C.OBS_DIM, C.NUM_ACTIONS)
    return jax.tree.map(lambda w: (w - jnp.mean(w)) * 0.05, p)


def _xla_reference(params1, policy2, T, N):
    pol1 = q_policy(qnet_apply, params1, greedy=True)
    policy_fn, pstate = two_player(pol1, policy2)
    ep = EnvParams()
    state = reset_batch(ep, jax.random.key(0), N)
    (_, _), traj = rollout(ep, state, policy_fn, pstate,
                           jax.random.key(1), T)
    return traj


def _compare(out, traj, T, check_p2_actions):
    acts = np.asarray(out["actions"])  # [T, 2, N]
    for t in range(T):
        np.testing.assert_array_equal(
            acts[t, 0], np.asarray(traj.actions[t, :, 0]),
            err_msg=f"p1 actions step {t}")
        if check_p2_actions:
            np.testing.assert_array_equal(
                acts[t, 1], np.asarray(traj.actions[t, :, 1]),
                err_msg=f"p2 actions step {t}")
        np.testing.assert_allclose(
            np.asarray(out["rewards"][t]).T, np.asarray(traj.rewards[t]),
            rtol=1e-6, atol=1e-6, err_msg=f"rewards step {t}")
        np.testing.assert_array_equal(np.asarray(out["done"][t]),
                                      np.asarray(traj.done[t]))
        np.testing.assert_array_equal(np.asarray(out["winner"][t]),
                                      np.asarray(traj.winner[t]))
        np.testing.assert_array_equal(np.asarray(out["collision"][t]),
                                      np.asarray(traj.collision[t]))


def test_greedy_vs_l0_matches_scan_path():
    T, N = 80, 128
    params1 = _params(0)
    out = FPR.fused_policy_rollout(T, N, params1, None, greedy=True)
    traj = _xla_reference(params1, l0_policy(), T, N)
    assert np.all(np.asarray(out["actions"])[:, 1] == C.ACTION_NONE)
    _compare(out, traj, T, check_p2_actions=False)


def test_greedy_selfplay_and_frozen_opponent():
    T, N = 80, 128
    params1, params2 = _params(1), _params(2)
    out = FPR.fused_policy_rollout(T, N, params1, params2, greedy=True)
    pol2 = q_policy(qnet_apply, params2, greedy=True)
    traj = _xla_reference(params1, pol2, T, N)
    _compare(out, traj, T, check_p2_actions=True)

    # Self-play: both arms share params; P2 must act on the swapped view,
    # so at the symmetric start both players pick the same action.
    out_sp = FPR.fused_policy_rollout(8, N, params1, params1, greedy=True)
    a0 = np.asarray(out_sp["actions"][0])
    np.testing.assert_array_equal(a0[0], a0[1])


def test_evaluate_fused_matches_evaluate():
    # Deterministic greedy + deterministic starts => every episode of a
    # matchup is identical, so both evaluators must report the same
    # rates and mean returns exactly.
    from merging_gym_tpu.agents.evaluate import evaluate, evaluate_fused

    params1, params2 = _params(4), _params(5)
    ep = EnvParams(max_steps=150)
    got = evaluate_fused(params1, params2, ep, num_envs=128, num_steps=160)
    assert got["episodes"] > 0
    pol1 = q_policy(qnet_apply, params1, greedy=True)
    pol2 = q_policy(qnet_apply, params2, greedy=True)
    want = evaluate(pol1, pol2, ep, jax.random.key(0), num_envs=128,
                    min_episodes=64, chunk_steps=160, max_chunks=1)
    for k in ("p1_first_rate", "p2_first_rate", "collision_rate",
              "timeout_rate", "mean_return_p1", "mean_return_p2"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-5, err_msg=k)


def test_episodes_terminate_and_autoreset():
    T, N = 2600, 128
    params1 = _params(3)
    out = FPR.fused_policy_rollout(T, N, params1, None, greedy=True,
                                   env_params=EnvParams(max_steps=100))
    done = np.asarray(out["done"])
    assert done.any(axis=0).all(), "every env must finish at least once"
    # After a done, the env restarts: the step counter forces another
    # done within max_steps, so dones recur at most 100 steps apart.
    first, last = done.argmax(axis=0), T - 1 - done[::-1].argmax(axis=0)
    assert (last - first <= 2500).all()
    per_env = done.sum(axis=0)
    assert (per_env >= T // 101).all()


def test_bf16_rollout_agrees_with_f32():
    """f32-vs-bf16 agreement for the policy-in-kernel rollout (VERDICT r4
    item 2).  With decisively separated last-layer biases the greedy
    argmax is dtype-independent, so the whole bf16 trajectory (actions,
    f32 env math, rewards, outcomes) must equal the f32 one exactly; a
    direct _mlp_t check locks the Q-agreement band itself (mirroring
    tests/test_dqn.py::test_bf16_forward_close_to_f32)."""
    import jax.numpy as jnp

    from merging_gym_tpu.ops.fused_policy_rollout import _mlp_t, _weight_args

    T, N = 60, 128
    params = _params(6)
    # Spread the output biases so argmax is decisive in either precision.
    params["fc2"]["b"] = params["fc2"]["b"] + jnp.arange(
        C.NUM_ACTIONS, dtype=jnp.float32) * 300.0
    out32 = FPR.fused_policy_rollout(T, N, params, params, greedy=True)
    out16 = FPR.fused_policy_rollout(T, N, params, params, greedy=True,
                                     compute_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(out16["actions"]),
                                  np.asarray(out32["actions"]))
    np.testing.assert_array_equal(np.asarray(out16["rewards"]),
                                  np.asarray(out32["rewards"]))
    np.testing.assert_array_equal(np.asarray(out16["done"]),
                                  np.asarray(out32["done"]))
    np.testing.assert_array_equal(np.asarray(out16["winner"]),
                                  np.asarray(out32["winner"]))

    # Q-band: bf16-stored weights + bf16 activations track f32 Q-values
    # within bf16 resolution (f32 MXU accumulation).
    p2 = _params(7)
    obs = jax.random.normal(jax.random.key(3), (10, 256), jnp.float32) * 50.0
    w32 = [jnp.asarray(a) for a in _weight_args(p2)]
    w16 = [jnp.asarray(a) for a in _weight_args(p2, jnp.bfloat16)]
    class _R:  # minimal ref shim: _mlp_t reads w[:]
        def __init__(self, a): self.a = a
        def __getitem__(self, k): return self.a[k]
    q32 = _mlp_t(obs, *[_R(a) for a in w32])
    q16 = _mlp_t(obs, *[_R(a) for a in w16], dtype=jnp.bfloat16)
    assert q16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(q16), np.asarray(q32),
                               rtol=5e-2, atol=5e-2)


def test_evaluate_fused_bf16_matches_f32_under_decisive_bias():
    """evaluate_fused's compute_dtype plumbing: with decisively separated
    output biases both precisions play identical matches, so the outcome
    dicts must be equal."""
    import jax.numpy as jnp

    from merging_gym_tpu.agents.evaluate import evaluate_fused

    params = _params(8)
    params["fc2"]["b"] = params["fc2"]["b"] + jnp.arange(
        C.NUM_ACTIONS, dtype=jnp.float32) * 300.0
    ep = EnvParams(max_steps=150)
    a = evaluate_fused(params, params, ep, num_envs=128, num_steps=160)
    b = evaluate_fused(params, params, ep, num_envs=128, num_steps=160,
                       compute_dtype="bfloat16")
    assert a == b
    assert a["episodes"] > 0
