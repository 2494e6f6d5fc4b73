"""Learner math of the single-kernel DRQN trainer vs jax.grad + optax.

The hand-derived truncated-BPTT backprop (through the fc1-fc2-LSTM-
fc3-fc4 unroll, per-timestep Double-DQN targets, burn-in + first-done
masks) plus Adam in ops.fused_drqn.drqn_learn_math is pure jnp and is
locked here against the autodiff reference: jax.grad of
agents.drqn.drqn_loss (the XLA trainer's exact loss) + optax.adam,
over multiple steps -- the pattern of tests/test_fused_trainer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from merging_gym_tpu.agents import drqn as DR
from merging_gym_tpu.nn.lstm import drqn_init
from merging_gym_tpu.ops import fused_drqn as FD


def _rand_batch(rng, B, L, scale=5.0):
    """Windows with realistic done patterns: some end mid-window (so the
    first-done mask actually masks), some not at all."""
    done = np.zeros((B, L), bool)
    ends = rng.integers(0, 2 * L, B)          # > L-1 means no in-window end
    for b in range(B):
        if ends[b] < L:
            done[b, ends[b]] = True
    return {
        "obs": rng.standard_normal((B, L + 1, 10)).astype(np.float32) * scale,
        "action": rng.integers(0, 5, (B, L)).astype(np.int32),
        "reward": rng.standard_normal((B, L)).astype(np.float32),
        "done": done,
    }


def _to_env_last(batch, L):
    return {
        "obs": [jnp.asarray(batch["obs"][:, t].T) for t in range(L + 1)],
        "action": jnp.asarray(batch["action"].T),
        "reward": jnp.asarray(batch["reward"].T),
        "done": jnp.asarray(batch["done"].T, jnp.float32),
    }


@pytest.mark.parametrize("burn_in", [0, 4])
def test_drqn_learn_math_matches_autodiff_optax(burn_in):
    L = 8
    cfg = DR.DRQNConfig(lr=0.01, gamma=0.9, seq_len=L, burn_in=burn_in)
    rng = np.random.default_rng(0)
    params = drqn_init(jax.random.key(1), 10, 5)
    target = drqn_init(jax.random.key(2), 10, 5)
    # Centre + shrink (the U(0,1) fc1/fc2 init saturates the LSTM, which
    # would zero most tanh/sigmoid gradients and weaken the test).
    shrink = lambda t: jax.tree.map(
        lambda w: (w.astype(jnp.float32) - jnp.mean(w)) * 0.4, t)
    params, target = shrink(params), shrink(target)

    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    p = FD.drqn_params_to_t(params)
    tp = FD.drqn_params_to_t(target)
    m = tuple(jnp.zeros_like(a) for a in p)
    v = tuple(jnp.zeros_like(a) for a in p)

    for step in range(3):
        batch = _rand_batch(rng, 128, L)

        loss_ref, grads = jax.value_and_grad(DR.drqn_loss)(
            params, target, jax.tree.map(jnp.asarray, batch), cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        p, m, v, loss = FD.drqn_learn_math(
            p, tp, m, v, _to_env_last(batch, L), jnp.int32(step + 1),
            gamma=cfg.gamma, lr=cfg.lr, num_actions=5, seq_len=L,
            burn_in=burn_in)

        np.testing.assert_allclose(float(loss), float(loss_ref),
                                   rtol=1e-4, err_msg=f"loss step {step}")
        got = FD.t_to_drqn_params(p)
        flat_got = jax.tree.leaves_with_path(got)
        flat_want = {jax.tree_util.keystr(k): np.asarray(w, np.float64)
                     for k, w in jax.tree.leaves_with_path(params)}
        for key, a in flat_got:
            ks = jax.tree_util.keystr(key)
            a = np.asarray(a, np.float64)
            b = flat_want[ks]
            # Same outlier policy as test_fused_trainer: Adam's early
            # steps are chaotic in f32 near |g| ~ eps, so bound the
            # outlier fraction and cap the worst element at 5% of a step.
            err = np.abs(a - b)
            loose = err > (5e-5 + 2e-4 * np.abs(b))
            assert loose.mean() <= 2e-3, (
                f"{ks} step {step}: {loose.sum()}/{loose.size} beyond tol")
            assert err.max() < 0.05 * cfg.lr, (
                f"{ks} step {step}: max |diff| {err.max():.2e}")


def test_drqn_param_layout_roundtrip():
    params = drqn_init(jax.random.key(0), 10, 5)
    back = FD.t_to_drqn_params(FD.drqn_params_to_t(params))
    for pa, pb in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa, np.float32),
                                      np.asarray(pb))


def test_slab_to_batch_roundtrip():
    """slab_to_batch inverts the kernel's window slot layout."""
    L, B = 4, 8
    rng = np.random.default_rng(3)
    obs = rng.standard_normal((L + 1, 10, B)).astype(np.float32)
    action = rng.integers(0, 5, (L, B)).astype(np.int32)
    reward = rng.standard_normal((L, B)).astype(np.float32)
    done = (rng.random((L, B)) < 0.3).astype(np.float32)
    slab = np.zeros(((L + 1) * FD.SLOT, B), np.float32)
    for s in range(L + 1):
        slab[s * FD.SLOT:s * FD.SLOT + 10] = obs[s]
        if s >= 1:
            slab[s * FD.SLOT + 10] = action[s - 1]
            slab[s * FD.SLOT + 11] = reward[s - 1]
            slab[s * FD.SLOT + 12] = done[s - 1]
    batch = FD.slab_to_batch(jnp.asarray(slab), L)
    for t in range(L + 1):
        np.testing.assert_array_equal(np.asarray(batch["obs"][t]), obs[t])
    np.testing.assert_array_equal(np.asarray(batch["action"]), action)
    np.testing.assert_array_equal(np.asarray(batch["reward"]), reward)
    np.testing.assert_array_equal(np.asarray(batch["done"]), done)
