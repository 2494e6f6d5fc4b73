"""Learner math of the single-kernel DQN trainer vs jax.grad + optax.

The kernel itself needs the TPU PRNG (driven on hardware, see
docs/BENCHMARKS.md); what must be *exactly* right is the hand-derived
backprop + Adam in ops.fused_trainer.learn_math, which is pure jnp and
is locked here against the autodiff reference (agents.dqn.td_loss
gradients + optax.adam with torch defaults) over multiple steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from merging_gym_tpu.agents import dqn as D
from merging_gym_tpu.nn.mlp import qnet_init
from merging_gym_tpu.ops import fused_trainer as FT


def _rand_batch(rng, n):
    return {
        "obs": rng.standard_normal((n, 10)).astype(np.float32) * 20.0,
        "action": rng.integers(0, 5, n).astype(np.int32),
        "reward": rng.standard_normal(n).astype(np.float32),
        "next_obs": rng.standard_normal((n, 10)).astype(np.float32) * 20.0,
        "done": rng.random(n) < 0.1,
    }


@pytest.mark.parametrize("mask_terminal", [False, True])
def test_learn_math_matches_autodiff_optax(mask_terminal):
    cfg = D.DQNConfig(lr=0.01, gamma=0.9, mask_terminal=mask_terminal)
    rng = np.random.default_rng(0)
    params = qnet_init(jax.random.key(1), 10, 5)
    target = qnet_init(jax.random.key(2), 10, 5)
    params = jax.tree.map(lambda w: (w.astype(jnp.float32) - 0.5) * 0.1, params)
    target = jax.tree.map(lambda w: (w.astype(jnp.float32) - 0.5) * 0.1, target)

    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    p = FT.params_to_t(params)
    tp = FT.params_to_t(target)
    m = tuple(jnp.zeros_like(a) for a in p)
    v = tuple(jnp.zeros_like(a) for a in p)

    for step in range(3):
        batch = _rand_batch(rng, 256)

        # Autodiff + optax reference path (exactly agents.dqn.learn's
        # update, without the target-sync wrapper).
        loss_ref, grads = jax.value_and_grad(D.td_loss)(
            params, target, jax.tree.map(jnp.asarray, batch), cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # Manual path on the transposed env-last layout.
        batch_t = {
            "obs": jnp.asarray(batch["obs"].T),
            "next_obs": jnp.asarray(batch["next_obs"].T),
            "action": jnp.asarray(batch["action"]),
            "reward": jnp.asarray(batch["reward"]),
            "done": jnp.asarray(batch["done"]),
        }
        p, m, v, loss = FT.learn_math(
            p, tp, m, v, batch_t, jnp.int32(step + 1), gamma=cfg.gamma,
            lr=cfg.lr, num_actions=5, mask_terminal=mask_terminal)

        np.testing.assert_allclose(float(loss), float(loss_ref),
                                   rtol=1e-5, err_msg=f"loss step {step}")
        got = FT.t_to_params(p)
        for name in ("fc0", "fc1", "fc2"):
            for leaf in ("w", "b"):
                a = np.asarray(got[name][leaf], np.float64)
                b = np.asarray(params[name][leaf], np.float64)
                # Adam's t=1 update lr*g/(|g|+eps) is chaotic in f32 for
                # near-zero gradients (sensitivity ~lr/eps at |g|~eps), so
                # isolated elements can drift by a few 1e-4 from reduction-
                # order noise alone.  A real math bug moves MANY elements by
                # a full step (lr=1e-2): require <=0.1% outliers beyond the
                # tight tolerance and cap the worst element at 5% of a step.
                err = np.abs(a - b)
                loose = err > (5e-5 + 2e-4 * np.abs(b))
                assert loose.mean() <= 1e-3, (
                    f"{name}/{leaf} step {step}: {loose.sum()}/{loose.size} "
                    f"elements beyond tight tolerance")
                assert err.max() < 0.05 * cfg.lr, (
                    f"{name}/{leaf} step {step}: max |diff| {err.max():.2e}")


def test_param_layout_roundtrip():
    params = qnet_init(jax.random.key(0), 10, 5)
    back = FT.t_to_params(FT.params_to_t(params))
    for name in ("fc0", "fc1", "fc2"):
        np.testing.assert_array_equal(np.asarray(params[name]["w"], np.float32),
                                      np.asarray(back[name]["w"]))
        np.testing.assert_array_equal(np.asarray(params[name]["b"], np.float32),
                                      np.asarray(back[name]["b"]))


def test_learn_math_bf16_agrees_with_f32():
    """f32-vs-bf16 agreement lock (VERDICT r4 item 2), mirroring
    tests/test_dqn.py's pattern for the XLA path: the bf16 learner's loss
    tracks f32 within bf16 resolution, masters/moments stay f32, and the
    Adam update moves every clearly-moving element in the same direction.
    """
    cfg = D.DQNConfig(lr=0.01, gamma=0.9)
    rng = np.random.default_rng(7)
    params = qnet_init(jax.random.key(11), 10, 5)
    target = qnet_init(jax.random.key(12), 10, 5)
    params = jax.tree.map(lambda w: (w.astype(jnp.float32) - 0.5) * 0.1, params)
    target = jax.tree.map(lambda w: (w.astype(jnp.float32) - 0.5) * 0.1, target)
    p = FT.params_to_t(params)
    tp = FT.params_to_t(target)
    m = tuple(jnp.zeros_like(a) for a in p)
    v = tuple(jnp.zeros_like(a) for a in p)
    batch = _rand_batch(rng, 256)
    batch_t = {
        "obs": jnp.asarray(batch["obs"].T),
        "next_obs": jnp.asarray(batch["next_obs"].T),
        "action": jnp.asarray(batch["action"]),
        "reward": jnp.asarray(batch["reward"]),
        "done": jnp.asarray(batch["done"]),
    }
    common = dict(gamma=cfg.gamma, lr=cfg.lr, num_actions=5,
                  mask_terminal=False)
    p32, m32, v32, loss32 = FT.learn_math(p, tp, m, v, batch_t,
                                          jnp.int32(1), **common)
    p16, m16, v16, loss16 = FT.learn_math(p, tp, m, v, batch_t, jnp.int32(1),
                                          compute_dtype=jnp.bfloat16, **common)
    # Loss: a bf16 forward of O(10)-scale Q keeps ~2 significant digits.
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=5e-2)
    for a16, a32, a0, mm32 in zip(p16, p32, p, m32):
        assert a16.dtype == jnp.float32  # masters stay f32
        upd32 = np.asarray(a32 - a0)
        upd16 = np.asarray(a16 - a0)
        # Adam's t=1 update is lr*sign(g) for every |g| >> eps, so gate on
        # the GRADIENT magnitude (first moment = 0.1*g at t=1): elements
        # with |g| >= 10% of the layer max are far above bf16 rounding
        # noise and must move the same way; smaller ones may flip sign.
        g32 = np.abs(np.asarray(mm32))
        strong = g32 >= 0.1 * g32.max()
        agree = np.sign(upd16[strong]) == np.sign(upd32[strong])
        assert agree.mean() >= 0.99, f"direction agreement {agree.mean():.3f}"
    for a16, a32 in zip(m16 + v16, m32 + v32):
        assert a16.dtype == jnp.float32


def test_fwd_bf16_close_to_f32():
    """Kernel-side mirror of tests/test_dqn.py::test_bf16_forward_close_to_f32."""
    params = qnet_init(jax.random.key(0), 10, 5)
    p = FT.params_to_t(params)
    x = jax.random.normal(jax.random.key(1), (10, 64), jnp.float32) * 20.0
    q32 = FT._fwd(p, x)[-1]
    q16 = FT._fwd(p, x, jnp.bfloat16)[-1]
    assert q16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(q16), np.asarray(q32),
                               rtol=5e-2, atol=5e-2)
