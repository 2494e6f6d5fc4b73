"""Fused Pallas MLP vs the plain jnp forward (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init
from merging_gym_tpu.ops import fused_mlp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # On CPU the TPU kernel runs through the Pallas interpreter.
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fused_mlp.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("batch", [8, 512, 700])
def test_fused_matches_reference_forward(batch):
    params = qnet_init(jax.random.key(0), 10, 5, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (batch, 10), jnp.float32) * 100
    expect = qnet_apply(params, x)
    got = fused_mlp.qnet_apply_fused(params, x, block=512)
    assert got.shape == (batch, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-3)


def test_fused_goal_conditioned_shape():
    # 11-input variant used by HDQN's lower net.
    params = qnet_init(jax.random.key(2), 11, 5, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(3), (64, 11), jnp.float32)
    got = fused_mlp.qnet_apply_fused(params, x, block=64)
    expect = qnet_apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-3)
