"""Fused Pallas actor: distributional equivalence with the jnp actor.

The TPU PRNG primitives (pltpu.prng_seed/prng_random_bits) have no CPU
interpreter lowering in this jax version, so these tests only run when a
real TPU backend is present (they are exercised on hardware by the
benchmark/verify drives; the CPU CI suite skips them).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init
from merging_gym_tpu.ops import fused_actor


pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu PRNG has no CPU interpreter lowering")


def test_greedy_fraction_matches_phi():
    params = qnet_init(jax.random.key(0), 10, 5, dtype=jnp.float32)
    obs = jax.random.normal(jax.random.key(1), (2048, 10), jnp.float32)
    greedy = np.asarray(jnp.argmax(qnet_apply(params, obs), axis=-1))

    counts_match = 0
    total = 0
    for seed in range(4):
        acts = np.asarray(fused_actor.fused_eps_greedy_actions(
            params, obs, seed, block=512))
        assert acts.shape == (2048,)
        assert acts.min() >= 0 and acts.max() < 5
        counts_match += int((acts == greedy).sum())
        total += acts.shape[0]
    phi = 0.5 * (1 + math.erf(0.7 / math.sqrt(2)))
    expect = phi + (1 - phi) / 5
    frac = counts_match / total
    assert abs(frac - expect) < 0.02, (frac, expect)


def test_random_arm_uniform():
    # Flat Q-values: every action is "greedy"; still, the random arm must
    # keep all actions reachable with roughly uniform residual mass.
    params = qnet_init(jax.random.key(2), 10, 5, dtype=jnp.float32)
    # Zero out the output layer -> constant q -> argmax always 0.
    params = dict(params)
    params["fc2"] = {"w": jnp.zeros_like(params["fc2"]["w"]),
                     "b": jnp.zeros_like(params["fc2"]["b"])}
    obs = jax.random.normal(jax.random.key(3), (4096, 10), jnp.float32)
    acts = np.asarray(fused_actor.fused_eps_greedy_actions(params, obs, 7))
    counts = np.bincount(acts, minlength=5) / acts.shape[0]
    phi = 0.5 * (1 + math.erf(0.7 / math.sqrt(2)))
    # action 0: phi + (1-phi)/5, others: (1-phi)/5
    assert abs(counts[0] - (phi + (1 - phi) / 5)) < 0.03
    for a in range(1, 5):
        assert abs(counts[a] - (1 - phi) / 5) < 0.02


def test_tiles_use_distinct_randomness():
    params = qnet_init(jax.random.key(4), 10, 5, dtype=jnp.float32)
    obs = jnp.tile(jax.random.normal(jax.random.key(5), (512, 10)), (2, 1))
    acts = np.asarray(fused_actor.fused_eps_greedy_actions(
        params, obs, 3, block=512))
    # identical obs in both tiles, but different random draws
    assert (acts[:512] != acts[512:]).any()
