"""Locks for the reduce-on-chip rollout (ops/fused_rollout.py,
``fused_rollout_counters``): its outcome counters must equal the same
reductions computed from the trajectory-writing kernel's outputs.

Actions mode runs under the Pallas interpreter on CPU (like
test_fused_rollout.py); the seed-mode equality lock needs the TPU PRNG
(no CPU interpreter lowering) and is skipped off-TPU -- it is also run
by the benchmark drive (benchmarks/rollout_cost_probe.py --counters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.ops import fused_rollout as FR


@pytest.fixture
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FR.pl, "pallas_call", patched)
    yield


def _assert_counters_match(traj, cnt, atol=1e-3):
    done = np.asarray(traj["done"])
    win = np.asarray(traj["winner"])
    col = np.asarray(traj["collision"])
    np.testing.assert_allclose(
        np.asarray(cnt["reward_sum"]),
        np.asarray(traj["rewards"]).sum(axis=0),
        rtol=1e-5, atol=atol)
    np.testing.assert_array_equal(np.asarray(cnt["episodes"]), done.sum(0))
    np.testing.assert_array_equal(np.asarray(cnt["collisions"]), col.sum(0))
    np.testing.assert_array_equal(np.asarray(cnt["wins1"]),
                                  (done & (win == 1) & ~col).sum(0))
    np.testing.assert_array_equal(np.asarray(cnt["wins2"]),
                                  (done & (win == 2) & ~col).sum(0))


@pytest.mark.parametrize("unroll", [1, 4])
def test_counters_match_trajectory_reductions(_interpret_mode, unroll):
    T, N = 400, 128
    rng = np.random.default_rng(3)
    actions = rng.integers(-1, C.NUM_ACTIONS, size=(T, 2, N)).astype(np.int32)
    traj = FR.fused_rollout(T, N, actions=actions, unroll=unroll)
    cnt = FR.fused_rollout_counters(T, N, actions=actions, unroll=unroll)
    # Random joint actions over 400 steps produce every outcome class;
    # guard that the lock is not vacuous.
    assert int(np.asarray(cnt["episodes"]).sum()) > 0
    assert int(np.asarray(cnt["collisions"]).sum()) > 0
    _assert_counters_match(traj, cnt)


def test_counters_respect_reward_params(_interpret_mode):
    T, N = 200, 128
    actions = np.full((T, 2, N), 2, np.int32)  # mirror matchup -> collision
    a = FR.fused_rollout_counters(T, N, actions=actions)
    b = FR.fused_rollout_counters(T, N, actions=actions,
                                  env_params=EnvParams(r_collision=-100.0))
    assert int(np.asarray(a["collisions"]).sum()) > 0
    assert float(np.asarray(b["reward_sum"]).min()) < \
        float(np.asarray(a["reward_sum"]).min()) * 5


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu PRNG has no CPU interpreter lowering")
def test_counters_match_trajectory_seed_mode_tpu():
    # Matched (seed, unroll, env tiling) => both kernels draw identical
    # PRNG action streams (fused_rollout docstring caveat), so the
    # counters must match the trajectory reductions exactly.
    T, N, unroll, seed = 512, 256, 8, 7
    traj = FR.fused_rollout(T, N, seed=seed, unroll=unroll)
    cnt = FR.fused_rollout_counters(T, N, seed=seed, unroll=unroll)
    jax.block_until_ready(cnt["reward_sum"])
    _assert_counters_match(traj, cnt, atol=5e-3)
