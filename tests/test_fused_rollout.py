"""Fused single-kernel rollout vs the XLA scan path (interpret mode on
CPU for the precomputed-actions mode; the PRNG mode is TPU-only and is
exercised by the benchmark drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import autoreset_step, reset_batch
from merging_gym_tpu.ops import fused_rollout as FR


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FR.pl, "pallas_call", patched)
    yield


def test_fused_matches_scan_path():
    T, N = 60, 128
    params = EnvParams()
    rng = np.random.default_rng(0)
    actions = rng.integers(-1, C.NUM_ACTIONS, size=(T, N, 2)).astype(np.int32)

    out = FR.fused_rollout(T, N, actions=np.transpose(actions, (0, 2, 1)))

    state = reset_batch(params, jax.random.key(0), N)
    for t in range(T):
        state, ts = autoreset_step(params, state, jnp.asarray(actions[t]),
                                   jax.random.key(t))
        # atol 1e-3 m: the x2-x1 / x1-x2 dims subtract two ~1000-scale
        # R*sin terms, so f32 FMA-ordering differences between the pallas
        # interpreter and XLA are ~1e-4.
        np.testing.assert_allclose(np.asarray(out["obs"][t]).T,
                                   np.asarray(ts.obs), rtol=1e-6, atol=1e-3,
                                   err_msg=f"obs step {t}")
        np.testing.assert_allclose(np.asarray(out["rewards"][t]).T,
                                   np.asarray(ts.rewards), rtol=1e-6, atol=1e-6,
                                   err_msg=f"rewards step {t}")
        np.testing.assert_array_equal(np.asarray(out["done"][t]),
                                      np.asarray(ts.done))
        np.testing.assert_array_equal(np.asarray(out["winner"][t]),
                                      np.asarray(ts.winner))
        np.testing.assert_array_equal(np.asarray(out["collision"][t]),
                                      np.asarray(ts.collision))


def test_fused_autoreset_and_episodes_complete():
    T, N = 300, 128
    # Everyone floors it vs L0: ego wins, L0 coasts in later; episodes end
    # and restart within T steps.
    actions = np.zeros((T, 2, N), np.int32)
    actions[:, 0, :] = 4
    actions[:, 1, :] = -1
    out = FR.fused_rollout(T, N, actions=actions)
    done = np.asarray(out["done"])
    assert done.any()
    # After a done, the next step's obs distance-to-go returns near start.
    t_done = np.argwhere(done[:, 0])[0, 0]
    assert float(out["obs"][t_done + 1, 3, 0]) > 890.0


def test_fused_reward_params_respected():
    T, N = 200, 128
    actions = np.full((T, 2, N), 2, np.int32)  # mirror matchup -> collision
    out_a = FR.fused_rollout(T, N, actions=actions)
    out_b = FR.fused_rollout(T, N, actions=actions,
                             env_params=EnvParams(r_collision=-100.0))
    ra = float(np.asarray(out_a["rewards"]).min())
    rb = float(np.asarray(out_b["rewards"]).min())
    assert ra > -20 and rb < -90


def test_fused_honors_max_steps():
    T, N = 130, 128
    actions = np.zeros((T, 2, N), np.int32)  # both brake: only timeout ends
    out = FR.fused_rollout(T, N, actions=actions,
                           env_params=EnvParams(max_steps=100))
    done = np.asarray(out["done"])
    assert int(done[:, 0].argmax()) == 99      # cap at step 100 (0-indexed)
    assert done[99].all()
    # default cap unaffected
    out2 = FR.fused_rollout(T, N, actions=actions)
    assert not np.asarray(out2["done"]).any()


def test_fused_unroll_matches_unroll1():
    """Time-unrolled kernel (K env steps per grid iteration) reproduces
    the step-per-iteration kernel in actions mode: events (done, winner,
    collision) exactly, floats to 1-ULP (XLA may contract the unrolled
    body's FMAs differently)."""
    T, N = 24, 128
    rng = np.random.default_rng(3)
    actions = rng.integers(-1, C.NUM_ACTIONS, size=(T, 2, N)).astype(np.int32)
    base = FR.fused_rollout(T, N, actions=actions)
    for K in (2, 4, 8):
        out = FR.fused_rollout(T, N, actions=actions, unroll=K)
        for k in ("done", "winner", "collision"):
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(base[k]), err_msg=k)
        for k in ("obs", "rewards"):
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(base[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=k)
