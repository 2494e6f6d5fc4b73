"""Native C++ core tests: builds with g++, bit-level parity against the
float64 numpy oracle, QP solver equivalence."""

import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core import native
from merging_gym_tpu.core.oracle import OracleMergeEnv

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_struct_sizes_match():
    lib = native.load_library()  # noqa: F841 -- layout asserted via parity below
    assert native._STATE_DTYPE.itemsize % 8 == 0
    assert native._OUT_DTYPE.itemsize % 8 == 0


def test_native_bit_parity_with_oracle():
    """C++ libm and Python math produce the same doubles on this machine:
    trajectories must agree to the last bit, events exactly."""
    rng = np.random.default_rng(0)
    for ep in range(4):
        env = native.NativeMergeEnv(1)
        oracle = OracleMergeEnv()
        env.reset()
        oracle.reset()
        for t in range(3000):
            a1 = int(rng.integers(0, 5))
            a2r = int(rng.integers(-1, 5))
            a2 = None if a2r < 0 else a2r
            obs_o, r_o, done_o, info_o = oracle.step(a1, a2)
            obs_n, r_n, done_n, col_n, win_n = env.step([a1], [a2r])
            np.testing.assert_array_equal(obs_n[0], np.asarray(obs_o))
            np.testing.assert_array_equal(r_n[0], np.asarray(r_o))
            assert bool(done_n[0]) == done_o
            assert bool(col_n[0]) == info_o["collision"]
            assert int(win_n[0]) == (oracle.winner or 0)
            if done_o:
                break
        assert done_o


def test_native_batch_matches_serial():
    env = native.NativeMergeEnv(4)
    rng = np.random.default_rng(1)
    ref = native.NativeMergeEnv(1)
    for _ in range(100):
        a1 = rng.integers(0, 5, size=4).astype(np.int32)
        a2 = rng.integers(-1, 5, size=4).astype(np.int32)
        a1[0], a2[0] = a1[2], a2[2]
        obs, rew, done, col, win = env.step(a1, a2)
        _, rref, dref, _, _ = ref.step(a1[1:2], a2[1:2])
        if done.any():
            break
    assert obs.shape == (4, 10)


def test_native_rollout_matches_stepping():
    rng = np.random.default_rng(2)
    a1 = rng.integers(0, 5, size=500).astype(np.int32)
    a2 = rng.integers(0, 5, size=500).astype(np.int32)
    env = native.NativeMergeEnv(1)
    steps, obs, rew = env.rollout(a1, a2)
    env2 = native.NativeMergeEnv(1)
    for t in range(steps):
        o, r, done, _, _ = env2.step(a1[t:t + 1], a2[t:t + 1])
        np.testing.assert_array_equal(o[0], obs[t])
        np.testing.assert_array_equal(r[0], rew[t])
    assert bool(done[0])


def test_native_mpc_equals_analytic():
    for v0 in (0.0, 7.3, 20.0, 41.5):
        for vt in C.TARGET_VELS:
            got = native.mpc_1d_action(v0, vt, 3.0)
            assert abs(got - (vt - v0) / 3.0) < 1e-9


def test_native_eq_qp_matches_numpy():
    rng = np.random.default_rng(3)
    n, m = 10, 2
    a = rng.standard_normal((n, n))
    P = a @ a.T + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    kkt = np.block([[P, A.T], [A, np.zeros((m, m))]])
    expect = np.linalg.solve(kkt, np.concatenate([-q, b]))[:n]
    np.testing.assert_allclose(native.eq_qp(P, q, A, b), expect, atol=1e-8)
