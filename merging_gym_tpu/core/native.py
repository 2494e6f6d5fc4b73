"""ctypes bindings for the native (C++) env core.

See native/merging_core.cpp: a compiled batch-stepping env with the
exact reference semantics, a KKT QP solver standing in for quadprog, and
a serial rollout loop.  The shared library is built on demand with g++
(cached next to the source); if no compiler is available every entry
point raises, and callers fall back to the numpy oracle.

This is the framework's host-side runtime: human play, single-env
evaluation and CPU trajectory generation skip the device round-trip, and
the C core acts as a second, independent parity oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmerging_core.so")

_STATE_DTYPE = np.dtype([
    ("pos1", np.float64), ("vel1", np.float64), ("acc1", np.float64),
    ("pos2", np.float64), ("vel2", np.float64), ("acc2", np.float64),
    ("r1_acc", np.float64), ("r2_acc", np.float64),
    ("time_stamp", np.float64),
    ("t", np.int32), ("winner", np.int32), ("done", np.int32),
], align=True)

_OUT_DTYPE = np.dtype([
    ("obs", np.float64, (10,)), ("r1", np.float64), ("r2", np.float64),
    ("done", np.int32), ("collision", np.int32), ("winner", np.int32),
], align=True)

_lib = None


def _build():
    src = os.path.join(_NATIVE_DIR, "merging_core.cpp")
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO_PATH, src],
        check=True, capture_output=True)


def load_library():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO_PATH)
            or os.path.getmtime(_SO_PATH) < os.path.getmtime(
                os.path.join(_NATIVE_DIR, "merging_core.cpp"))):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.merge_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.merge_observe.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.merge_step.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int] + [ctypes.c_double] * 5 + [ctypes.c_void_p]
    lib.merge_rollout.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int] + [ctypes.c_double] * 5 + [
                                      ctypes.c_void_p, ctypes.c_void_p]
    lib.merge_rollout.restype = ctypes.c_int
    lib.eq_qp_solve.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int] * 2 + [ctypes.c_void_p]
    lib.eq_qp_solve.restype = ctypes.c_int
    lib.mpc_1d_action.argtypes = [ctypes.c_double] * 3
    lib.mpc_1d_action.restype = ctypes.c_double
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


class NativeMergeEnv:
    """Batch env over the C core, API-parallel to the numpy oracle."""

    def __init__(self, num_envs: int = 1,
                 rewards=(2.0, 1.0, -10.0, 0.001, 0.0)):
        self._lib = load_library()
        self.num_envs = num_envs
        self.rewards = tuple(float(r) for r in rewards)
        self._state = np.zeros(num_envs, _STATE_DTYPE)
        self._out = np.zeros(num_envs, _OUT_DTYPE)
        self.reset()

    def _ptr(self, arr):
        return arr.ctypes.data_as(ctypes.c_void_p)

    def reset(self):
        self._lib.merge_reset(self._ptr(self._state), self.num_envs)
        return self.observe()

    def observe(self) -> np.ndarray:
        obs = np.zeros((self.num_envs, 10))
        self._lib.merge_observe(self._ptr(self._state), self.num_envs,
                                self._ptr(obs))
        return obs

    def step(self, a1, a2):
        """a1, a2: int arrays [num_envs]; negatives mean None."""
        a1 = np.ascontiguousarray(a1, np.int32)
        a2 = np.ascontiguousarray(a2, np.int32)
        self._lib.merge_step(self._ptr(self._state), self._ptr(a1),
                             self._ptr(a2), self.num_envs, *self.rewards,
                             self._ptr(self._out))
        o = self._out
        return (o["obs"].copy(), np.stack([o["r1"], o["r2"]], -1).copy(),
                o["done"].astype(bool).copy(), o["collision"].astype(bool).copy(),
                o["winner"].copy())

    @property
    def state(self) -> np.ndarray:
        return self._state

    def rollout(self, a1_seq, a2_seq):
        """Single-env serial rollout; returns (steps, obs, rewards)."""
        assert self.num_envs == 1
        a1 = np.ascontiguousarray(a1_seq, np.int32)
        a2 = np.ascontiguousarray(a2_seq, np.int32)
        T = len(a1)
        obs = np.zeros((T, 10))
        rew = np.zeros((T, 2))
        steps = self._lib.merge_rollout(
            self._ptr(self._state), self._ptr(a1), self._ptr(a2), T,
            *self.rewards, self._ptr(obs), self._ptr(rew))
        return steps, obs[:steps], rew[:steps]


def mpc_1d_action(v0: float, vt: float, t: float = 3.0) -> float:
    """Native QP solve of the reference MPC (helper.py:152-191)."""
    return float(load_library().mpc_1d_action(v0, vt, t))


def eq_qp(P, q, A, b):
    """Native dense equality-constrained QP solve."""
    lib = load_library()
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    A = np.ascontiguousarray(np.atleast_2d(A), np.float64)
    b = np.ascontiguousarray(np.atleast_1d(b), np.float64)
    n, m = P.shape[0], A.shape[0]
    u = np.zeros(n)
    ret = lib.eq_qp_solve(P.ctypes.data_as(ctypes.c_void_p),
                          q.ctypes.data_as(ctypes.c_void_p),
                          A.ctypes.data_as(ctypes.c_void_p),
                          b.ctypes.data_as(ctypes.c_void_p),
                          n, m, u.ctypes.data_as(ctypes.c_void_p))
    if ret != 0:
        raise np.linalg.LinAlgError("singular KKT system")
    return u
