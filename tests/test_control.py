"""Control-law tests: the analytic acceleration equals the reference QP
minimiser (SURVEY.md section 2.2), validated against a dense KKT solve."""

import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.control import action_to_acc, eq_qp, mpc_1d_qp


@pytest.mark.parametrize("v0", [0.0, 7.3, 20.0, 39.9, 55.0])
@pytest.mark.parametrize("vt", [0.0, 10.0, 20.0, 30.0, 40.0])
def test_analytic_equals_qp(v0, vt):
    u = np.asarray(mpc_1d_qp(v0, vt))
    analytic = (vt - v0) / C.PREDICTION_T
    # The exact minimiser is the constant sequence (vt - v0) / t.
    np.testing.assert_allclose(u, np.full(10, analytic), rtol=0, atol=1e-9)
    np.testing.assert_allclose(float(action_to_acc(v0, vt)), analytic, atol=1e-12)


def test_qp_constraint_satisfied():
    u = np.asarray(mpc_1d_qp(5.0, 37.0))
    dt = C.PREDICTION_T / 10
    np.testing.assert_allclose(dt * u.sum(), 37.0 - 5.0, atol=1e-9)


def test_eq_qp_against_numpy_kkt():
    rng = np.random.default_rng(0)
    n, m = 12, 3
    a = rng.standard_normal((n, n))
    P = a @ a.T + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    kkt = np.block([[P, A.T], [A, np.zeros((m, m))]])
    expect = np.linalg.solve(kkt, np.concatenate([-q, b]))[:n]
    np.testing.assert_allclose(np.asarray(eq_qp(P, q, A, b)), expect, atol=1e-8)
