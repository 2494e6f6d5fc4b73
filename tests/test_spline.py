"""Spline planner tests (the reference's spline5, helper.py:10-150)."""

import jax.numpy as jnp
import numpy as np

from merging_gym_tpu.core import spline


def test_fits_waypoints_with_initial_constraints():
    xs = [0.0, 10.0, 20.0]
    ys = [0.0, 1.0, 0.0]
    ts = [0.0, 1.0, 2.0]
    c = spline.fit(xs, ys, ts, vx=20.0, vy=0.0)
    x0, y0, dx0, dy0 = spline.evaluate(c, jnp.asarray(0.0))
    # Initial position and velocity are hard equality constraints.
    assert abs(float(x0) - 0.0) < 1e-5
    assert abs(float(y0) - 0.0) < 1e-5
    # d/dtau at tau=0 equals vx (velocities are in normalised time units
    # times T; the reference demo compares in the same units).
    assert abs(float(dx0) - 20.0) < 1e-4
    assert abs(float(dy0) - 0.0) < 1e-4


def test_tracks_linear_motion():
    ts = np.linspace(0.0, 2.0, 5)
    xs = 3.0 * ts
    ys = np.zeros_like(ts)
    c = spline.fit(xs, ys, ts)
    for tau, expect in [(0.0, 0.0), (0.5, 3.0), (1.0, 6.0)]:
        x, y, _, _ = spline.evaluate(c, jnp.asarray(tau))
        assert abs(float(x) - expect) < 0.15
        assert abs(float(y)) < 0.1


def test_yaw_constraint_ties_velocities():
    import math
    yaw = 0.5
    c = spline.fit([0.0, 5.0], [0.0, 3.0], [0.0, 1.0], yaw=yaw)
    _, _, dx0, dy0 = spline.evaluate(c, jnp.asarray(0.0))
    # tan(yaw)*vx - vy = 0 at t=0 (helper.py:92-96).
    assert abs(math.tan(yaw) * float(dx0) - float(dy0)) < 1e-4


def test_outside_range_is_zero():
    c = spline.fit([0.0, 1.0], [0.0, 1.0], [0.0, 1.0])
    x, y, dx, dy = spline.evaluate(c, jnp.asarray(1.5))
    assert float(x) == 0.0 and float(dy) == 0.0
