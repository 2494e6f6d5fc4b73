"""Polynomial x/y trajectory spline fit via equality-constrained QP.

Counterpart of the reference's ``spline5`` planner (scripts/helper.py:
10-150): fit cubic polynomials x(t), y(t) (order 3 despite the "5" in
the name) to waypoint sequences by least squares with a 0.01 ridge,
under equality constraints pinning the initial position, optionally the
initial velocity, and optionally the initial yaw
(tan(yaw) * vx - vy = 0).  Only the reference's ``__main__`` demo
exercises it (helper.py:205-217) -- no env or agent calls it -- but it is
part of the component inventory, so it ships here with tests, batched
and differentiable (the QP is an explicit KKT solve, so gradients flow
through waypoints).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from merging_gym_tpu.core.control import eq_qp

ORDER = 3  # helper.py:19


def fit(xs, ys, ts=None, vx=None, vy=None, yaw=None):
    """Fit the spline; returns the (2*(ORDER+1),) coefficient vector
    [x-coeffs, y-coeffs] in normalised time t/T (helper.py:25-104)."""
    xs = jnp.asarray(xs, jnp.float64 if jnp.asarray(xs).dtype == jnp.float64
                     else jnp.float32)
    ys = jnp.asarray(ys, xs.dtype)
    n = xs.shape[0]
    ts = jnp.arange(n, dtype=xs.dtype) if ts is None else jnp.asarray(ts, xs.dtype)
    T = jnp.max(ts)
    tau = ts / T

    ncoef = ORDER + 1
    powers = tau[:, None] ** jnp.arange(ncoef, dtype=xs.dtype)[None, :]
    p = jnp.zeros((2 * n, 2 * ncoef), xs.dtype)
    p = p.at[:n, :ncoef].set(powers)
    p = p.at[n:, ncoef:].set(powers)
    q_target = jnp.concatenate([xs, ys])

    P = p.T @ p + 0.01 * jnp.eye(2 * ncoef, dtype=xs.dtype)   # helper.py:73
    q = -(q_target @ p)

    # Equality rows (helper.py:78-98): initial x, initial y, then
    # optionally vx, vy, yaw.
    rows = []
    rhs = []
    e = lambda i: jnp.zeros((2 * ncoef,), xs.dtype).at[i].set(1.0)
    rows += [e(0), e(ncoef)]
    rhs += [xs[0], ys[0]]
    if vx is not None and vy is not None:
        rows += [e(1), e(1 + ncoef)]
        rhs += [jnp.asarray(vx, xs.dtype), jnp.asarray(vy, xs.dtype)]
    if yaw is not None:
        row = jnp.zeros((2 * ncoef,), xs.dtype)
        row = row.at[1].set(math.tan(yaw)).at[1 + ncoef].set(-1.0)
        rows.append(row)
        rhs.append(jnp.asarray(0.0, xs.dtype))
    A = jnp.stack(rows)
    b = jnp.stack([jnp.asarray(r) for r in rhs])
    return eq_qp(P, q, A, b)


def evaluate(coeffs, t):
    """Position and velocity at normalised time t in [0, 1]
    (helper.py:108-129).  Outside [0, 1] everything is 0, matching the
    reference's guard."""
    ncoef = ORDER + 1
    t = jnp.asarray(t)
    k = jnp.arange(ncoef, dtype=coeffs.dtype)
    powers = t[..., None] ** k
    dpowers = k * jnp.where(k > 0, t[..., None] ** jnp.maximum(k - 1, 0), 0.0)
    cx, cy = coeffs[:ncoef], coeffs[ncoef:]
    inside = (t >= 0) & (t <= 1)
    x = jnp.where(inside, powers @ cx, 0.0)
    y = jnp.where(inside, powers @ cy, 0.0)
    dx = jnp.where(inside, dpowers @ cx, 0.0)
    dy = jnp.where(inside, dpowers @ cy, 0.0)
    return x, y, dx, dy
