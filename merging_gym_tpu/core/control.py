"""Longitudinal control law: the closed form of the reference's per-step QP.

The reference solves a 10-variable equality-constrained QP with quadprog on
*every* environment step (scripts/helper.py:152-191, called from
merging_gym/envs/merging_env.py:134-136,147,152):

    min_u  sum_i (u_{i+1} - u_i)^2 + 0.01 ||u||^2
    s.t.   dt * sum_i u_i = vt - v0            (terminal-velocity row only;
                                                the position row is dropped
                                                at helper.py:173: ``B = B[1]``,
                                                ``A[1, :]``)

Constant vectors are in the null space of the difference operator, so the
exact minimiser is the constant sequence  u_i = (vt - v0) / t  and the
applied action ``u[0]`` (helper.py:189-191) is simply

    acc = (target_velocity - v) / prediction_t        (prediction_t = 3.0 s)

``eq_qp`` below is a general dense equality-constrained QP solver (KKT
system) kept as the fidelity reference: tests assert it reproduces the
analytic law to f64 round-off, standing in for the quadprog backend the
reference uses.
"""

import jax.numpy as jnp

from merging_gym_tpu.core import constants as C


def action_to_acc(vel, target_vel):
    """Closed-form acceleration for a target-velocity action.

    Exactly the minimiser of the reference QP (see module docstring);
    replaces two quadprog solves per env step with one fused subtract/scale.
    """
    return (target_vel - vel) / C.PREDICTION_T


def eq_qp(P, q, A, b):
    """Solve  min 1/2 u'Pu + q'u  s.t.  Au = b  via the KKT system.

    Dense, batched-friendly, differentiable.  ``A`` may be 1-D (a single
    constraint row) or 2-D.  Returns the primal solution ``u``.
    """
    A = jnp.atleast_2d(A)
    b = jnp.atleast_1d(b)
    n, m = P.shape[0], A.shape[0]
    kkt = jnp.block([[P, A.T], [A, jnp.zeros((m, m), P.dtype)]])
    rhs = jnp.concatenate([-q, b])
    sol = jnp.linalg.solve(kkt, rhs)
    return sol[:n]


def mpc_1d_qp(v0, vt, t=C.PREDICTION_T, horizon=10):
    """Numerically solve the reference MPC QP (helper.py:152-191).

    Builds the same smoothness-plus-ridge objective and the same
    terminal-velocity equality row, then solves the KKT system.  Returns
    the full control sequence ``u``; ``u[0]`` is the applied acceleration.
    Exists for parity testing against :func:`action_to_acc`.
    """
    dt = t / horizon
    d = jnp.eye(horizon - 1, horizon) - jnp.eye(horizon - 1, horizon, 1)
    P = d.T @ d + 0.01 * jnp.eye(horizon)
    q = jnp.zeros(horizon, P.dtype)
    A = jnp.full((1, horizon), dt, P.dtype)
    b = jnp.atleast_1d(jnp.asarray(vt - v0, P.dtype))
    return eq_qp(P, q, A, b)
