"""Penalty functions for soft inequality constraints.

Replaces ocs2's `RelaxedBarrierPenalty` and `PieceWisePolynomialBarrierPenalty`
(consumed by the reference factory `HumanoidCostConstraintFactory.cpp:105-211`).
All functions are elementwise jnp, differentiable, vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def relaxed_log_barrier(h, mu, delta):
    """Relaxed logarithmic barrier for h >= 0 (ocs2 `RelaxedBarrierPenalty`):

        p(h) = -mu * ln(h)                                   for h > delta
        p(h) = mu * (-ln(delta) + 1/2 ((h - 2 delta)/delta)^2 - 1/2)   otherwise

    C2-continuous at h = delta; quadratic extension keeps gradients finite for
    infeasible iterates (the property HPIPM's relaxed-barrier mode relies on).
    """
    h_safe = jnp.maximum(h, delta)  # keep log argument positive on both branches
    log_branch = -mu * jnp.log(h_safe)
    z = (h - 2.0 * delta) / delta
    quad_branch = mu * (-jnp.log(delta) + 0.5 * z * z - 0.5)
    return jnp.where(h > delta, log_branch, quad_branch)


def quadratic_barrier(h, mu, delta):
    """C1 piecewise-polynomial barrier for h >= 0 (stand-in for ocs2's
    `PieceWisePolynomialBarrierPenalty`, used by the joint-limit soft
    constraint, reference `JointLimitsSoftConstraint.cpp:57-88`):

        p(h) = 0                          for h >= delta
        p(h) = (mu/2) ((h - delta)/delta)^2   for h < delta

    Zero with zero slope at h = delta, grows quadratically into violation.
    """
    z = jnp.minimum(h - delta, 0.0) / delta
    return 0.5 * mu * z * z


def relaxed_log_barrier_d1(h, mu, delta):
    """First derivative of :func:`relaxed_log_barrier` wrt h."""
    h_safe = jnp.maximum(h, delta)
    log_branch = -mu / h_safe
    quad_branch = mu * (h - 2.0 * delta) / (delta * delta)
    return jnp.where(h > delta, log_branch, quad_branch)


def relaxed_log_barrier_d2(h, mu, delta):
    """Second derivative of :func:`relaxed_log_barrier` wrt h."""
    h_safe = jnp.maximum(h, delta)
    log_branch = mu / (h_safe * h_safe)
    quad_branch = jnp.full_like(h, mu / (delta * delta))
    return jnp.where(h > delta, log_branch, quad_branch)


def quadratic_barrier_d1(h, mu, delta):
    z = jnp.minimum(h - delta, 0.0) / delta
    return mu * z / delta


def quadratic_barrier_d2(h, mu, delta):
    active = (h < delta).astype(h.dtype)
    return mu * active / (delta * delta)
