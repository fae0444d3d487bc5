"""Penalty functions for soft inequality constraints.

Replaces ocs2's `RelaxedBarrierPenalty` and `PieceWisePolynomialBarrierPenalty`
(consumed by the reference factory `HumanoidCostConstraintFactory.cpp:105-211`).
All functions are elementwise jnp, differentiable, vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# Bounded-tail switch for the relaxed log barrier, at h_cap = RATIO * delta.
# The pure ocs2 form -mu*ln(h) is unbounded BELOW as the margin grows, i.e.
# it pays unbounded REWARD for over-satisfying the constraint. With the G1
# config (contact-moment rows: mu 0.6, delta 0.03, margins ~5-15 at nominal
# stance forces; wrench R ~1e-5) that reward funds a closed-loop exploit:
# every receding-horizon plan crouches through its horizon and "promises" a
# barrier-harvesting contact-force spike at the terminal node that is never
# executed — the round-3/4 dummy-sim stance sag (~15-40 mm/s crouch with a
# CONVERGED solver) reproduces exactly this, and disappears with the tail
# bounded (see tools_dev/probe_cost_compare.py). Inside (0, RATIO*delta] the
# penalty is EXACTLY the ocs2 RelaxedBarrierPenalty; beyond, it transitions
# C1-continuously to the bounded tail -mu*(ln(h_cap) + 1 - h_cap/h), whose
# slope decays like 1/h^2 and whose total remaining reward is <= mu.
LOG_BARRIER_CAP_RATIO = 3.0


def relaxed_log_barrier(h, mu, delta):
    """Relaxed logarithmic barrier for h >= 0 (ocs2 `RelaxedBarrierPenalty`,
    with a bounded far-field tail — see LOG_BARRIER_CAP_RATIO):

        p(h) = mu * (-ln(delta) + 1/2 ((h - 2 delta)/delta)^2 - 1/2)  h <= delta
        p(h) = -mu * ln(h)                                delta < h <= cap*delta
        p(h) = -mu * (ln(h_cap) + 1 - h_cap/h)            h > h_cap

    C2-continuous at h = delta, C1 at h = h_cap; the quadratic extension keeps
    gradients finite for infeasible iterates (the property HPIPM's
    relaxed-barrier mode relies on), the bounded tail keeps the reward finite
    for over-feasible ones.
    """
    h_cap = LOG_BARRIER_CAP_RATIO * delta
    h_mid = jnp.clip(h, delta, h_cap)  # keep log argument positive everywhere
    log_branch = -mu * jnp.log(h_mid)
    z = (h - 2.0 * delta) / delta
    quad_branch = mu * (-jnp.log(delta) + 0.5 * z * z - 0.5)
    tail_branch = -mu * (jnp.log(h_cap) + 1.0 - h_cap / jnp.maximum(h, h_cap))
    return jnp.where(h > h_cap, tail_branch,
                     jnp.where(h > delta, log_branch, quad_branch))


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
    h_cap = LOG_BARRIER_CAP_RATIO * delta
    h_mid = jnp.clip(h, delta, h_cap)
    log_branch = -mu / h_mid
    quad_branch = mu * (h - 2.0 * delta) / (delta * delta)
    h_tail = jnp.maximum(h, h_cap)
    tail_branch = -mu * h_cap / (h_tail * h_tail)
    return jnp.where(h > h_cap, tail_branch,
                     jnp.where(h > delta, log_branch, quad_branch))


def relaxed_log_barrier_d2(h, mu, delta):
    """Second derivative of :func:`relaxed_log_barrier` wrt h."""
    h_cap = LOG_BARRIER_CAP_RATIO * delta
    h_mid = jnp.clip(h, delta, h_cap)
    log_branch = mu / (h_mid * h_mid)
    quad_branch = jnp.full_like(h, mu / (delta * delta))
    h_tail = jnp.maximum(h, h_cap)
    tail_branch = 2.0 * mu * h_cap / (h_tail * h_tail * h_tail)
    return jnp.where(h > h_cap, tail_branch,
                     jnp.where(h > delta, log_branch, quad_branch))


def quadratic_barrier_d1(h, mu, delta):
    z = jnp.minimum(h - delta, 0.0) / delta
    return mu * z / delta


def quadratic_barrier_d2(h, mu, delta):
    active = (h < delta).astype(h.dtype)
    return mu * active / (delta * delta)
