"""OCP abstraction: each formulation exposes a single pure per-node function

    node_terms(t, x, u, params) -> NodeTerms(r, h_log, h_quad, g)

which the solver differentiates ONCE per node (`jacfwd` over (x, u)) to build
the full LQ approximation:

    cost(t,x,u) = 1/2 |r|^2 + sum relaxed_log_barrier(h_log; mu, delta)
                + sum quadratic_barrier(h_quad; mu, delta)
    s.t.  g(t,x,u) = 0     (projected equality constraints)

This dissolves the reference's per-term virtual dispatch
(`OptimalControlProblem` collections, reference `CentroidalMpcInterface.cpp:151-237`)
into one statically-shaped function — the XLA-friendly equivalent of
ocs2's multi-threaded per-node LQ approximation (SURVEY.md §2.5 item 1).

Activity gating (`isActive(t)` in the reference, e.g.
`FrictionForceConeConstraint.cpp:70-73`) becomes row masking: inactive
residual/equality rows are multiplied to zero; inactive barrier rows are
replaced by a benign constant so value and derivatives vanish.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp


class NodeTerms(NamedTuple):
    r: jnp.ndarray        # Gauss-Newton residuals; cost += 0.5 |r|^2
    h_log: jnp.ndarray    # relaxed-log-barrier rows (h >= 0 soft)
    h_log_mask: jnp.ndarray  # 1.0 = row active; inactive rows contribute 0
    h_quad: jnp.ndarray   # quadratic-barrier rows (h >= 0 soft)
    g: jnp.ndarray        # equality-constraint residuals (hard)


class BarrierParams(NamedTuple):
    """Per-row penalty parameters, fixed at OCP construction."""
    log_mu: jnp.ndarray
    log_delta: jnp.ndarray
    quad_mu: jnp.ndarray
    quad_delta: jnp.ndarray


def masked_barrier_value(h, active, safe_value=1e3):
    """Replace inactive rows with a benign constant so the barrier contributes
    zero gradient/Hessian there. `active` is float 0/1."""
    return active * h + (1.0 - active) * safe_value


def node_cost(terms: NodeTerms, bp: BarrierParams) -> jnp.ndarray:
    from wb_humanoid_mpc_tpu.ocp.penalties import quadratic_barrier, relaxed_log_barrier

    c = 0.5 * jnp.sum(terms.r**2)
    if terms.h_log.shape[-1]:
        c = c + jnp.sum(terms.h_log_mask
                        * relaxed_log_barrier(terms.h_log, bp.log_mu, bp.log_delta))
    if terms.h_quad.shape[-1]:
        c = c + jnp.sum(quadratic_barrier(terms.h_quad, bp.quad_mu, bp.quad_delta))
    return c
