"""Multiple-shooting transcription + LQ approximation (batched, single jacfwd).

TPU-native replacement for ocs2's multi-threaded per-node LQ approximation
(SURVEY.md §3.1 hot loop; `multiple_shooting` settings reference
`task.info:79-96`, `integratorType RK4`). The per-node combined map

    z = (x, u)  ->  (x_next, r, h_log, h_quad, g)

is differentiated once with `jax.jacfwd` and vmapped over all shooting nodes,
turning the whole linearization into one batched tensor program (the MXU gets
[N, n_out, nz] batched contractions instead of 4 CPU threads).

Equality constraints are handled by augmented Lagrangian: the solver folds
sqrt(rho) * (g + lambda/rho) into the Gauss-Newton residual stack, keeping the
LQ structure uniform (ALTRO-style; replaces the reference's HPIPM
projection+IPM path with a TPU-shaped method of equal accuracy at tolerance
`g_min`..`g_max`, reference `task.info:85-86`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.ocp.base import BarrierParams
from wb_humanoid_mpc_tpu.ocp.penalties import (
    quadratic_barrier,
    quadratic_barrier_d1,
    quadratic_barrier_d2,
    relaxed_log_barrier,
    relaxed_log_barrier_d1,
    relaxed_log_barrier_d2,
)


def rk4_step(flow, t, x, u, dt):
    """Classic RK4 with zero-order-hold input (reference `integratorType RK4`)."""
    k1 = flow(t, x, u)
    k2 = flow(t + 0.5 * dt, x + 0.5 * dt * k1, u)
    k3 = flow(t + 0.5 * dt, x + 0.5 * dt * k2, u)
    k4 = flow(t + dt, x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


class LQApprox(NamedTuple):
    """Batched LQ data over N nodes (+ terminal)."""

    A: jnp.ndarray      # [N, nx, nx]
    B: jnp.ndarray      # [N, nx, nu]
    d: jnp.ndarray      # [N, nx] defects: F(x_k,u_k) - x_{k+1}
    Qxx: jnp.ndarray    # [N, nx, nx]
    Quu: jnp.ndarray    # [N, nu, nu]
    Qux: jnp.ndarray    # [N, nu, nx]
    qx: jnp.ndarray     # [N, nx]
    qu: jnp.ndarray     # [N, nu]
    QN: jnp.ndarray     # [nx, nx]
    qN: jnp.ndarray     # [nx]
    cost: jnp.ndarray   # scalar: total nonlinear cost (incl. AL terms)
    g_norm: jnp.ndarray  # scalar: max |g| over nodes
    defect_norm: jnp.ndarray  # scalar: max |d|
    Cx: jnp.ndarray = None     # [N, nc, nx] equality state Jacobians
    Du: jnp.ndarray = None     # [N, nc, nu] equality input Jacobians
    g_res: jnp.ndarray = None  # [N, nc] equality residuals
    # line-search baseline byproducts (free: computed from the same NodeTerms
    # the linearization already evaluated — saves one full node sweep/solve)
    cost_pure: jnp.ndarray = None  # scalar: cost WITHOUT AL terms (+ terminal)
    viol: jnp.ndarray = None       # scalar: sqrt(SSE(g) + SSE(defects))


class Trajectory(NamedTuple):
    xs: jnp.ndarray   # [N+1, nx]
    us: jnp.ndarray   # [N, nu]


class _Terms(NamedTuple):
    r: jnp.ndarray
    h_log: jnp.ndarray
    h_log_mask: jnp.ndarray
    h_quad: jnp.ndarray
    g: jnp.ndarray


def node_cost_terms(terms, bp: BarrierParams, lam, rho):
    """Scalar cost of one node given its NodeTerms (AL included). Masked
    barrier rows contribute exactly zero (value and derivatives)."""
    c = 0.5 * jnp.sum(terms.r**2)
    c += jnp.sum(terms.h_log_mask
                 * relaxed_log_barrier(terms.h_log, bp.log_mu, bp.log_delta))
    c += jnp.sum(quadratic_barrier(terms.h_quad, bp.quad_mu, bp.quad_delta))
    c += 0.5 * rho * jnp.sum((terms.g + lam / rho) ** 2)
    return c


def make_node_lq(ocp, flow, dt: float, bp: BarrierParams,
                 sensitivity: str = "exact") -> Callable:
    """Single-node LQ builder: (t, x, u, p, lam, rho) -> 15-tuple of
    (A, B, x_next, Qxx, Quu, Qux, qx, qu, cost, g_max, g, Cx, Du,
    cost_pure, g_sse).

    The vmap-over-nodes wrapper lives in `make_lq_functions`; the
    horizon-sharded solver (`solver/sharded_sqp.py`) vmaps this over its
    local node block instead.

    `ocp` provides node_terms(t,x,u,p) and terminal_residual(t,x,p);
    `flow(t,x,u)` is the continuous dynamics.

    sensitivity:
      "exact" — differentiate through the full RK4 step (the reference's
        variational RK4; 4 dynamics evals under a (nx+nu)-wide jacfwd).
      "node"  — linearize the continuous dynamics once at the node and
        discretize the *linearization* with the RK4 matrix polynomial
        Phi = I + hA + (hA)^2/2 + (hA)^3/6 + (hA)^4/24,
        Gamma = h (I + hA/2 + (hA)^2/6 + (hA)^3/24) B  (ZOH input).
        The primal defect still uses exact RK4; only the sensitivity freezes
        A,B at the node (error O(h^2) in the Jacobian, none in the rollout).
        Requires `ocp.fused_node(t,x,u,p) -> (NodeTerms, x_dot)`; the x- and
        u-tangent passes are split so the u-pass only traverses the (cheap)
        u-dependent subgraph — JAX prunes zero-tangent ops at trace time.
      "midpoint" — like "node" but A,B are frozen at the RK4 *midpoint*
        state x + (h/2) k1 (exp(h·A_mid) is the O(h^3) Magnus/midpoint
        approximation of the exact state-transition matrix vs O(h^2) at the
        node). Costs one extra flow linearization; the cost/constraint terms
        are still linearized once at the node via `fused_node`.
    """
    if sensitivity not in ("exact", "node", "midpoint"):
        raise ValueError(f"unknown sensitivity mode {sensitivity!r}")
    use_fused = sensitivity in ("node", "midpoint") and hasattr(ocp, "fused_node")

    def combined(t, x, u, p):
        terms = ocp.node_terms(t, x, u, p)
        x_next = rk4_step(flow, t, x, u, dt)
        return terms.r, terms.h_log, terms.h_quad, terms.g, x_next, terms.h_log_mask

    def _gn_assemble(r, h_log, h_quad, g, hmask, Jr, Jhl, Jhq, Jg, lam, rho):
        """Gauss-Newton grad/Hessian over stacked z = (x, u) Jacobians."""
        pl1 = hmask * relaxed_log_barrier_d1(h_log, bp.log_mu, bp.log_delta)
        pl2 = hmask * relaxed_log_barrier_d2(h_log, bp.log_mu, bp.log_delta)
        pq1 = quadratic_barrier_d1(h_quad, bp.quad_mu, bp.quad_delta)
        pq2 = quadratic_barrier_d2(h_quad, bp.quad_mu, bp.quad_delta)
        g_al = rho * g + lam
        grad = Jr.T @ r + Jhl.T @ pl1 + Jhq.T @ pq1 + Jg.T @ g_al
        Hess = (
            Jr.T @ Jr
            + (Jhl.T * pl2) @ Jhl
            + (Jhq.T * pq2) @ Jhq
            + rho * (Jg.T @ Jg)
        )
        return grad, Hess

    def node_lq_exact(t, x, u, p, lam, rho):
        z = jnp.concatenate([x, u])
        nx = x.shape[0]

        def fz(z_):
            return combined(t, z_[:nx], z_[nx:], p)

        (r, h_log, h_quad, g, x_next, hmask), (Jr, Jhl, Jhq, Jg, Jf, _) = (
            fz(z), jax.jacfwd(fz)(z))

        grad, Hess = _gn_assemble(r, h_log, h_quad, g, hmask,
                                  Jr, Jhl, Jhq, Jg, lam, rho)
        terms = _Terms(r, h_log, hmask, h_quad, g)
        cost = node_cost_terms(terms, bp, lam, rho)
        c_pure = node_cost_terms(terms, bp, jnp.zeros_like(g), 1e-12)

        return (Jf[:, :nx], Jf[:, nx:], x_next,
                Hess[:nx, :nx], Hess[nx:, nx:], Hess[nx:, :nx],
                grad[:nx], grad[nx:], cost, jnp.max(jnp.abs(g)),
                g, Jg[:, :nx], Jg[:, nx:], c_pure, jnp.sum(g**2))

    def node_lq_fused(t, x, u, p, lam, rho):
        nx, nu = x.shape[0], u.shape[0]

        def fx(x_):
            terms, xdot = ocp.fused_node(t, x_, u, p)
            return (terms.r, terms.h_log, terms.h_quad, terms.g, xdot,
                    terms.h_log_mask)

        def fu(u_):
            terms, xdot = ocp.fused_node(t, x, u_, p)
            return terms.r, terms.h_log, terms.h_quad, terms.g, xdot

        # Basis tangents inherit the primal's varying-manual-axes type via
        # `+ 0 * primal` so `check_vma` inside shard_map accepts them (an
        # unvarying jnp.eye tangent vs a device-varying primal is rejected);
        # XLA folds the zero add.
        eye_x = jnp.eye(nx, dtype=x.dtype) + 0.0 * x[None, :]
        eye_u = jnp.eye(nu, dtype=u.dtype) + 0.0 * u[None, :]

        # one heavy linearization over x (the full rigid-body graph) ...
        (r, h_log, h_quad, g, k1, hmask), jvp_x = jax.linearize(fx, x)
        Jx = jax.vmap(jvp_x)(eye_x)
        Jr_x, Jhl_x, Jhq_x, Jg_x, Ac = jax.tree.map(
            lambda a: jnp.moveaxis(a, 0, -1), Jx[:5])
        # ... and one cheap linearization over u (x-only ops have symbolic-
        # zero tangents and are pruned from the tangent graph)
        _, jvp_u = jax.linearize(fu, u)
        Ju = jax.vmap(jvp_u)(eye_u)
        Jr_u, Jhl_u, Jhq_u, Jg_u, Bc = jax.tree.map(
            lambda a: jnp.moveaxis(a, 0, -1), Ju)

        # exact-RK4 primal step, reusing k1 from the fused evaluation
        if sensitivity == "midpoint":
            # relinearize the flow at the RK4 midpoint (heavy x-pass + cheap
            # u-pass); exp(h A_mid) matches the true transition matrix to
            # O(h^3) (midpoint/Magnus) instead of O(h^2) at the node
            x_mid = x + 0.5 * dt * k1
            t_mid = t + 0.5 * dt
            k2, jvp_fx = jax.linearize(lambda x_: flow(t_mid, x_, u), x_mid)
            Ac = jnp.moveaxis(jax.vmap(jvp_fx)(eye_x), 0, -1)
            _, jvp_fu = jax.linearize(lambda u_: flow(t_mid, x_mid, u_), u)
            Bc = jnp.moveaxis(jax.vmap(jvp_fu)(eye_u), 0, -1)
        else:
            k2 = flow(t + 0.5 * dt, x + 0.5 * dt * k1, u)
        k3 = flow(t + 0.5 * dt, x + 0.5 * dt * k2, u)
        k4 = flow(t + dt, x + dt * k3, u)
        x_next = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        # RK4 polynomial of the frozen linearization (Horner, batched matmuls)
        eye = jnp.eye(nx, dtype=x.dtype)
        hA = dt * Ac
        S = eye + (hA / 2.0) @ (eye + (hA / 3.0) @ (eye + hA / 4.0))
        A_d = eye + hA @ S
        B_d = dt * (S @ Bc)

        Jr = jnp.concatenate([Jr_x, Jr_u], axis=1)
        Jhl = jnp.concatenate([Jhl_x, Jhl_u], axis=1)
        Jhq = jnp.concatenate([Jhq_x, Jhq_u], axis=1)
        Jg = jnp.concatenate([Jg_x, Jg_u], axis=1)
        grad, Hess = _gn_assemble(r, h_log, h_quad, g, hmask,
                                  Jr, Jhl, Jhq, Jg, lam, rho)
        terms = _Terms(r, h_log, hmask, h_quad, g)
        cost = node_cost_terms(terms, bp, lam, rho)
        c_pure = node_cost_terms(terms, bp, jnp.zeros_like(g), 1e-12)

        return (A_d, B_d, x_next,
                Hess[:nx, :nx], Hess[nx:, nx:], Hess[nx:, :nx],
                grad[:nx], grad[nx:], cost, jnp.max(jnp.abs(g)),
                g, Jg_x, Jg_u, c_pure, jnp.sum(g**2))

    return node_lq_fused if use_fused else node_lq_exact


def make_lq_functions(ocp, flow, dt: float, N: int, bp: BarrierParams,
                      sensitivity: str = "exact"):
    """Returns (lq_approximation, total_cost, defects, eq_residuals) jittable
    closures over full [N(+1), ...] trajectories (see `make_node_lq` for the
    per-node contract and sensitivity modes)."""
    node_lq = make_node_lq(ocp, flow, dt, bp, sensitivity)

    def lq_approximation(traj: Trajectory, times, params, lam, rho) -> LQApprox:
        xs, us = traj.xs, traj.us
        stage_params = jax.tree.map(lambda a: a[:-1], params)
        (A, B, x_next, Qxx, Quu, Qux, qx, qu, costs, gmax,
         g_res, Cx, Du, c_pure, g_sse) = jax.vmap(
            node_lq, in_axes=(0, 0, 0, 0, 0, None)
        )(times[:-1], xs[:-1], us, stage_params, lam, rho)

        d = x_next - xs[1:]

        # terminal quadratic
        def term_res(x):
            return ocp.terminal_residual(times[-1], x, jax.tree.map(lambda a: a[-1], params))

        rT = term_res(xs[-1])
        JT = jax.jacfwd(term_res)(xs[-1])
        QN = JT.T @ JT
        qN = JT.T @ rT
        total_cost = jnp.sum(costs) + 0.5 * jnp.sum(rT**2)

        return LQApprox(A=A, B=B, d=d, Qxx=Qxx, Quu=Quu, Qux=Qux, qx=qx, qu=qu,
                        QN=QN, qN=qN, cost=total_cost,
                        g_norm=jnp.max(gmax),
                        defect_norm=jnp.max(jnp.abs(d)),
                        Cx=Cx, Du=Du, g_res=g_res,
                        cost_pure=jnp.sum(c_pure) + 0.5 * jnp.sum(rT**2),
                        viol=jnp.sqrt(jnp.sum(g_sse) + jnp.sum(d**2)))

    def total_cost(traj: Trajectory, times, params, lam, rho):
        """Nonlinear cost + AL terms (for line-search merit)."""
        def one(t, x, u, p, l):
            terms = ocp.node_terms(t, x, u, p)
            return node_cost_terms(terms, bp, l, rho), jnp.max(jnp.abs(terms.g))

        stage_params = jax.tree.map(lambda a: a[:-1], params)
        costs, gmax = jax.vmap(one)(times[:-1], traj.xs[:-1], traj.us, stage_params, lam)
        rT = ocp.terminal_residual(times[-1], traj.xs[-1],
                                   jax.tree.map(lambda a: a[-1], params))
        return jnp.sum(costs) + 0.5 * jnp.sum(rT**2), jnp.max(gmax)

    def cost_and_violation(traj: Trajectory, times, params):
        """(pure cost incl. barriers, SSE of equality residuals, max |g|) —
        the ocs2 PerformanceIndex pieces consumed by the filter line search."""
        def one(t, x, u, p):
            terms = ocp.node_terms(t, x, u, p)
            c = node_cost_terms(terms, bp, jnp.zeros_like(terms.g), 1e-12)
            return c, jnp.sum(terms.g**2), jnp.max(jnp.abs(terms.g))

        stage_params = jax.tree.map(lambda a: a[:-1], params)
        costs, g_sse, gmax = jax.vmap(one)(times[:-1], traj.xs[:-1], traj.us,
                                           stage_params)
        rT = ocp.terminal_residual(times[-1], traj.xs[-1],
                                   jax.tree.map(lambda a: a[-1], params))
        return (jnp.sum(costs) + 0.5 * jnp.sum(rT**2), jnp.sum(g_sse),
                jnp.max(gmax))

    def defects(traj: Trajectory, times):
        x_next = jax.vmap(lambda t, x, u: rk4_step(flow, t, x, u, dt))(
            times[:-1], traj.xs[:-1], traj.us)
        return x_next - traj.xs[1:]

    def eq_residuals(traj: Trajectory, times, params):
        stage_params = jax.tree.map(lambda a: a[:-1], params)
        return jax.vmap(lambda t, x, u, p: ocp.node_terms(t, x, u, p).g)(
            times[:-1], traj.xs[:-1], traj.us, stage_params)

    use_fused = hasattr(ocp, "fused_node")

    def candidate_perf(traj: Trajectory, times, params):
        """(pure cost, total violation) for one line-search candidate in a
        SINGLE node sweep: with `ocp.fused_node` the RK4's k1 shares the
        rigid-body pass with the cost/constraint terms (4 passes per node
        instead of the 5 a separate cost_and_violation + defects pair costs
        — the line search is the hottest phase of the solve)."""
        def one(t, x, u, p, x_next_ref):
            if use_fused:
                terms, k1 = ocp.fused_node(t, x, u, p)
            else:
                terms = ocp.node_terms(t, x, u, p)
                k1 = flow(t, x, u)
            c = node_cost_terms(terms, bp, jnp.zeros_like(terms.g), 1e-12)
            k2 = flow(t + 0.5 * dt, x + 0.5 * dt * k1, u)
            k3 = flow(t + 0.5 * dt, x + 0.5 * dt * k2, u)
            k4 = flow(t + dt, x + dt * k3, u)
            x_next = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            d = x_next - x_next_ref
            return c, jnp.sum(terms.g**2) + jnp.sum(d**2)

        stage_params = jax.tree.map(lambda a: a[:-1], params)
        cs, v_sse = jax.vmap(one)(times[:-1], traj.xs[:-1], traj.us,
                                  stage_params, traj.xs[1:])
        rT = ocp.terminal_residual(times[-1], traj.xs[-1],
                                   jax.tree.map(lambda a: a[-1], params))
        return jnp.sum(cs) + 0.5 * jnp.sum(rT**2), jnp.sqrt(jnp.sum(v_sse))

    return (lq_approximation, total_cost, defects, eq_residuals,
            cost_and_violation, candidate_perf)
