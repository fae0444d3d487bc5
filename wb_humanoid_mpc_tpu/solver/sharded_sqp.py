"""2-D (batch x horizon) sharded SQP: the full solve under one `shard_map`.

The multi-chip data plane mandated by SURVEY.md §2.5 item 5 / §5.7: scenario
instances shard over the `dp` mesh axis (embarrassingly parallel), and the
horizon shards over the `h` axis so that EVERY phase of the solve —
LQ linearization, equality projection, Riccati, line search — runs on the
device owning that horizon block:

  - LQ linearization + projection: per-node, no communication;
  - backward Riccati: local associative scan + one `all_gather` of per-block
    Schur-complement summary elements (`parallel/horizon.py`);
  - forward rollout: affine prefix scan, same pattern;
  - shooting defects: one `ppermute` (neighbor's first state);
  - line-search merit: local node-cost sums + one `psum` per candidate set.

All collectives ride ICI inside one XLA program; the host sees a single jit
call. Equality handling is the projection path (the production default).
Results match `jax.vmap(make_sqp_solver(...))` to float tolerance
(tests/test_sharded_sqp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from wb_humanoid_mpc_tpu.ocp.base import BarrierParams
from wb_humanoid_mpc_tpu.solver.linesearch import filter_accept
from wb_humanoid_mpc_tpu.parallel.horizon import (
    _identity_elem,
    block_backward_gains,
    block_forward_rollout,
)
from wb_humanoid_mpc_tpu.solver.priccati import _Elem, stage_leaf
from wb_humanoid_mpc_tpu.solver.projection import project_node
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolution, SqpSolverConfig
from wb_humanoid_mpc_tpu.solver.transcription import (
    Trajectory,
    make_node_lq,
    node_cost_terms,
    rk4_step,
)


def make_sharded_sqp_solver(ocp, flow, bp: BarrierParams, cfg: SqpSolverConfig,
                            mesh: Mesh, batch_axis: str = "dp",
                            horizon_axis: str = "h"):
    """Returns solve(t0, x0s[B], init_traj[B], params[B], lam[B]) -> SqpSolution
    (leaves batched over B), jitted over `mesh` with the batch sharded along
    `batch_axis` and the horizon along `horizon_axis`."""
    if cfg.equality_handling != "projection":
        raise ValueError("sharded solver implements the projection path only")

    N = cfg.n_nodes
    H = mesh.shape[horizon_axis]
    M = N + 1                         # elements incl. terminal
    K = -(-M // H)                    # elements per device (ceil)
    ME = K * H
    dt = cfg.dt
    node_lq = make_node_lq(ocp, flow, dt, bp, cfg.sensitivity)
    proj_one = project_node(cfg.proj_eps)
    rho_lq = min(cfg.rho, 1.0)
    alphas = jnp.asarray(cfg.alphas)

    def node_perf(t, x, u, p):
        """(pure cost, SSE(g), max|g|) per node — filter line-search pieces."""
        terms = ocp.node_terms(t, x, u, p)
        c = node_cost_terms(terms, bp, jnp.zeros_like(terms.g), 1e-12)
        return c, jnp.sum(terms.g**2), jnp.max(jnp.abs(terms.g))

    def term_quad(t, x, p):
        rT = ocp.terminal_residual(t, x, p)
        JT = jax.jacfwd(lambda x_: ocp.terminal_residual(t, x_, p))(x)
        return JT.T @ JT, JT.T @ rT, 0.5 * jnp.sum(rT**2)

    spec_bh = P(batch_axis, horizon_axis)
    spec_b = P(batch_axis)

    def shift_left(x, axis_name):
        """[B, K, ...] -> entry k+1 (next block's first row fills the last)."""
        n_dev = jax.lax.axis_size(axis_name)
        perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]
        first_next = jax.lax.ppermute(x[:, 0:1], axis_name, perm)
        return jnp.concatenate([x[:, 1:], first_next], axis=1)

    def body(t0, x0, xs, us, params, lam, node_idx):
        # local shapes: xs [B, K, nx], us [B, K, nu], params [B, K, ...],
        # lam [B, K, n_eq], node_idx [K], x0 [B, nx] (replicated over h)
        times = t0 + dt * node_idx                     # [K]
        t_term = t0 + dt * N
        stage_valid = node_idx < N                     # [K]
        is_term = node_idx == N
        nx = xs.shape[-1]
        dtype = xs.dtype
        i_h = jax.lax.axis_index(horizon_axis)

        def merit_parts(xs_, us_):
            """(cost, violation, g_max, d_max) per batch element — psum'd
            over the horizon (ocs2 PerformanceIndex for the filter search)."""
            costs, g_sse, gmax = jax.vmap(jax.vmap(
                node_perf, in_axes=(0, 0, 0, 0)),
                in_axes=(None, 0, 0, 0))(times, xs_, us_, params)
            cT = jax.vmap(jax.vmap(
                lambda x_, p_: term_quad(t_term, x_, p_)[2]))(xs_, params)
            c_loc = jnp.sum(jnp.where(stage_valid, costs, 0.0), axis=1) \
                + jnp.sum(jnp.where(is_term, cT, 0.0), axis=1)
            x_next = jax.vmap(jax.vmap(
                lambda t, x, u: rk4_step(flow, t, x, u, dt),
                in_axes=(0, 0, 0)), in_axes=(None, 0, 0))(times, xs_, us_)
            d = x_next - shift_left(xs_, horizon_axis)
            d = jnp.where(stage_valid[None, :, None], d, 0.0)
            v_loc = (jnp.sum(jnp.where(stage_valid, g_sse, 0.0), axis=1)
                     + jnp.sum(d**2, axis=(1, 2)))
            g_loc = jnp.max(jnp.where(stage_valid, gmax, 0.0), axis=1)
            cost = jax.lax.psum(c_loc, horizon_axis)
            viol = jnp.sqrt(jax.lax.psum(v_loc, horizon_axis))
            g_max = jax.lax.pmax(g_loc, horizon_axis)
            d_max = jax.lax.pmax(jnp.max(jnp.abs(d), axis=(1, 2)), horizon_axis)
            return cost, viol, g_max, d_max

        def one_iteration(carry, _):
            xs, us = carry
            # ---- LQ + projection per local node ----
            outs = jax.vmap(jax.vmap(
                lambda t, x, u, p, l: node_lq(t, x, u, p, l, rho_lq),
                in_axes=(0, 0, 0, 0, 0)), in_axes=(None, 0, 0, 0, 0))(
                times, xs, us, params, lam)
            (A, B, x_next, Qxx, Quu, Qux, qx, qu, cost_n, gmax_n,
             g, Cx, Du, c_pure_n, g_sse_n) = outs
            d = x_next - shift_left(xs, horizon_axis)
            d = jnp.where(stage_valid[None, :, None], d, 0.0)

            (A_r, B_r, d_r, Qxx_r, Quu_r, Qux_r, qx_r, qu_r,
             Lp, Zp, wp) = jax.vmap(jax.vmap(proj_one))(
                A, B, d, Qxx, Quu, Qux, qx, qu, Cx, Du, g)

            # Levenberg trust-region damping folded into the stage data —
            # the SAME damped QP the unsharded solver defines via
            # `levenberg_damp` (solver/riccati.py); keep in lockstep.
            nzu = Quu_r.shape[-1]
            scale = jnp.maximum(
                jnp.max(jnp.diagonal(Quu_r, axis1=-2, axis2=-1), axis=-1), 1.0)
            Quu_r = Quu_r + (cfg.reg * scale)[..., None, None] \
                * jnp.eye(nzu, dtype=dtype)

            # ---- scan elements: stage leaf / terminal / identity ----
            leaf = jax.vmap(jax.vmap(
                lambda *a: stage_leaf(*a, cfg.reg_num)))(
                A_r, B_r, d_r, Qxx_r, Quu_r, Qux_r, qx_r, qu_r)
            QN_rows, qN_rows, _ = jax.vmap(jax.vmap(
                lambda x_, p_: term_quad(t_term, x_, p_)))(xs, params)
            ident = _identity_elem(nx, K, dtype)

            def sel(leaf_l, term_l, ident_l):
                # broadcast masks over [B, K, ...]
                sv = stage_valid.reshape((1, K) + (1,) * (leaf_l.ndim - 2))
                it = is_term.reshape((1, K) + (1,) * (leaf_l.ndim - 2))
                return jnp.where(sv, leaf_l, jnp.where(it, term_l, ident_l[None]))

            zM = jnp.zeros((xs.shape[0], K, nx, nx), dtype)
            zv = jnp.zeros((xs.shape[0], K, nx), dtype)
            elems = _Elem(
                A=sel(leaf.A, zM, ident.A), b=sel(leaf.b, zv, ident.b),
                C=sel(leaf.C, zM, ident.C), J=sel(leaf.J, QN_rows, ident.J),
                eta=sel(leaf.eta, -qN_rows, ident.eta))

            # ---- distributed backward + forward ----
            Kg, kg = jax.vmap(
                lambda e, *s: block_backward_gains(e, *s, horizon_axis,
                                                   cfg.reg_num)
            )(elems, A_r, B_r, d_r, Qxx_r, Quu_r, Qux_r, qx_r, qu_r)

            F = A_r + jnp.einsum("bkij,bkjl->bkil", B_r, Kg)
            f = d_r + jnp.einsum("bkij,bkj->bki", B_r, kg)
            eyeN = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), F.shape)
            F = jnp.where(stage_valid[None, :, None, None], F, eyeN)
            f = jnp.where(stage_valid[None, :, None], f, 0.0)
            dx0 = jax.lax.psum(
                jnp.where(i_h == 0, x0 - xs[:, 0], jnp.zeros_like(x0)),
                horizon_axis)
            dx_here, _ = jax.vmap(
                lambda F_, f_, dx0_: block_forward_rollout(F_, f_, dx0_,
                                                           horizon_axis)
            )(F, f, dx0)
            dzs = jnp.einsum("bkij,bkj->bki", Kg, dx_here) + kg
            dus = (jnp.einsum("bkij,bkj->bki", Lp, dx_here)
                   + jnp.einsum("bkij,bkj->bki", Zp, dzs) + wp)

            # ---- parallel FILTER line search (per batch element) ----
            # baseline (c0, v0) from the LQ byproducts (same NodeTerms the
            # linearization evaluated — keep in lockstep with make_sqp_solver)
            cT0 = jax.vmap(jax.vmap(
                lambda x_, p_: term_quad(t_term, x_, p_)[2]))(xs, params)
            c0 = jax.lax.psum(
                jnp.sum(jnp.where(stage_valid, c_pure_n, 0.0), axis=1)
                + jnp.sum(jnp.where(is_term, cT0, 0.0), axis=1), horizon_axis)
            v0 = jnp.sqrt(jax.lax.psum(
                jnp.sum(jnp.where(stage_valid, g_sse_n, 0.0), axis=1)
                + jnp.sum(d**2, axis=(1, 2)), horizon_axis))

            def try_alpha(a):
                c, v, _, _ = merit_parts(xs + a * dx_here, us + a * dus)
                return c, v

            cs, vs = jax.vmap(try_alpha)(alphas)          # [n_alpha, B]
            ok = filter_accept(c0[None], v0[None], cs, vs,
                               cfg.filter_g_max, cfg.filter_g_min)
            pick = jnp.argmax(ok, axis=0)                 # [B]
            alpha = alphas[pick] * jnp.any(ok, axis=0).astype(dtype)  # [B]
            xs = xs + alpha[:, None, None] * dx_here
            us = us + alpha[:, None, None] * dus

            _, _, g_max, d_max = merit_parts(xs, us)
            cost_tot = jax.lax.psum(
                jnp.sum(jnp.where(stage_valid, cost_n, 0.0), axis=1),
                horizon_axis)
            return (xs, us), (cost_tot, g_max, d_max, alpha)

        (xs, us), stats = jax.lax.scan(one_iteration, (xs, us), None,
                                       length=cfg.sqp_iterations)
        costs, gmaxs, dmaxs, alphas_used = stats
        return xs, us, costs[-1], gmaxs[-1], dmaxs[-1], alphas_used[-1]

    # spec pytree prefixes: a single PartitionSpec applies to every leaf of
    # the corresponding argument subtree (params is a NamedTuple of arrays)
    sharded_body = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), spec_b, spec_bh, spec_bh, spec_bh, spec_bh,
                  P(horizon_axis)),
        out_specs=(spec_bh, spec_bh, spec_b, spec_b, spec_b, spec_b))

    def solve(t0, x0s, init_traj: Trajectory, params, lam):
        B = x0s.shape[0]
        xs, us = init_traj.xs, init_traj.us        # [B, M, nx], [B, N, nu]

        def pad_elem(a):
            # pad element axis (1) to ME rows by repeating the last row
            rep = jnp.repeat(a[:, -1:], ME - a.shape[1], axis=1)
            return jnp.concatenate([a, rep], axis=1)

        xs_p = pad_elem(xs)
        us_p = pad_elem(us)                        # N -> ME rows
        params_p = jax.tree.map(pad_elem, params)
        lam_p = pad_elem(lam)
        node_idx = jnp.arange(ME)

        xs_o, us_o, cost, g, dmax, alpha = sharded_body(
            jnp.asarray(t0, xs.dtype), x0s, xs_p, us_p, params_p, lam_p,
            node_idx)
        traj = Trajectory(xs=xs_o[:, :M], us=us_o[:, :N])
        return SqpSolution(traj=traj, lam=lam, cost=cost, g_norm=g,
                           defect_norm=dmax, step_size=alpha,
                           iterations=jnp.asarray(cfg.sqp_iterations))

    return jax.jit(solve)
