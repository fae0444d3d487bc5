"""SQP solver: the TPU-native heart of the framework.

Replaces ocs2's `SqpSolver` + HPIPM QP backend (SURVEY.md §3.1 hot loop):

    per iteration (all inside one jit):
      1. batched LQ approximation (one jacfwd per node, vmapped)
      2. Riccati backward pass (lax.scan) with Levenberg regularization
      3. linear forward pass -> (dx, du)
      4. PARALLEL line search: all step sizes evaluated in one vmap, first
         merit-decreasing alpha selected (replaces the sequential
         backtracking linesearch of the reference)
      5. augmented-Lagrangian multiplier update on the equality constraints

    benchmarks = {lq_time, qp_time (riccati), linesearch_time} mirror the
    reference's published per-solve timings (`SqpBenchmarksPublisher.cpp:44-57`).

Everything is shaped [N, ...] with static sizes; `jax.vmap` over a leading
batch axis yields the batched-instances solver used for scaling benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.ocp.base import BarrierParams
from wb_humanoid_mpc_tpu.solver.priccati import (
    parallel_backward_pass,
    parallel_forward_pass,
)
from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass
from wb_humanoid_mpc_tpu.solver.transcription import (
    LQApprox,
    Trajectory,
    make_lq_functions,
)


class SqpSolution(NamedTuple):
    traj: Trajectory
    lam: jnp.ndarray        # [N, n_eq] AL multipliers
    cost: jnp.ndarray
    g_norm: jnp.ndarray     # max |equality residual|
    defect_norm: jnp.ndarray
    step_size: jnp.ndarray  # last accepted alpha
    iterations: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SqpSolverConfig:
    n_nodes: int            # N shooting intervals
    dt: float
    sqp_iterations: int = 1
    rho: float = 1e3        # AL penalty parameter
    reg: float = 1e-6       # Levenberg regularization on Quu
    alphas: tuple = (1.0, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05, 0.01)
    defect_weight: float = 1e2  # merit weight on shooting defects
    armijo: float = 1e-4
    parallel_riccati: bool = False  # associative-scan O(log N) backward pass
    lam_max: float = 1e4        # AL multiplier clamp
    al_decrease: float = 0.9    # require this decrease for updates at large g
    al_update_threshold: float = 0.5  # always update multipliers below this |g|
    equality_handling: str = "projection"  # "projection" (exact, reference-like) | "al"
    proj_eps: float = 1e-8      # damping of the constraint pseudo-inverse
    sensitivity: str = "node"   # "node" (frozen-A RK4 polynomial, 1 linearization)
                                # | "exact" (differentiate through all RK4 stages)


def make_sqp_solver(ocp, flow, bp: BarrierParams, cfg: SqpSolverConfig) -> Callable:
    """Returns solve(t0, x0, init_traj, params, lam) -> SqpSolution (jittable)."""

    lq_approx, total_cost, defects_fn, eq_fn = make_lq_functions(
        ocp, flow, cfg.dt, cfg.n_nodes, bp, sensitivity=cfg.sensitivity)
    alphas = jnp.asarray(cfg.alphas)

    def merit(traj, times, params, lam):
        c, gmax = total_cost(traj, times, params, lam, cfg.rho)
        d = defects_fn(traj, times)
        return c + cfg.defect_weight * jnp.sum(jnp.abs(d)), gmax

    # With exact projection the equality penalty must NOT dominate the LQ
    # cost: its rho*Jg^T Jg Gauss-Newton block only cancels on the constraint
    # null space up to roundoff, and at rho ~ 1e3 the float32 cancellation
    # residue makes the reduced Hessian indefinite (Riccati blow-up). A unit
    # weight keeps mild curvature toward feasibility with benign conditioning;
    # the AL path keeps the full rho. The line-search merit always uses cfg.rho.
    rho_lq = cfg.rho if cfg.equality_handling == "al" else min(cfg.rho, 1.0)

    def sqp_iteration(carry, _):
        traj, lam, g_prev, times, params, x0 = carry

        lq = lq_approx(traj, times, params, lam, rho_lq)
        dx0 = x0 - traj.xs[0]
        if cfg.equality_handling == "projection":
            reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, cfg.proj_eps)
            if cfg.parallel_riccati:
                sol = parallel_backward_pass(reduced, cfg.reg)
                dxs, dzs = parallel_forward_pass(reduced, sol, dx0)
            else:
                sol = backward_pass(reduced, cfg.reg)
                dxs, dzs = forward_pass(reduced, sol, dx0)
            dus = recover_controls(proj, dxs, dzs)
        elif cfg.parallel_riccati:
            sol = parallel_backward_pass(lq, cfg.reg)
            dxs, dus = parallel_forward_pass(lq, sol, dx0)
        else:
            sol = backward_pass(lq, cfg.reg)
            dxs, dus = forward_pass(lq, sol, dx0)

        merit0, _ = merit(traj, times, params, lam)

        def try_alpha(a):
            cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
            m, _ = merit(cand, times, params, lam)
            return m

        merits = jax.vmap(try_alpha)(alphas)
        # a candidate that produced NaN/inf must never be selected
        merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
        # expected decrease heuristic: accept first alpha whose merit improves
        ok = merits < merit0 - cfg.armijo * alphas * jnp.abs(merit0)
        # fall back to the best candidate if none qualifies
        first_ok = jnp.argmax(ok)
        any_ok = jnp.any(ok)
        best = jnp.argmin(merits)
        pick = jnp.where(any_ok, first_ok, best)
        improved = jnp.where(any_ok, jnp.ones(()), (merits[best] < merit0).astype(jnp.float32))
        alpha = alphas[pick] * improved  # alpha = 0 -> keep current traj

        new_traj = Trajectory(xs=traj.xs + alpha * dxs, us=traj.us + alpha * dus)

        # Safeguarded AL multiplier update: only when the equality violation
        # actually decreased (updating multipliers on an unconverged
        # subproblem destabilizes the iteration), and clamped.
        g = eq_fn(new_traj, times, params)
        g_max = jnp.max(jnp.abs(g))
        if cfg.equality_handling == "projection":
            # equalities handled exactly in the subproblem; no multipliers
            new_lam = lam
        else:
            # polish when already nearly feasible; at large violation only
            # reward genuine progress (prevents multiplier blow-up)
            do_update = jnp.logical_or(g_max < cfg.al_update_threshold,
                                       g_max < cfg.al_decrease * g_prev)
            new_lam = jnp.where(do_update, lam + cfg.rho * g, lam)
            new_lam = jnp.clip(new_lam, -cfg.lam_max, cfg.lam_max)

        stats = (lq.cost, g_max, lq.defect_norm, alpha)
        return (new_traj, new_lam, g_max, times, params, x0), stats

    def solve(t0, x0, init_traj: Trajectory, params, lam):
        times = t0 + cfg.dt * jnp.arange(cfg.n_nodes + 1)
        g0 = jnp.max(jnp.abs(eq_fn(init_traj, times, params)))
        carry = (init_traj, lam, g0, times, params, x0)
        carry, stats = jax.lax.scan(
            sqp_iteration, carry, None, length=cfg.sqp_iterations)
        traj, lam_out, _, _, _, _ = carry
        costs, gnorms, dnorms, alphas_used = stats
        return SqpSolution(
            traj=traj,
            lam=lam_out,
            cost=costs[-1],
            g_norm=gnorms[-1],
            defect_norm=dnorms[-1],
            step_size=alphas_used[-1],
            iterations=jnp.asarray(cfg.sqp_iterations),
        )

    return solve
