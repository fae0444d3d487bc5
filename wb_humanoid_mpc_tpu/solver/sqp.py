"""SQP solver: the TPU-native heart of the framework.

Replaces ocs2's `SqpSolver` + HPIPM QP backend (SURVEY.md §3.1 hot loop):

    per iteration (all inside one jit):
      1. batched LQ approximation (one fused linearization per node, vmapped)
      2. equality projection + Riccati backward pass (sequential `lax.scan`
         or associative-scan O(log N)) with relative Levenberg regularization
      3. linear forward pass -> (dx, du)
      4. PARALLEL line search: all step sizes evaluated in one vmap, the
         best (lowest-merit) candidate selected (replaces the sequential
         backtracking linesearch of the reference)
      5. augmented-Lagrangian multiplier update on the equality constraints
         (AL mode only; the default handles equalities by exact projection)

    `make_sqp_solver` fuses all phases into one XLA program (the production
    path — per-phase timings are unmeasurable inside it by construction).
    `make_staged_sqp_solver` jits each phase separately and returns per-phase
    wall times {lq, projection, riccati, linesearch} per solve — the
    reference's benchmark contract (`SqpBenchmarksPublisher.cpp:44-57`,
    {LQ approximation, QP solve, linesearch, controller}).

Everything is shaped [N, ...] with static sizes; `jax.vmap` over a leading
batch axis yields the batched-instances solver used for scaling benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.ocp.base import BarrierParams
from wb_humanoid_mpc_tpu.ops.riccati import riccati_rollout
from wb_humanoid_mpc_tpu.solver.linesearch import filter_accept
from wb_humanoid_mpc_tpu.solver.priccati import (
    parallel_backward_pass,
    parallel_forward_pass,
)
from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls
from wb_humanoid_mpc_tpu.solver.riccati import levenberg_damp
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
    # Relative Levenberg trust-region damping: Quu += reg * max(diag(Quu), 1)
    # applied to the (projected) stage data BEFORE the Riccati solve — i.e.
    # the damping is part of the QP definition, identical for the sequential
    # scan, the associative-scan O(log N) pass, and the horizon-sharded
    # distributed pass. (Round 3 instead damped Quu_h = Quu + B'PB inside
    # each sequential Riccati step — a rule the associative scan cannot
    # reproduce, because P is a scan output; the sharded and sequential
    # solvers then solved materially different QPs at reg=1e-2 and the
    # multichip equivalence gate failed. Pre-damping removes the ambiguity.)
    # This is a trust-region knob, not a numerical-jitter knob: the G1 task
    # files price contact wrenches at ~3e-6 (R scaling 1e-3, `g1_wb_mpc
    # task.info` R block), so the QP sees a near-free internal-force null
    # space whose |du| ~ 50 N proposals are only limited by this damping.
    reg: float = 1e-2
    # numerical jitter inside the Riccati factorizations (relative, keeps the
    # Cholesky PD); small enough that all solver variants agree to float
    # tolerance
    reg_num: float = 1e-8
    alphas: tuple = (1.0, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05, 0.01)
    defect_weight: float = 1e2  # merit weight on shooting defects
    parallel_riccati: bool = False  # associative-scan O(log N) backward pass
    lam_max: float = 1e4        # AL multiplier clamp
    al_decrease: float = 0.9    # require this decrease for updates at large g
    al_update_threshold: float = 0.5  # always update multipliers below this |g|
    equality_handling: str = "projection"  # "projection" (exact, reference-like) | "al"
    proj_eps: float = 1e-8      # damping of the constraint pseudo-inverse
    sensitivity: str = "node"   # "node" (frozen-A RK4 polynomial, 1 linearization)
                                # | "midpoint" (A,B at the RK4 midpoint, O(h^3))
                                # | "exact" (differentiate through all RK4 stages)
    # Line search. "filter" reproduces ocs2's FilterLinesearch (the reference
    # solver's globalization; `multiple_shooting.{g_max,g_min}` in task.info) —
    # acceptance rule in `solver/linesearch.py::filter_accept` (branches on
    # the CANDIDATE violation, per ocs2).
    # The AL-merit search ("merit") rejects feasibility-restoring steps when
    # the tracking-cost increase outweighs the penalty decrease — observed to
    # equilibrate walking solves at |g| ~ 0.1 instead of converging.
    line_search: str = "filter"
    filter_g_max: float = 1e-2  # reference task.info multiple_shooting.g_max
    filter_g_min: float = 1e-6  # reference task.info multiple_shooting.g_min
    # LQ-solve backend: "auto" = the fused backward-Riccati + forward-
    # rollout Pallas kernel on TPU (ops/riccati.py, the whole QP solve in
    # one launch), lax.scan pair elsewhere; "scan" forces XLA; "interpret"
    # runs the Pallas kernel in interpret mode (CPU equivalence tests).
    rollout_backend: str = "auto"


def make_sqp_solver(ocp, flow, bp: BarrierParams, cfg: SqpSolverConfig) -> Callable:
    """Returns solve(t0, x0, init_traj, params, lam) -> SqpSolution (jittable)."""

    (lq_approx, total_cost, defects_fn, eq_fn, cost_violation,
     candidate_perf) = make_lq_functions(
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
            reduced = levenberg_damp(reduced, cfg.reg)
            if cfg.parallel_riccati:
                sol = parallel_backward_pass(reduced, cfg.reg_num)
                dxs, dzs = parallel_forward_pass(reduced, sol, dx0)
            else:
                # fused backward-Riccati + forward-rollout Pallas kernel on
                # TPU (ops/riccati.py, ONE launch); lax.scan pair elsewhere
                dxs, dzs = riccati_rollout(reduced, dx0, cfg.reg_num,
                                           cfg.rollout_backend)
            dus = recover_controls(proj, dxs, dzs)
        else:
            lq_d = levenberg_damp(lq, cfg.reg)
            if cfg.parallel_riccati:
                sol = parallel_backward_pass(lq_d, cfg.reg_num)
                dxs, dus = parallel_forward_pass(lq_d, sol, dx0)
            else:
                dxs, dus = riccati_rollout(lq_d, dx0, cfg.reg_num,
                                           cfg.rollout_backend)

        if cfg.line_search == "filter":
            # ocs2 FilterLinesearch (see SqpSolverConfig docstring): the
            # LARGEST accepted step wins (alphas ordered descending). The
            # baseline (c0, v0) is a free byproduct of the LQ pass (same
            # NodeTerms), and the candidate evaluation is two-staged: the
            # top-2 steps are tried first and the remaining ladder is only
            # evaluated (lax.cond) when both fail — near-converged MPC
            # re-solves accept the full step almost always, so the common
            # case pays 2 candidate sweeps instead of 8. Selection is
            # EXACTLY the all-at-once rule: if a top step is accepted the
            # lower ones cannot win. (Under vmap the cond becomes a select
            # and both stages run — batched throughput is unchanged.)
            c0, v0 = lq.cost_pure, lq.viol

            def try_alpha(a):
                cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
                return candidate_perf(cand, times, params)

            n_hi = 2
            cs_hi, vs_hi = jax.vmap(try_alpha)(alphas[:n_hi])
            ok_hi = filter_accept(c0, v0, cs_hi, vs_hi,
                                  cfg.filter_g_max, cfg.filter_g_min)

            def eval_rest(_):
                cs_lo, vs_lo = jax.vmap(try_alpha)(alphas[n_hi:])
                return filter_accept(c0, v0, cs_lo, vs_lo,
                                     cfg.filter_g_max, cfg.filter_g_min)

            ok_lo = jax.lax.cond(
                jnp.any(ok_hi),
                lambda _: jnp.zeros(alphas.shape[0] - n_hi, bool),
                eval_rest, None)
            ok = jnp.concatenate([ok_hi, ok_lo])
            alpha = alphas[jnp.argmax(ok)] * jnp.any(ok).astype(alphas.dtype)
        else:
            merit0, _ = merit(traj, times, params, lam)

            def try_alpha(a):
                cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
                m, _ = merit(cand, times, params, lam)
                return m

            merits = jax.vmap(try_alpha)(alphas)
            # a candidate that produced NaN/inf must never be selected
            merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
            # Backtracking rule: the LARGEST step that decreases the merit.
            # Taking the merit argmin instead was tried in round 3 and
            # REGRESSES the closed loop: the AL-heavy merit argmin favors
            # tiny constraint-pleasing steps and receding-horizon recovery is
            # procrastinated forever (dummy-sim base sagged ~1-4 cm/s).
            ok = merits < merit0
            best = jnp.argmin(merits)
            pick = jnp.where(jnp.any(ok), jnp.argmax(ok), best)
            improved = (merits[pick] < merit0).astype(merits.dtype)
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


class PhaseTimings(NamedTuple):
    """Per-solve wall times by phase [s], one entry per SQP iteration summed.

    Mirrors the reference's `SqpSolver::Benchmarks` fields streamed on
    `/humanoid/mpc_benchmarks` (`SqpBenchmarksPublisher.cpp:44-57`):
    lq <-> linearQuadraticApproximationTime, projection + riccati <->
    solveQpTime, linesearch <-> linesearchTime.
    """
    lq: float
    projection: float
    riccati: float
    linesearch: float


def make_staged_sqp_solver(ocp, flow, bp: BarrierParams, cfg: SqpSolverConfig):
    """Per-phase-timed SQP solve (diagnostic twin of `make_sqp_solver`).

    Each phase is its own jitted XLA program so real device wall times can be
    measured around `block_until_ready` boundaries. ~10-20% slower than the
    fused production solver (host dispatch between phases) — use for
    benchmarking/profiling, not in the control loop.

    Returns solve(t0, x0, init_traj, params, lam) -> (SqpSolution, PhaseTimings).
    """
    import time as _time

    if cfg.equality_handling != "projection":
        raise ValueError("staged solver only implements the projection path")

    (lq_approx, total_cost, defects_fn, eq_fn, cost_violation,
     candidate_perf) = make_lq_functions(
        ocp, flow, cfg.dt, cfg.n_nodes, bp, sensitivity=cfg.sensitivity)
    alphas = jnp.asarray(cfg.alphas)
    rho_lq = cfg.rho if cfg.equality_handling == "al" else min(cfg.rho, 1.0)

    @jax.jit
    def f_lq(traj, times, params, lam):
        return lq_approx(traj, times, params, lam, rho_lq)

    @jax.jit
    def f_project(lq):
        reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, cfg.proj_eps)
        return levenberg_damp(reduced, cfg.reg), proj

    @jax.jit
    def f_riccati(reduced, dx0):
        if cfg.parallel_riccati:
            sol = parallel_backward_pass(reduced, cfg.reg_num)
            return parallel_forward_pass(reduced, sol, dx0)
        return riccati_rollout(reduced, dx0, cfg.reg_num, cfg.rollout_backend)

    @jax.jit
    def f_linesearch(traj, times, params, lam, c0, v0, dxs, dus):
        # ocs2 FilterLinesearch, same rule as the fused solver; baseline
        # (c0, v0) comes from the LQ byproducts
        def try_alpha(a):
            cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
            return candidate_perf(cand, times, params)

        cs, vs = jax.vmap(try_alpha)(alphas)
        ok = filter_accept(c0, v0, cs, vs, cfg.filter_g_max, cfg.filter_g_min)
        alpha = alphas[jnp.argmax(ok)] * jnp.any(ok).astype(alphas.dtype)
        new_traj = Trajectory(xs=traj.xs + alpha * dxs, us=traj.us + alpha * dus)
        g = eq_fn(new_traj, times, params)
        return new_traj, alpha, jnp.max(jnp.abs(g))

    @jax.jit
    def f_recover(proj, dxs, dzs):
        return recover_controls(proj, dxs, dzs)

    def solve(t0, x0, init_traj: Trajectory, params, lam):
        times = t0 + cfg.dt * jnp.arange(cfg.n_nodes + 1)
        traj = init_traj
        t_lq = t_proj = t_ric = t_ls = 0.0
        alpha = g_max = jnp.zeros(())
        lq = None
        for _ in range(cfg.sqp_iterations):
            t0_ = _time.perf_counter()
            lq = jax.block_until_ready(f_lq(traj, times, params, lam))
            t_lq += _time.perf_counter() - t0_

            dx0 = x0 - traj.xs[0]
            t0_ = _time.perf_counter()
            reduced, proj = jax.block_until_ready(f_project(lq))
            t_proj += _time.perf_counter() - t0_

            t0_ = _time.perf_counter()
            dxs, dzs = jax.block_until_ready(f_riccati(reduced, dx0))
            dus = jax.block_until_ready(f_recover(proj, dxs, dzs))
            t_ric += _time.perf_counter() - t0_

            t0_ = _time.perf_counter()
            traj, alpha, g_max = jax.block_until_ready(
                f_linesearch(traj, times, params, lam,
                             lq.cost_pure, lq.viol, dxs, dus))
            t_ls += _time.perf_counter() - t0_

        d = defects_fn(traj, times)
        sol = SqpSolution(
            traj=traj, lam=lam, cost=lq.cost, g_norm=g_max,
            defect_norm=jnp.max(jnp.abs(d)), step_size=alpha,
            iterations=jnp.asarray(cfg.sqp_iterations))
        return sol, PhaseTimings(lq=t_lq, projection=t_proj, riccati=t_ric,
                                 linesearch=t_ls)

    return solve
