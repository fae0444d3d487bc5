"""Gauss-Newton DDP (iLQR) solver — the reference's alternative solver.

Mirrors ocs2's `GaussNewtonDDP` role (SURVEY.md §2.4 ocs2_ddp; selectable via
the launch arg `solver: "sqp" | "ddp"`, reference `mpc_launch_config.py:37`).
Shares the LQ machinery with the SQP path; the difference is the forward pass:
instead of a *linear* update of both trajectories (multiple shooting), DDP
rolls the *nonlinear* dynamics closed-loop under the Riccati feedback policy

    u_k = u_bar_k + alpha * k_k + K_k (x_k - x_bar_k),
    x_{k+1} = F(x_k, u_k),

so defects are identically zero (single shooting) and the feedback gains are
exercised during the line search. All step sizes roll in parallel (vmap).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.ocp.base import BarrierParams
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolution, SqpSolverConfig
from wb_humanoid_mpc_tpu.solver.transcription import (
    Trajectory,
    make_lq_functions,
    rk4_step,
)


def make_ddp_solver(ocp, flow, bp: BarrierParams, cfg: SqpSolverConfig) -> Callable:
    """Returns solve(t0, x0, init_traj, params, lam) -> SqpSolution (jittable)."""

    lq_approx, total_cost, defects_fn, eq_fn, *_ = make_lq_functions(
        ocp, flow, cfg.dt, cfg.n_nodes, bp)
    alphas = jnp.asarray(cfg.alphas)

    def rollout(x0, traj, sol, alpha, times):
        def step(x, inp):
            t, x_bar, u_bar, K, k = inp
            u = u_bar + alpha * k + K @ (x - x_bar)
            x_next = rk4_step(flow, t, x, u, cfg.dt)
            return x_next, (x, u)

        xN, (xs, us) = jax.lax.scan(
            step, x0, (times[:-1], traj.xs[:-1], traj.us, sol.K, sol.k))
        return Trajectory(xs=jnp.concatenate([xs, xN[None]], axis=0), us=us)

    def ddp_iteration(carry, _):
        traj, lam, times, params, x0 = carry
        lq = lq_approx(traj, times, params, lam, cfg.rho)
        sol = backward_pass(lq, cfg.reg)

        cost0, _ = total_cost(traj, times, params, lam, cfg.rho)

        def try_alpha(a):
            cand = rollout(x0, traj, sol, a, times)
            c, _ = total_cost(cand, times, params, lam, cfg.rho)
            return c

        costs = jax.vmap(try_alpha)(alphas)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        # best candidate (all rollouts already evaluated in parallel)
        pick = jnp.argmin(costs)
        accept = costs[pick] < cost0
        alpha = jnp.where(accept, alphas[pick], 0.0)

        new_traj = rollout(x0, traj, sol, alpha, times)
        # if not accepted, keep previous trajectory but re-anchored at x0
        new_traj = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_traj,
            rollout(x0, traj, sol, 0.0, times))

        g = eq_fn(new_traj, times, params)
        new_lam = lam + cfg.rho * g
        stats = (lq.cost, jnp.max(jnp.abs(g)), jnp.zeros(()), alpha)
        return (new_traj, new_lam, times, params, x0), stats

    def solve(t0, x0, init_traj: Trajectory, params, lam):
        times = t0 + cfg.dt * jnp.arange(cfg.n_nodes + 1)
        carry = (init_traj, lam, times, params, x0)
        carry, stats = jax.lax.scan(ddp_iteration, carry, None,
                                    length=cfg.sqp_iterations)
        traj, lam_out, _, _, _ = carry
        costs, gnorms, dnorms, alphas_used = stats
        return SqpSolution(
            traj=traj, lam=lam_out, cost=costs[-1], g_norm=gnorms[-1],
            defect_norm=dnorms[-1], step_size=alphas_used[-1],
            iterations=jnp.asarray(cfg.sqp_iterations),
        )

    return solve
