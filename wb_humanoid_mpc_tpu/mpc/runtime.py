"""Receding-horizon MPC runtime: warm-started solves + policy interpolation.

Replaces ocs2's `MPC_BASE`/`MPC_MRT_Interface` pair (SURVEY.md §2.4; usage
`CentroidalMpcMrtJointController.cpp:81-230`): `advance()` is the MPC side
(observation -> references -> warm-started SQP solve -> policy), and
`evaluate_policy()` is the MRT side (time-interpolated state/input lookup).

The solver call is one jitted XLA program; everything around it is thin host
logic. Warm starting follows the reference (`mpc.coldStart false`,
`task.info:114`): the previous solution is time-shifted onto the new grid and
the tail is padded by repetition.
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.refs.manager import MotionManager, SolveReferences
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolution
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory


@dataclasses.dataclass
class Policy:
    """Flattened policy (the reference's `MpcFlattenedController` analogue)."""
    t0: float
    dt: float
    xs: np.ndarray  # [N+1, nx]
    us: np.ndarray  # [N, nu]
    contact_flags: np.ndarray  # [N+1, 2]

    def evaluate(self, t: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(x*, u*, contact) at time t — `MRT_BASE::evaluatePolicy` analogue."""
        N = self.us.shape[0]
        s = (t - self.t0) / self.dt
        k = int(np.clip(np.floor(s), 0, N - 1))
        a = float(np.clip(s - k, 0.0, 1.0))
        x = (1 - a) * self.xs[k] + a * self.xs[k + 1]
        u = self.us[min(int(np.clip(np.floor(s), 0, N - 1)), N - 1)]
        flags = self.contact_flags[min(k if a < 0.5 else k + 1, N)]
        return x, u, flags


@dataclasses.dataclass
class SolveStats:
    """Per-solve wall-times (reference `SqpBenchmarksPublisher.cpp:44-57`)."""
    solve_time: float
    reference_time: float
    cost: float
    g_norm: float
    defect_norm: float
    step_size: float
    # per-phase device times; nonzero when the runtime was built with a
    # staged solver (`make_staged_sqp_solver`) — the reference's
    # SqpSolver::Benchmarks contract
    lq_time: float = 0.0
    projection_time: float = 0.0
    riccati_time: float = 0.0
    linesearch_time: float = 0.0


class MpcRuntime:
    def __init__(
        self,
        solve_fn: Callable,           # jitted make_sqp_solver output
        motion_manager: MotionManager,
        make_node_params: Callable,   # (SolveReferences) -> NodeParams pytree
        n_nodes: int,
        dt: float,
        n_eq: int,
        default_input: np.ndarray,
        base_vel_extractor=None,   # state -> [vx, vy, vz, yaw_rate, ...] estimate
    ):
        self.solve_fn = solve_fn
        self.mm = motion_manager
        self.make_node_params = make_node_params
        self.N = n_nodes
        self.dt = dt
        self.n_eq = n_eq
        self.default_input = np.asarray(default_input)
        self.base_vel_extractor = base_vel_extractor
        self.policy: Policy | None = None
        self._traj: Trajectory | None = None
        self._lam = None
        self._last_t: float | None = None

    # ---- warm start ----
    def _warm_start(self, t0: float, x0: np.ndarray) -> Trajectory:
        if self._traj is None:
            xs = np.tile(x0, (self.N + 1, 1))
            us = np.tile(self.default_input, (self.N, 1))
            return Trajectory(xs=jnp.asarray(xs), us=jnp.asarray(us))
        shift = 0.0 if self._last_t is None else (t0 - self._last_t) / self.dt
        xs_old = np.asarray(self._traj.xs)
        us_old = np.asarray(self._traj.us)
        idx = np.arange(self.N + 1) + shift
        k = np.clip(np.floor(idx).astype(int), 0, self.N - 1)
        a = np.clip(idx - k, 0.0, 1.0)[:, None]
        xs = (1 - a) * xs_old[k] + a * xs_old[np.minimum(k + 1, self.N)]
        ku = np.clip(np.floor(idx[:-1]).astype(int), 0, self.N - 1)
        us = us_old[ku]
        return Trajectory(xs=jnp.asarray(xs), us=jnp.asarray(us))

    # ---- MPC advance (one observation -> one policy) ----
    def advance(self, t0: float, x_obs: np.ndarray, raw_cmd: np.ndarray,
                base_vel_estimate: np.ndarray | None = None,
                terrain_height: float = 0.0) -> SolveStats:
        t_ref0 = _time.perf_counter()
        dt_since = 0.0 if self._last_t is None else max(t0 - self._last_t, 1e-4)
        if base_vel_estimate is None and self.base_vel_extractor is not None:
            base_vel_estimate = np.asarray(self.base_vel_extractor(np.asarray(x_obs)))
        refs = self.mm.pre_solve(t0, x_obs, raw_cmd, dt_since,
                                 base_vel_estimate, terrain_height)
        params = self.make_node_params(refs)
        t_ref = _time.perf_counter() - t_ref0

        init_traj = self._warm_start(t0, x_obs)
        # zero the wrench entries of swing nodes in the warm start: the time
        # shift moves stance nodes into swing slots, and a large stale wrench
        # on a zero-wrench-constrained node destabilizes the AL iteration
        cf = np.asarray(refs.swing.contact_flags)[: self.N]
        us = np.array(init_traj.us)  # mutable copy
        for i in range(2):
            swing_nodes = cf[:, i] < 0.5
            us[swing_nodes, 6 * i: 6 * i + 6] = 0.0
        init_traj = Trajectory(xs=init_traj.xs, us=jnp.asarray(us))
        # AL multipliers are node-indexed; after the receding-horizon shift the
        # node<->phase alignment changes, so stale multipliers are harmful.
        # Restart them each solve (within-solve AL updates still apply).
        lam = jnp.zeros((self.N, self.n_eq))

        t_solve0 = _time.perf_counter()
        out = self.solve_fn(t0, jnp.asarray(x_obs), init_traj, params, lam)
        # staged solver returns (solution, PhaseTimings); the fused solver
        # returns the SqpSolution NamedTuple directly (which is also a tuple,
        # so detect by field)
        timings = None
        if hasattr(out, "traj"):
            sol = out
        else:
            sol, timings = out
        sol = jax.block_until_ready(sol)
        t_solve = _time.perf_counter() - t_solve0

        self._traj = sol.traj
        self._lam = sol.lam
        self._last_t = t0
        self.policy = Policy(
            t0=t0, dt=self.dt,
            xs=np.asarray(sol.traj.xs), us=np.asarray(sol.traj.us),
            contact_flags=np.asarray(refs.swing.contact_flags),
        )
        return SolveStats(
            solve_time=t_solve, reference_time=t_ref,
            cost=float(sol.cost), g_norm=float(sol.g_norm),
            defect_norm=float(sol.defect_norm), step_size=float(sol.step_size),
            lq_time=timings.lq if timings else 0.0,
            projection_time=timings.projection if timings else 0.0,
            riccati_time=timings.riccati if timings else 0.0,
            linesearch_time=timings.linesearch if timings else 0.0,
        )

    def reset(self) -> None:
        self.policy = None
        self._traj = None
        self._lam = None
        self._last_t = None
        self.mm.reset()
