"""Dummy-sim closed loop: integrator plant driven by the MPC policy.

The headless equivalent of the reference's `MRT_ROS_Dummy_Loop` +
dummy-sim node (SURVEY.md §3.2, `CentroidalMpcDummySimNode.cpp:66-93`):
at the MRT rate the plant state advances by ROLLING OUT the model dynamics
under the policy input (the reference's `TimeTriggeredRollout` semantics —
feeding back the optimizer's raw state trajectory would re-inject
multiple-shooting defects as disturbances), and at the MPC rate a new solve is
triggered. This is the cheapest end-to-end test of the whole stack
(references, OCP, solver, runtime) without physics.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.mpc.runtime import MpcRuntime, SolveStats
from wb_humanoid_mpc_tpu.solver.transcription import rk4_step


@dataclasses.dataclass
class DummySimLog:
    times: np.ndarray          # [T]
    states: np.ndarray         # [T, nx]
    inputs: np.ndarray         # [T, nu]
    solve_stats: list[SolveStats]
    contact_flags: np.ndarray  # [T, 2]


def run_dummy_sim(
    runtime: MpcRuntime,
    x0: np.ndarray,
    duration: float,
    mrt_frequency: float,
    mpc_frequency: float,
    command_fn=None,            # t -> raw command (vx, vy, height, wz) in [-1,1]
    flow=None,                  # model flow map; None -> replay policy states
) -> DummySimLog:
    dt_mrt = 1.0 / mrt_frequency
    solve_every = max(int(round(mrt_frequency / mpc_frequency)), 1)

    step_fn = None
    if flow is not None:
        step_fn = jax.jit(lambda t, x, u: rk4_step(flow, t, x, u, dt_mrt))

    x = np.asarray(x0, dtype=float).copy()
    t = 0.0
    times, states, inputs, flags = [], [], [], []
    stats: list[SolveStats] = []

    n_steps = int(round(duration * mrt_frequency))
    for step in range(n_steps):
        cmd = np.zeros(4) if command_fn is None else np.asarray(command_fn(t), dtype=float)
        if step % solve_every == 0:
            stats.append(runtime.advance(t, x, cmd))

        # ZOH input over [t, t+dt] is the policy input AT t (evaluating at
        # t+dt applies every input one interval late — a systematic lag that
        # makes the closed loop sag); the replayed/logged state is at t+dt.
        _, u, c = runtime.policy.evaluate(t)
        x_pol, _, _ = runtime.policy.evaluate(t + dt_mrt)
        if step_fn is not None:
            # TimeTriggeredRollout semantics: integrate the model dynamics
            # under the policy input from the CURRENT plant state
            x_next = np.asarray(step_fn(t, jnp.asarray(x), jnp.asarray(u)))
        else:
            x_next = np.asarray(x_pol)
        times.append(t)
        states.append(x.copy())
        inputs.append(np.asarray(u).copy())
        flags.append(np.asarray(c).copy())
        x = x_next.astype(float).copy()
        t += dt_mrt

    return DummySimLog(
        times=np.asarray(times),
        states=np.asarray(states),
        inputs=np.asarray(inputs),
        solve_stats=stats,
        contact_flags=np.asarray(flags),
    )
