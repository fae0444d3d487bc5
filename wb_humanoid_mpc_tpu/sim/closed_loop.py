"""Single-process MuJoCo closed loop: MPC + MRT + physics.

The headless equivalent of the reference's `CentroidalMpcRobotSim` /
`WBMpcRobotSim` (SURVEY.md §3.3, `CentroidalMpcRobotSim.cpp:45-165`):
physics at 2 kHz, MRT control loop at `mrt_frequency`, MPC solves at
`mpc_frequency`, PD+ff torques in between.

Three pacing modes:
- synchronous (default): solves interleave with control ticks — deterministic,
  solver latency not charged to the timeline;
- `solve_latency > 0`: async MRT semantics via
  `mpc.async_runtime.SimulatedLatencyMpc` — a solve dispatched at sim time t
  activates at t + solve_latency, so control ticks continue on stale policies
  exactly as with the reference's solver thread (`CentroidalMpcMrtJointController
  .cpp:235-260`), reproducibly;
- `use_pipeline=True`: the real threaded pipeline
  (`mpc.async_runtime.MrtPipeline`) — a solver thread consumes observations
  and publishes policies through seqlock buffers while the control loop steps
  the sim, exactly the reference's solverWorker/control-thread split (wall
  clock, nondeterministic staleness). Selected by `tools/launch.py mujoco-sim
  --pipeline`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from wb_humanoid_mpc_tpu.mpc.controller import (
    JointAction,
    robot_state_to_generalized,
)
from wb_humanoid_mpc_tpu.sim.mujoco_sim import MujocoSimInterface


@dataclasses.dataclass
class ClosedLoopLog:
    times: np.ndarray
    base_positions: np.ndarray
    base_heights: np.ndarray
    joint_positions: np.ndarray
    solve_stats: list
    n_resets: int


def run_mujoco_closed_loop(
    mpc_interface,                # CentroidalMpcInterface | WBMpcInterface
    controller,                   # CentroidalMrtController | WBMrtController
    sim: MujocoSimInterface,
    duration: float,
    mrt_frequency: float = 500.0,
    mpc_frequency: float = 80.0,
    command_fn=None,
    observation_fn=None,          # (model, RobotState) -> mpc state vector
    solve_latency: float = 0.0,   # > 0: async MRT semantics — a policy becomes
                                  # active solve_latency sim-seconds after its
                                  # observation (mpc/async_runtime.py), so the
                                  # solver never stalls control ticks
    use_pipeline: bool = False,   # real solver thread via MrtPipeline
) -> ClosedLoopLog:
    model = mpc_interface.model
    runtime = mpc_interface.runtime
    lay = model.layout

    mpc_joint_idx = np.array(
        [sim.joint_names.index(j) for j in model.robot.joint_names])
    other_idx = np.array(
        [i for i in range(sim.n_joints) if i not in set(mpc_joint_idx.tolist())],
        dtype=int)

    def observe(rs):
        q, v = robot_state_to_generalized(
            rs.base_position, rs.base_quat_wxyz, rs.base_lin_vel_local,
            rs.base_ang_vel_local, rs.joint_positions[mpc_joint_idx],
            rs.joint_velocities[mpc_joint_idx])
        if observation_fn is not None:
            return np.asarray(observation_fn(q, v))
        if hasattr(model, "state_from_generalized"):
            return np.asarray(model.state_from_generalized(q, v))
        return np.concatenate([np.asarray(q), np.asarray(v)])

    dt_mrt = 1.0 / mrt_frequency
    steps_per_mrt = max(int(round(dt_mrt / sim.dt)), 1)
    solve_every = max(int(round(mrt_frequency / mpc_frequency)), 1)
    n_steps = int(round(duration * mrt_frequency))

    async_mpc = None
    pipeline = None
    if use_pipeline:
        from wb_humanoid_mpc_tpu.mpc.async_runtime import MrtPipeline

        pipeline = MrtPipeline(runtime, nx=lay.state_dim)
        pipeline.start()
    elif solve_latency > 0.0:
        from wb_humanoid_mpc_tpu.mpc.async_runtime import SimulatedLatencyMpc

        async_mpc = SimulatedLatencyMpc(runtime, mpc_frequency, solve_latency)

    times, base_pos, heights, qjs = [], [], [], []
    stats = []

    try:
      for step in range(n_steps):
        rs = sim.get_state()
        t = rs.time
        x_obs = observe(rs)

        cmd = np.zeros(4) if command_fn is None else np.asarray(command_fn(t))
        if pipeline is not None:
            pipeline.push_observation(t, x_obs, cmd)
            policy = pipeline.get_policy()
            if pipeline.last_stats is not None and (
                    not stats or stats[-1] is not pipeline.last_stats):
                stats.append(pipeline.last_stats)
        elif async_mpc is not None:
            policy = async_mpc.tick(t, x_obs, cmd)
            stats = async_mpc.stats
        else:
            if step % solve_every == 0:
                stats.append(runtime.advance(t, x_obs, cmd))
            policy = runtime.policy

        action_mpc = controller.compute(t, x_obs, policy)

        # assemble full-robot action: MPC joints + held fixed joints
        n_full = sim.n_joints
        q_des = np.zeros(n_full)
        qd_des = np.zeros(n_full)
        kp = np.full(n_full, controller.KP_FIXED)
        kd = np.full(n_full, controller.KD_FIXED)
        ff = np.zeros(n_full)
        q_des[mpc_joint_idx] = action_mpc.q_des
        qd_des[mpc_joint_idx] = action_mpc.qd_des
        kp[mpc_joint_idx] = action_mpc.kp
        kd[mpc_joint_idx] = action_mpc.kd
        ff[mpc_joint_idx] = action_mpc.ff_effort
        full_action = JointAction(q_des=q_des, qd_des=qd_des, kp=kp, kd=kd, ff_effort=ff)

        sim.apply_action_and_step(full_action, n_steps=steps_per_mrt)

        times.append(t)
        base_pos.append(rs.base_position.copy())
        heights.append(rs.base_position[2])
        qjs.append(rs.joint_positions.copy())
    finally:
        if pipeline is not None:
            pipeline.stop()

    return ClosedLoopLog(
        times=np.asarray(times),
        base_positions=np.asarray(base_pos),
        base_heights=np.asarray(heights),
        joint_positions=np.asarray(qjs),
        solve_stats=stats,
        n_resets=sim.n_resets,
    )
