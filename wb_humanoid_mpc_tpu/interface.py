"""Top-level assembly: config files -> ready-to-run MPC runtime.

The TPU-native analogue of the reference's `RobotInterface` classes
(`CentroidalMpcInterface.cpp:151-237`, `WBMpcInterface.cpp:131-199`): loads the
task/reference/gait info files, builds the robot model + formulation OCP,
jit-compiles the SQP solver, and wires the host-side reference pipeline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.core.config import (
    TaskConfig,
    load_gait_library,
    load_reference_config,
    load_task_config,
)
from wb_humanoid_mpc_tpu.models.centroidal_model import CentroidalModel
from wb_humanoid_mpc_tpu.models.layout import CentroidalLayout, WBLayout
from wb_humanoid_mpc_tpu.models.robot.factory import build_robot_model, mpc_joint_names
from wb_humanoid_mpc_tpu.models.wb_model import WholeBodyModel
from wb_humanoid_mpc_tpu.mpc.runtime import MpcRuntime
from wb_humanoid_mpc_tpu.ocp.centroidal_ocp import CentroidalOcp
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params, weight_comp_input
from wb_humanoid_mpc_tpu.refs.manager import MotionManager, SolveReferences
from wb_humanoid_mpc_tpu.refs.targets import CentroidalTargetCalculator, WBTargetCalculator
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver


@dataclasses.dataclass
class CentroidalMpcInterface:
    cfg: TaskConfig
    model: CentroidalModel
    ocp: CentroidalOcp
    runtime: MpcRuntime
    motion_manager: MotionManager
    n_nodes: int
    dt: float
    gains: "GainsService" = None  # live re-tuning (reference GainsReceiver)

    @property
    def initial_state(self) -> np.ndarray:
        return np.asarray(self.cfg.initial_state)


def _arm_indices(cfg: TaskConfig, joint_names: list[str]) -> dict[str, int]:
    out = {}
    for role, jname in cfg.model_settings.arm_joint_names.items():
        if jname in joint_names:
            out[role] = joint_names.index(jname)
    return out


def build_centroidal_mpc(
    urdf_path: str,
    task_file: str,
    reference_file: str,
    gait_file: str,
    n_nodes: int | None = None,
    horizon: float | None = None,
    sqp_iterations: int | None = None,
    solver_overrides: dict | None = None,
    dt_override: float | None = None,
) -> CentroidalMpcInterface:
    # layout dims needed before parsing weight matrices
    probe_cfg = load_task_config(task_file, "centroidal", 1, 1)
    joints = mpc_joint_names(urdf_path, probe_cfg.model_settings.fixed_joint_names)
    layout = CentroidalLayout(n_joints=len(joints))
    cfg = load_task_config(task_file, "centroidal", layout.state_dim, layout.input_dim)

    robot = build_robot_model(urdf_path, cfg)
    ref_cfg_probe = load_reference_config(reference_file, layout.n_joints)
    model = CentroidalModel(
        robot=robot, layout=layout,
        contact_frames=tuple(cfg.model_settings.contact_names),
        srbm=(cfg.centroidal_model_type == 1),
        nominal_joint_angles=tuple(ref_cfg_probe.default_joint_state.tolist()),
    )
    ocp = CentroidalOcp(model=model, cfg=cfg)

    horizon = horizon if horizon is not None else cfg.mpc.time_horizon
    if dt_override is not None:
        dt = dt_override
    elif n_nodes is not None:
        # both n_nodes and horizon pinned -> dt follows (a fixed task-file dt
        # here would silently shrink the horizon to n_nodes * dt)
        dt = horizon / n_nodes
    else:
        dt = cfg.sqp.dt
    n_nodes = n_nodes if n_nodes is not None else int(round(horizon / dt))
    horizon = n_nodes * dt

    ref_cfg = load_reference_config(reference_file, layout.n_joints)
    gaits = load_gait_library(gait_file)
    calc = CentroidalTargetCalculator(ref_cfg=ref_cfg, mpc_horizon=horizon)
    mm = MotionManager(
        ref_cfg=ref_cfg,
        swing_cfg=cfg.swing,
        gait_map=gaits,
        target_calculator=calc,
        horizon=horizon,
        n_nodes=n_nodes,
        joint_start_index=12,
        arm_indices=_arm_indices(cfg, joints),
        phase_transition_stance_time=cfg.model_settings.phase_transition_stance_time,
    )

    overrides = dict(solver_overrides or {})
    solver_cfg = SqpSolverConfig(
        n_nodes=n_nodes, dt=dt,
        sqp_iterations=sqp_iterations if sqp_iterations is not None
        else max(cfg.sqp.sqp_iteration, 2),
        **overrides,
    )
    solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))

    def make_params(refs: SolveReferences):
        return make_centroidal_node_params(ocp, refs.swing, jnp.asarray(refs.x_ref))

    u_default = np.asarray(weight_comp_input(
        robot.total_mass, robot.gravity, jnp.ones(2), layout.input_dim))

    runtime = MpcRuntime(
        solve_fn=solve,
        motion_manager=mm,
        make_node_params=make_params,
        n_nodes=n_nodes,
        dt=dt,
        n_eq=ocp.n_eq,
        default_input=u_default,
        # normalized centroidal momentum ~ com velocity / yaw rate estimate
        base_vel_extractor=lambda x: np.array([x[0], x[1], x[2], x[5], x[4], x[3]]),
    )
    # live gain re-tuning: mutates cfg and swaps in a freshly jitted solver
    # (reference `GainsReceiver.cpp:44` updates every OCP copy of the live
    # solver; here the jitted solve IS the OCP copy)
    from wb_humanoid_mpc_tpu.mpc.gains import GainsService

    def _rebuild():
        runtime.solve_fn = jax.jit(
            make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))

    return CentroidalMpcInterface(cfg=cfg, model=model, ocp=ocp, runtime=runtime,
                                  motion_manager=mm, n_nodes=n_nodes, dt=dt,
                                  gains=GainsService(cfg, _rebuild))


@dataclasses.dataclass
class WBMpcInterface:
    cfg: TaskConfig
    model: WholeBodyModel
    ocp: "WholeBodyOcp"
    runtime: MpcRuntime
    motion_manager: MotionManager
    n_nodes: int
    dt: float
    gains: "GainsService" = None  # live re-tuning (reference GainsReceiver)

    @property
    def initial_state(self) -> np.ndarray:
        return np.asarray(self.cfg.initial_state)


def build_wb_mpc(
    urdf_path: str,
    task_file: str,
    reference_file: str,
    gait_file: str,
    n_nodes: int | None = None,
    horizon: float | None = None,
    sqp_iterations: int | None = None,
    solver_overrides: dict | None = None,
    dt_override: float | None = None,
) -> WBMpcInterface:
    """Whole-body formulation assembly (reference `WBMpcInterface.cpp:131-199`)."""
    from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params

    probe_cfg = load_task_config(task_file, "wb", 1, 1)
    joints = mpc_joint_names(urdf_path, probe_cfg.model_settings.fixed_joint_names)
    layout = WBLayout(n_joints=len(joints))
    cfg = load_task_config(task_file, "wb", layout.state_dim, layout.input_dim)

    robot = build_robot_model(urdf_path, cfg)
    model = WholeBodyModel(robot=robot, layout=layout,
                           contact_frames=tuple(cfg.model_settings.contact_names))
    ocp = WholeBodyOcp(model=model, cfg=cfg)

    horizon = horizon if horizon is not None else cfg.mpc.time_horizon
    if dt_override is not None:
        dt = dt_override
    elif n_nodes is not None:
        # both n_nodes and horizon pinned -> dt follows (a fixed task-file dt
        # here would silently shrink the horizon to n_nodes * dt)
        dt = horizon / n_nodes
    else:
        dt = cfg.sqp.dt
    n_nodes = n_nodes if n_nodes is not None else int(round(horizon / dt))
    horizon = n_nodes * dt

    ref_cfg = load_reference_config(reference_file, layout.n_joints)
    gaits = load_gait_library(gait_file)
    calc = WBTargetCalculator(ref_cfg=ref_cfg, mpc_horizon=horizon)
    mm = MotionManager(
        ref_cfg=ref_cfg,
        swing_cfg=cfg.swing,
        gait_map=gaits,
        target_calculator=calc,
        horizon=horizon,
        n_nodes=n_nodes,
        joint_start_index=6,
        arm_indices=_arm_indices(cfg, joints),
        phase_transition_stance_time=cfg.model_settings.phase_transition_stance_time,
    )

    overrides = dict(solver_overrides or {})
    solver_cfg = SqpSolverConfig(
        n_nodes=n_nodes, dt=dt,
        sqp_iterations=sqp_iterations if sqp_iterations is not None
        else max(cfg.sqp.sqp_iteration, 2),
        **overrides,
    )
    solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))

    def make_params(refs: SolveReferences):
        return make_wb_node_params(ocp, refs.swing, jnp.asarray(refs.x_ref))

    u_default = np.asarray(weight_comp_input(
        robot.total_mass, robot.gravity, jnp.ones(2), layout.input_dim))

    n_j = layout.n_joints
    runtime = MpcRuntime(
        solve_fn=solve,
        motion_manager=mm,
        make_node_params=make_params,
        n_nodes=n_nodes,
        dt=dt,
        n_eq=ocp.n_eq,
        default_input=u_default,
        base_vel_extractor=lambda x: x[6 + n_j: 12 + n_j],
    )
    from wb_humanoid_mpc_tpu.mpc.gains import GainsService

    def _rebuild():
        runtime.solve_fn = jax.jit(
            make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))

    return WBMpcInterface(cfg=cfg, model=model, ocp=ocp, runtime=runtime,
                          motion_manager=mm, n_nodes=n_nodes, dt=dt,
                          gains=GainsService(cfg, _rebuild))
