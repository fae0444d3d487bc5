"""Formulation/solver variants: SRBM centroidal model, DDP solver mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.g1_fixtures import centroidal_setup
from wb_humanoid_mpc_tpu.models.centroidal_model import CentroidalModel
from wb_humanoid_mpc_tpu.ocp.centroidal_ocp import CentroidalOcp
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params, weight_comp_input
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.ddp import make_ddp_solver
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory


def test_srbm_flow_map_consistency():
    """SRBM variant: momentum matrix frozen at the nominal posture; flow map
    stays finite and close to the full model near the nominal state."""
    cfg, robot, model = centroidal_setup()
    srbm = dataclasses.replace(
        model, srbm=True,
        nominal_joint_angles=tuple(np.asarray(cfg.initial_state[12:]).tolist()))
    x = jnp.asarray(cfg.initial_state)
    u = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2), 35)
    f_full = model.flow_map(0.0, x, u)
    f_srbm = srbm.flow_map(0.0, x, u)
    assert np.isfinite(np.array(f_srbm)).all()
    # at the nominal posture with zero joint velocity the two agree exactly
    np.testing.assert_allclose(np.array(f_srbm), np.array(f_full), atol=1e-9)
    # SRBM drops the joint-momentum contribution: at the nominal posture with
    # NONZERO joint velocity the base kinematics must differ (ocs2
    # SingleRigidBodyDynamics zeroes the joint columns of A)
    u_qd = u.at[12 + 3].set(0.8)
    d_qd = np.abs(np.array(srbm.flow_map(0.0, x, u_qd))
                  - np.array(model.flow_map(0.0, x, u_qd)))
    assert d_qd[6:12].max() > 1e-6
    # away from the nominal posture with nonzero momentum the frozen-A
    # approximation is active too
    x2 = x.at[12].add(0.4).at[15].add(0.3).at[0].set(0.1).at[4].set(0.05)
    d = np.abs(np.array(srbm.flow_map(0.0, x2, u)) - np.array(model.flow_map(0.0, x2, u)))
    assert d[6:12].max() > 1e-6


def _stance_problem(N=8):
    cfg, robot, model = centroidal_setup()
    ocp = CentroidalOcp(model=model, cfg=cfg)
    from wb_humanoid_mpc_tpu.models import kinematics as kin

    x0 = jnp.asarray(cfg.initial_state)
    fk = kin.forward_kinematics(robot, x0[6:])
    foot_z = float(kin.frame_transform(robot, fk, model.contact_frames[0])[1][2])
    swing = SwingReference(
        contact_flags=np.ones((N + 1, 2)), z_pos=np.full((N + 1, 2), foot_z),
        z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
        proximity=np.ones((N + 1, 2)))
    params = make_centroidal_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
    u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2), 35)
    init = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
    lam = jnp.zeros((N, ocp.n_eq))
    return cfg, model, ocp, x0, params, init, lam


def test_ddp_solver_stance():
    """GaussNewtonDDP-mode solver holds stance with zero defects by
    construction (single shooting)."""
    N = 8
    cfg, model, ocp, x0, params, init, lam = _stance_problem(N)
    solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=3,
                                 equality_handling="al", rho=1e3)
    solve = jax.jit(make_ddp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))
    sol = solve(0.0, x0, init, params, lam)
    assert np.isfinite(float(sol.cost))
    z = np.array(sol.traj.xs[:, 8])
    np.testing.assert_allclose(z, 0.7925, atol=0.03)
    # single shooting: trajectory is exactly dynamically consistent
    from wb_humanoid_mpc_tpu.solver.transcription import rk4_step

    xs, us = np.array(sol.traj.xs), np.array(sol.traj.us)
    x_next = np.array(jax.vmap(
        lambda t, x, u: rk4_step(model.flow_map, t, x, u, cfg.sqp.dt))(
        jnp.arange(N) * cfg.sqp.dt, jnp.asarray(xs[:-1]), jnp.asarray(us)))
    np.testing.assert_allclose(x_next, xs[1:], atol=1e-10)
