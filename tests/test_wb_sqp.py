"""Whole-body formulation SQP tests: stance convergence (x64) + float32
robustness smoke test (the on-TPU dtype)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.g1_fixtures import wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory


def _stance_problem(N, dtype):
    cfg, robot, model = wb_setup()
    ocp = WholeBodyOcp(model=model, cfg=cfg)
    from wb_humanoid_mpc_tpu.models import kinematics as kin

    x0 = jnp.asarray(cfg.initial_state, dtype=dtype)
    q0 = model.layout.generalized_coordinates(x0)
    fk = kin.forward_kinematics(model.robot, q0)
    foot_z = float(kin.frame_transform(model.robot, fk, model.contact_frames[0])[1][2])

    swing = SwingReference(
        contact_flags=np.ones((N + 1, 2)),
        z_pos=np.full((N + 1, 2), foot_z),
        z_vel=np.zeros((N + 1, 2)),
        z_acc=np.zeros((N + 1, 2)),
        proximity=np.ones((N + 1, 2)),
    )
    params = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
    params = jax.tree.map(lambda a: a.astype(dtype) if a.dtype.kind == "f" else a, params)
    u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2),
                           model.layout.input_dim).astype(dtype)
    init = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
    lam = jnp.zeros((N, ocp.n_eq), dtype=dtype)
    return cfg, model, ocp, x0, params, init, lam


def test_wb_sqp_stance_converges():
    N = 10
    cfg, model, ocp, x0, params, init, lam = _stance_problem(N, jnp.float64)
    solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=3)
    solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))
    sol = solve(0.0, x0, init, params, lam)
    assert np.isfinite(float(sol.cost))
    assert float(sol.defect_norm) < 1e-3
    assert float(sol.g_norm) < 5e-2
    z = np.array(sol.traj.xs[:, 2])
    np.testing.assert_allclose(z, 0.8, atol=0.02)
    # joint accelerations stay moderate
    assert np.abs(np.array(sol.traj.us[:, 12:])).max() < 50.0
    # torque recovery finite and within actuator range
    tau = np.array(jax.vmap(model.joint_torques)(sol.traj.xs[:-1], sol.traj.us))
    assert np.isfinite(tau).all()
    assert np.abs(tau).max() < 120.0


def test_wb_sqp_float32_stable():
    """The on-hardware dtype regime: x64 disabled entirely (as on TPU), all
    arrays float32; solver must stay finite and hold stance."""
    N = 8
    with jax.enable_x64(False):
        cfg, model, ocp, x0, params, init, lam = _stance_problem(N, jnp.float32)
        solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=3, rho=1e2)
        solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))
        sol = jax.block_until_ready(solve(0.0, x0, init, params, lam))
    assert np.isfinite(float(sol.cost)), "f32 solve produced non-finite cost"
    assert np.isfinite(np.array(sol.traj.xs)).all()
    assert float(sol.g_norm) < 0.5
    z = np.array(sol.traj.xs[:, 2])
    np.testing.assert_allclose(z, 0.8, atol=0.05)


def test_wb_sqp_parallel_riccati_matches():
    """Sequential vs associative-scan Riccati inside the full WB SQP."""
    N = 8
    cfg, model, ocp, x0, params, init, lam = _stance_problem(N, jnp.float64)
    kw = dict(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1)
    solve_seq = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(),
                                        SqpSolverConfig(**kw)))
    solve_par = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(),
                                        SqpSolverConfig(parallel_riccati=True, **kw)))
    s1 = solve_seq(0.0, x0, init, params, lam)
    s2 = solve_par(0.0, x0, init, params, lam)
    np.testing.assert_allclose(np.array(s1.traj.xs), np.array(s2.traj.xs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.array(s1.traj.us), np.array(s2.traj.us),
                               rtol=1e-5, atol=1e-5)
