"""End-to-end SQP test: G1 centroidal MPC holding stance.

Mirrors the reference's cheapest closed-loop sanity check (dummy-sim stance,
SURVEY.md §3.2) at the open-loop level: from the default initial state the
solver must produce a trajectory that keeps the base near its target height
with small equality-constraint violation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.g1_fixtures import centroidal_setup
from wb_humanoid_mpc_tpu.ocp.centroidal_ocp import CentroidalOcp
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params, weight_comp_input
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory


@pytest.fixture(scope="module")
def stance_problem():
    cfg, robot, model = centroidal_setup()
    ocp = CentroidalOcp(model=model, cfg=cfg)
    N = 16
    dt = cfg.sqp.dt
    swing = SwingReference(
        contact_flags=np.ones((N + 1, 2)),
        z_pos=np.full((N + 1, 2), -0.035 + 0.0),  # stance: terrain height ref = planner value
        z_vel=np.zeros((N + 1, 2)),
        z_acc=np.zeros((N + 1, 2)),
        proximity=np.ones((N + 1, 2)),
    )
    x0 = jnp.asarray(cfg.initial_state)
    x_ref = jnp.tile(x0, (N + 1, 1))
    params = make_centroidal_node_params(ocp, swing, x_ref)
    return cfg, model, ocp, N, dt, swing, x0, params


def test_sqp_stance_converges(stance_problem):
    cfg, model, ocp, N, dt, swing, x0, params = stance_problem

    # fix stance z reference to actual foot height at the initial state
    from wb_humanoid_mpc_tpu.models import kinematics as kin
    q0 = model.layout.generalized_coordinates(x0)
    fk = kin.forward_kinematics(model.robot, q0)
    foot_z = float(kin.frame_transform(model.robot, fk, model.contact_frames[0])[1][2])
    params = params._replace(z_pos=jnp.full((N + 1, 2), foot_z))

    solver_cfg = SqpSolverConfig(n_nodes=N, dt=dt, sqp_iterations=4)
    solve = make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg)
    solve = jax.jit(solve)

    u0 = weight_comp_input(model.robot.total_mass, model.robot.gravity,
                           jnp.ones(2), model.layout.input_dim)
    init = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
    lam0 = jnp.zeros((N, ocp.n_eq))

    sol = solve(0.0, x0, init, params, lam0)

    assert np.isfinite(float(sol.cost))
    assert float(sol.defect_norm) < 1e-3, "dynamics defects should be closed"
    assert float(sol.g_norm) < 1e-2, "equality constraints (stance twist) violated"
    # base height stays near target along the horizon
    z = np.array(sol.traj.xs[:, 8])
    np.testing.assert_allclose(z, 0.7925, atol=0.02)
    # stance vertical forces stay near half weight (excluding the terminal
    # input node, which trades off against the terminal cost)
    fz = np.array(sol.traj.us[:-1, 2])
    w_half = model.robot.total_mass * model.robot.gravity / 2
    np.testing.assert_allclose(fz, w_half, rtol=0.3)
    # momentum stays small
    assert np.abs(np.array(sol.traj.xs[:, :6])).max() < 0.2


def test_sqp_improves_cost(stance_problem):
    """Perturbed initial guess: SQP must reduce the merit/cost."""
    cfg, model, ocp, N, dt, swing, x0, params = stance_problem
    solver_cfg = SqpSolverConfig(n_nodes=N, dt=dt, sqp_iterations=1)
    solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))

    u0 = weight_comp_input(model.robot.total_mass, model.robot.gravity,
                           jnp.ones(2), model.layout.input_dim)
    rng = np.random.default_rng(0)
    xs = jnp.tile(x0, (N + 1, 1)) + jnp.asarray(rng.standard_normal((N + 1, 35)) * 0.01)
    init = Trajectory(xs=xs, us=jnp.tile(u0, (N, 1)))
    lam0 = jnp.zeros((N, ocp.n_eq))

    sol1 = solve(0.0, x0, init, params, lam0)
    sol2 = solve(0.0, x0, sol1.traj, params, sol1.lam)
    assert float(sol2.defect_norm) < float(sol1.defect_norm) * 2  # no blow-up
    assert float(sol2.g_norm) <= float(sol1.g_norm) * 1.5
    assert float(sol2.step_size) >= 0.0
