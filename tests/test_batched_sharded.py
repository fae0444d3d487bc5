"""Batched + sharded solver tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.g1_fixtures import centroidal_setup
from wb_humanoid_mpc_tpu.ocp.centroidal_ocp import CentroidalOcp
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params, weight_comp_input
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory


@pytest.fixture(scope="module")
def setup():
    cfg, robot, model = centroidal_setup()
    ocp = CentroidalOcp(model=model, cfg=cfg)
    N = 6
    swing = SwingReference(
        contact_flags=np.ones((N + 1, 2)), z_pos=np.zeros((N + 1, 2)),
        z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
        proximity=np.ones((N + 1, 2)))
    x0 = jnp.asarray(cfg.initial_state)
    params = make_centroidal_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
    solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1)
    solve = make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg)
    u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2),
                           model.layout.input_dim)
    return cfg, model, ocp, N, x0, params, solve, u0


def _batch_args(setup_t, B, seed=0):
    cfg, model, ocp, N, x0, params, solve, u0 = setup_t
    rng = np.random.default_rng(seed)
    x0s = jnp.tile(x0, (B, 1)) + jnp.asarray(rng.standard_normal((B, 35)) * 0.005)
    init = Trajectory(xs=jnp.tile(x0, (B, N + 1, 1)), us=jnp.tile(u0, (B, N, 1)))
    paramsB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), params)
    lam = jnp.zeros((B, N, ocp.n_eq))
    return x0s, init, paramsB, lam


def test_vmapped_solve_matches_single(setup):
    cfg, model, ocp, N, x0, params, solve, u0 = setup
    B = 3
    x0s, init, paramsB, lam = _batch_args(setup, B)

    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0, 0)))
    solB = vsolve(0.0, x0s, init, paramsB, lam)

    single = jax.jit(solve)
    for b in range(B):
        sol1 = single(0.0, x0s[b],
                      Trajectory(xs=init.xs[b], us=init.us[b]),
                      jax.tree.map(lambda a: a[b], paramsB), lam[b])
        np.testing.assert_allclose(np.array(solB.traj.xs[b]), np.array(sol1.traj.xs),
                                   rtol=2e-6, atol=1e-7)


def test_sharded_solve_8_devices(setup):
    assert len(jax.devices()) == 8, "virtual device mesh missing"
    cfg, model, ocp, N, x0, params, solve, u0 = setup
    B = 16
    x0s, init, paramsB, lam = _batch_args(setup, B)

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    def shard(x):
        spec = P("dp", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    args = jax.tree.map(shard, (x0s, init, paramsB, lam))
    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0, 0)))
    sol = vsolve(0.0, *args)
    cost = np.asarray(sol.cost)
    assert cost.shape == (B,)
    assert np.isfinite(cost).all()
    # sharded result matches unsharded
    sol_ref = vsolve(0.0, x0s, init, paramsB, lam)
    np.testing.assert_allclose(cost, np.asarray(sol_ref.cost), rtol=1e-8)
