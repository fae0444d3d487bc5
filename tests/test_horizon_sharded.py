"""Horizon-block distributed Riccati == sequential Riccati (8-dev CPU mesh).

The correctness gate for the SURVEY §5.7 horizon-parallel layer: the
two-level distributed associative scan (local block scan + all_gather'd
Schur-complement block summaries) must reproduce the sequential backward +
forward passes exactly (float64 tolerance), including non-divisible block
sizes and a full projected whole-body LQ instance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from wb_humanoid_mpc_tpu.parallel.horizon import horizon_sharded_lq_solve
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass
from wb_humanoid_mpc_tpu.solver.transcription import LQApprox


def _random_lq(N, nx, nu, seed=0):
    rng = np.random.default_rng(seed)

    def spd(n, scale=1.0):
        a = rng.normal(size=(N, n, n)) * 0.3
        return scale * (a @ a.transpose(0, 2, 1) + 0.5 * np.eye(n))

    A = np.eye(nx) + 0.05 * rng.normal(size=(N, nx, nx))
    B = 0.1 * rng.normal(size=(N, nx, nu))
    d = 0.01 * rng.normal(size=(N, nx))
    Qxx = spd(nx)
    Quu = spd(nu, 0.5)
    Qux = 0.05 * rng.normal(size=(N, nu, nx))
    qx = rng.normal(size=(N, nx))
    qu = rng.normal(size=(N, nu))
    QNt = spd(nx)[0]
    qN = rng.normal(size=nx)
    z = jnp.zeros(())
    return LQApprox(A=jnp.asarray(A), B=jnp.asarray(B), d=jnp.asarray(d),
                    Qxx=jnp.asarray(Qxx), Quu=jnp.asarray(Quu),
                    Qux=jnp.asarray(Qux), qx=jnp.asarray(qx),
                    qu=jnp.asarray(qu), QN=jnp.asarray(QNt),
                    qN=jnp.asarray(qN), cost=z, g_norm=z, defect_norm=z)


@pytest.mark.parametrize("N,n_dev", [(15, 8), (28, 4), (31, 8), (8, 8)])
def test_horizon_sharded_matches_sequential(N, n_dev):
    nx, nu = 10, 4
    lq = _random_lq(N, nx, nu, seed=N)
    dx0 = jnp.asarray(np.random.default_rng(1).normal(size=nx) * 0.1)
    reg = 1e-9

    sol = backward_pass(lq, reg)
    dxs_ref, dus_ref = forward_pass(lq, sol, dx0)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("h",))
    dxs, dus = jax.jit(
        lambda lq_, dx0_: horizon_sharded_lq_solve(lq_, dx0_, mesh, "h", reg)
    )(lq, dx0)

    np.testing.assert_allclose(np.array(dxs), np.array(dxs_ref),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.array(dus), np.array(dus_ref),
                               rtol=1e-8, atol=1e-9)


def test_horizon_sharded_wb_projected_lq():
    """Full-size whole-body LQ instance (nx=58) through projection, then
    horizon-sharded vs sequential solve."""
    from tests.g1_fixtures import wb_setup
    from wb_humanoid_mpc_tpu.models import kinematics as kin
    from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
    from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
    from wb_humanoid_mpc_tpu.refs.swing import SwingReference
    from wb_humanoid_mpc_tpu.solver.projection import project_lq
    from wb_humanoid_mpc_tpu.solver.transcription import Trajectory, make_lq_functions

    N = 12
    cfg, robot, model = wb_setup()
    ocp = WholeBodyOcp(model=model, cfg=cfg)
    x0 = jnp.asarray(cfg.initial_state, dtype=jnp.float64)
    fk = kin.forward_kinematics(robot, x0[:6 + model.layout.n_joints])
    foot_z = float(kin.frame_transform(robot, fk, model.contact_frames[0])[1][2])
    swing = SwingReference(
        contact_flags=np.ones((N + 1, 2)), z_pos=np.full((N + 1, 2), foot_z),
        z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
        proximity=np.ones((N + 1, 2)))
    params = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
    u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2),
                           model.layout.input_dim)
    traj = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
    lam = jnp.zeros((N, ocp.n_eq))

    lq_approx, *_ = make_lq_functions(ocp, model.flow_map, cfg.sqp.dt, N,
                                      ocp.barrier_params(), sensitivity="node")
    times = cfg.sqp.dt * jnp.arange(N + 1)
    lq = lq_approx(traj, times, params, lam, 1.0)
    reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, 1e-8)

    # production semantics: the Levenberg trust region is folded into the
    # stage data (one damped QP), the passes use only numerical jitter
    from wb_humanoid_mpc_tpu.solver.riccati import levenberg_damp
    reduced = levenberg_damp(reduced, 1e-2)
    reg = 1e-8
    sol = backward_pass(reduced, reg)
    dxs_ref, dus_ref = forward_pass(reduced, sol, jnp.zeros_like(x0))

    mesh = Mesh(np.array(jax.devices()[:4]), ("h",))
    dxs, dzs = jax.jit(
        lambda lq_, dx0_: horizon_sharded_lq_solve(lq_, dx0_, mesh, "h", reg)
    )(reduced, jnp.zeros_like(x0))
    np.testing.assert_allclose(np.array(dxs), np.array(dxs_ref),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.array(dzs), np.array(dus_ref),
                               rtol=1e-7, atol=1e-8)
