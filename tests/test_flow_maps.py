"""Physical-identity tests for the centroidal and whole-body flow maps."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.g1_fixtures import centroidal_setup, wb_setup
from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin


def _rand_qv(robot, rng, scale=0.3):
    q = np.zeros(robot.nq)
    q[2] = 0.78
    q[3:6] = rng.uniform(-0.3, 0.3, 3) * scale
    q[6:] = rng.uniform(np.maximum(robot.joint_lower, -1), np.minimum(robot.joint_upper, 1)) * scale
    v = rng.standard_normal(robot.nq) * scale
    return jnp.asarray(q), jnp.asarray(v)


def test_centroidal_flow_consistency():
    """If h = A v / m and u_joints = v_joints, the flow's base kinematics must
    reproduce v_base exactly (momentum-map round trip)."""
    cfg, robot, model = centroidal_setup()
    rng = np.random.default_rng(0)
    q, v = _rand_qv(robot, rng)
    x = model.state_from_generalized(q, v)
    u = jnp.zeros(model.input_dim).at[12:].set(v[6:])
    xdot = model.flow_map(0.0, x, u)
    # qb_dot == v_base, qj_dot == v_joints
    np.testing.assert_allclose(np.array(xdot[6:12]), np.array(v[:6]), atol=1e-8)
    np.testing.assert_allclose(np.array(xdot[12:]), np.array(v[6:]), atol=1e-12)


def test_centroidal_momentum_rate_weight_comp():
    """Weight-compensating stance forces -> zero linear momentum rate."""
    cfg, robot, model = centroidal_setup()
    lay = model.layout
    x = jnp.asarray(cfg.initial_state)
    f_half = robot.total_mass * robot.gravity / 2.0
    u = jnp.zeros(model.input_dim)
    u = lay.with_contact_force(u, 0, jnp.array([0.0, 0.0, f_half]))
    u = lay.with_contact_force(u, 1, jnp.array([0.0, 0.0, f_half]))
    xdot = model.flow_map(0.0, x, u)
    np.testing.assert_allclose(np.array(xdot[0:3]), 0.0, atol=1e-10)
    assert abs(float(xdot[4])) < 0.2  # pitch moment / mass, small at default pose


def test_centroidal_momentum_rate_gravity_only():
    cfg, robot, model = centroidal_setup()
    x = jnp.asarray(cfg.initial_state)
    xdot = model.flow_map(0.0, x, jnp.zeros(model.input_dim))
    np.testing.assert_allclose(np.array(xdot[0:3]), [0, 0, -robot.gravity], atol=1e-12)
    np.testing.assert_allclose(np.array(xdot[3:6]), 0.0, atol=1e-12)


def test_wb_flow_matches_full_forward_dynamics():
    """Choosing u_qdd from the full unconstrained forward dynamics must make
    the flow map reproduce that same acceleration (self-consistency of the
    base-block solve)."""
    cfg, robot, model = wb_setup()
    rng = np.random.default_rng(1)
    q, v = _rand_qv(robot, rng)
    mn = dyn.mass_and_nle(robot, q, v)
    J_c = jnp.stack([kin.frame_jacobian(robot, mn.fk, f) for f in model.contact_frames])
    W = jnp.asarray(rng.standard_normal((2, 6)) * 20.0)
    tau_ext = jnp.einsum("crn,cr->n", J_c, W)
    a_full = jnp.linalg.solve(mn.M, tau_ext - mn.nle)

    x = model.layout.assemble(q, v)
    u = jnp.concatenate([W.reshape(-1), a_full[6:]])
    xdot = model.flow_map(0.0, x, u)
    np.testing.assert_allclose(np.array(xdot[: robot.nq]), np.array(v), atol=1e-12)
    np.testing.assert_allclose(np.array(xdot[robot.nq:]), np.array(a_full), atol=1e-7)


def test_wb_torque_recovery_identity():
    """tau from joint_torques must satisfy M a + nle = S^T tau + J^T W with the
    flow map's acceleration."""
    cfg, robot, model = wb_setup()
    rng = np.random.default_rng(2)
    q, v = _rand_qv(robot, rng)
    x = model.layout.assemble(q, v)
    u = jnp.asarray(np.concatenate([rng.standard_normal(12) * 30.0,
                                    rng.standard_normal(robot.n_joints) * 2.0]))
    xdot = model.flow_map(0.0, x, u)
    a = xdot[robot.nq:]
    tau = model.joint_torques(x, u)

    mn = dyn.mass_and_nle(robot, q, v)
    J_c = jnp.stack([kin.frame_jacobian(robot, mn.fk, f) for f in model.contact_frames])
    W = model.layout.contact_wrenches(u)
    tau_ext = jnp.einsum("crn,cr->n", J_c, W)
    residual = mn.M @ a + mn.nle - tau_ext
    # base rows: zero (no actuation); joint rows: tau
    np.testing.assert_allclose(np.array(residual[:6]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.array(residual[6:]), np.array(tau), atol=1e-7)


def test_wb_static_stance_torques():
    """Static stance with weight compensation: ankle/hip torques finite and
    gravity-consistent; base equilibrium approximately satisfied."""
    cfg, robot, model = wb_setup()
    x = jnp.asarray(cfg.initial_state)
    f_half = robot.total_mass * robot.gravity / 2.0
    u = jnp.zeros(model.input_dim)
    u = model.layout.with_contact_force(u, 0, jnp.array([0.0, 0.0, f_half]))
    u = model.layout.with_contact_force(u, 1, jnp.array([0.0, 0.0, f_half]))
    tau = np.array(model.joint_torques(x, u))
    assert np.isfinite(tau).all()
    assert np.abs(tau).max() < 60.0  # well within G1 actuator limits


def test_flow_maps_jit_and_vmap():
    cfg, robot, model = centroidal_setup()
    _, _, wbm = wb_setup()
    rng = np.random.default_rng(3)
    B = 4
    xs = jnp.asarray(np.tile(cfg.initial_state, (B, 1)) + rng.standard_normal((B, 35)) * 0.01)
    us = jnp.asarray(rng.standard_normal((B, 35)) * 0.1)
    f = jax.jit(jax.vmap(lambda x, u: model.flow_map(0.0, x, u)))
    out = f(xs, us)
    assert out.shape == (B, 35)
    assert np.isfinite(np.array(out)).all()

    cfg2 = wb_setup()[0]
    xs2 = jnp.asarray(np.tile(cfg2.initial_state, (B, 1)) + rng.standard_normal((B, 58)) * 0.01)
    f2 = jax.jit(jax.vmap(lambda x, u: wbm.flow_map(0.0, x, u)))
    out2 = f2(xs2, us)
    assert out2.shape == (B, 58)
    assert np.isfinite(np.array(out2)).all()
