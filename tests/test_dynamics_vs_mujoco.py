"""Golden-oracle tests: JAX Lagrangian-AD dynamics vs MuJoCo CRBA/RNEA/FK.

The reference validates its dynamics against Pinocchio identities
(reference `testDynamicsHelperFunctions.cpp`, `testPinocchioModel.cpp`);
here MuJoCo plays the golden role for the brand-new JAX engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests._mj_oracle import MjOracle
from tests.test_urdf_model import G1_MPC_JOINTS
from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.models.robot.urdf import load_robot_model


@pytest.fixture(scope="module")
def model(g1_urdf_path):
    m = load_robot_model(g1_urdf_path, G1_MPC_JOINTS, name="g1")
    m.add_frame("foot_l_contact", "left_ankle_roll_joint", [0.035, 0.0, -0.035])
    m.add_frame("foot_r_contact", "right_ankle_roll_joint", [0.035, 0.0, -0.035])
    return m


@pytest.fixture(scope="module")
def oracle(model):
    return MjOracle(model)


def rand_state(model, rng, scale=1.0):
    q = np.zeros(model.nq)
    q[0:3] = rng.uniform(-1, 1, 3)
    q[3:6] = rng.uniform(-0.8, 0.8, 3) * scale
    lo = np.maximum(model.joint_lower, -1.5)
    hi = np.minimum(model.joint_upper, 1.5)
    q[6:] = rng.uniform(lo, hi) * scale
    v = rng.standard_normal(model.nq) * scale
    return q, v


def test_fk_vs_mujoco(model, oracle):
    rng = np.random.default_rng(1)
    for _ in range(3):
        q, _ = rand_state(model, rng)
        fk = kin.forward_kinematics(model, jnp.asarray(q))
        for name in ["pelvis", "left_ankle_roll_link", "right_ankle_roll_link", "torso_link", "left_elbow_link"]:
            b = model.body_names.index(name)
            R_mj, p_mj = oracle.body_pose(q, name)
            np.testing.assert_allclose(np.array(fk.p[b]), p_mj, atol=1e-9, err_msg=name)
            np.testing.assert_allclose(np.array(fk.R[b]), R_mj, atol=1e-9, err_msg=name)


def test_mass_matrix_vs_mujoco(model, oracle):
    rng = np.random.default_rng(2)
    for _ in range(3):
        q, _ = rand_state(model, rng)
        M_ours = np.array(dyn.mass_matrix(model, jnp.asarray(q)))
        M_mj = oracle.mass_matrix(q)
        np.testing.assert_allclose(M_ours, M_mj, atol=1e-8)
        # symmetry + positive definiteness
        np.testing.assert_allclose(M_ours, M_ours.T, atol=1e-10)
        assert np.linalg.eigvalsh(M_ours).min() > 0


def test_nle_vs_mujoco(model, oracle):
    rng = np.random.default_rng(3)
    for _ in range(3):
        q, v = rand_state(model, rng)
        nle_ours = np.array(dyn.nonlinear_effects(model, jnp.asarray(q), jnp.asarray(v)))
        nle_mj = oracle.nle(q, v)
        np.testing.assert_allclose(nle_ours, nle_mj, atol=1e-7)


def test_gravity_only_nle(model, oracle):
    """v = 0 -> nle = gravity torques only; base linear rows = m*g*e_z lifted."""
    rng = np.random.default_rng(4)
    q, _ = rand_state(model, rng)
    nle = np.array(dyn.nonlinear_effects(model, jnp.asarray(q), jnp.zeros(model.nq)))
    # translation rows: total gravity wrench in world frame
    np.testing.assert_allclose(nle[0:3], [0.0, 0.0, model.total_mass * model.gravity], atol=1e-8)


def test_com_and_cmm_vs_mujoco(model, oracle):
    rng = np.random.default_rng(5)
    for _ in range(3):
        q, v = rand_state(model, rng)
        com_ours = np.array(dyn.com_position(model, jnp.asarray(q)))
        np.testing.assert_allclose(com_ours, oracle.com(q), atol=1e-9)
        h_ours = np.array(
            dyn.centroidal_momentum_matrix(model, jnp.asarray(q)) @ jnp.asarray(v))
        h_mj = oracle.centroidal_momentum(q, v)
        np.testing.assert_allclose(h_ours, h_mj, atol=1e-7)


def test_frame_jacobian_vs_mujoco(model, oracle):
    rng = np.random.default_rng(6)
    q, _ = rand_state(model, rng)
    fk = kin.forward_kinematics(model, jnp.asarray(q))
    for frame in ["foot_l_contact", "foot_r_contact"]:
        J_ours = np.array(kin.frame_jacobian(model, fk, frame))
        f = model.frames[frame]
        _, p_w = kin.frame_transform(model, fk, frame)
        J_mj = oracle.point_jacobian(q, model.body_names[f.body], np.array(p_w))
        np.testing.assert_allclose(J_ours, J_mj, atol=1e-8)


def test_weight_compensation_zero_momentum_rate(model):
    """Reference oracle (testDynamicsHelperFunctions.cpp:44-100): stance forces
    = weight/2 per foot at default posture give ~zero centroidal momentum rate
    (linear part exactly; angular part small for symmetric posture)."""
    q = np.zeros(model.nq)
    q[2] = 0.7925
    defaults = {"left_hip_pitch_joint": -0.05, "left_knee_joint": 0.1,
                "left_ankle_pitch_joint": -0.05, "right_hip_pitch_joint": -0.05,
                "right_knee_joint": 0.1, "right_ankle_pitch_joint": -0.05}
    for k, val in defaults.items():
        q[6 + model.joint_index(k)] = val
    qj = jnp.asarray(q)
    fk = kin.forward_kinematics(model, qj)
    f_half = model.total_mass * model.gravity / 2.0
    # net wrench about com: sum f_i + m g ; sum (p_i - com) x f_i
    com = dyn.com_position(model, qj)
    net_f = np.zeros(3)
    net_tau = np.zeros(3)
    for frame in ["foot_l_contact", "foot_r_contact"]:
        _, p = kin.frame_transform(model, fk, frame)
        f = np.array([0.0, 0.0, f_half])
        net_f += f
        net_tau += np.cross(np.array(p) - np.array(com), f)
    net_f[2] -= model.total_mass * model.gravity
    np.testing.assert_allclose(net_f, 0.0, atol=1e-9)
    # left/right symmetry: zero roll/yaw torque; pitch torque small but nonzero
    # (contact centers sit ~1.4 cm from the com in x at the default posture).
    assert abs(net_tau[0]) < 0.1  # slight real mass asymmetry in the G1 model
    assert abs(net_tau[2]) < 1e-6
    assert abs(net_tau[1]) < 10.0


def test_joint_torques_statics(model):
    """Static stance: gravity-compensating wrenches -> joint torques equal the
    full inverse-dynamics rows; base residual of the solve is consistent."""
    rng = np.random.default_rng(7)
    q, _ = rand_state(model, rng, scale=0.3)
    v = np.zeros(model.nq)
    mn = dyn.mass_and_nle(model, jnp.asarray(q), jnp.asarray(v))
    fk = mn.fk
    J_l = kin.frame_jacobian(model, fk, "foot_l_contact")
    J_r = kin.frame_jacobian(model, fk, "foot_r_contact")
    J_c = jnp.stack([J_l, J_r])
    W = jnp.zeros((2, 6))
    qdd_j = jnp.zeros(model.n_joints)
    tau = dyn.joint_torques(model, mn.M, mn.nle, qdd_j, J_c, W)
    # with zero contact force, torques = inverse dynamics of free body under
    # gravity with base accelerating: tau_j = [M qdd + nle]_j
    a_base = dyn.base_acceleration(mn.M, mn.nle, qdd_j, jnp.zeros(model.nq))
    qdd = jnp.concatenate([a_base, qdd_j])
    tau_ref = mn.M[6:, :] @ qdd + mn.nle[6:]
    np.testing.assert_allclose(np.array(tau), np.array(tau_ref), atol=1e-9)
    # base rows balance by construction
    res = mn.M[:6, :] @ qdd + mn.nle[:6]
    np.testing.assert_allclose(np.array(res), 0.0, atol=1e-7)


def test_energy_conservation_free_fall(model):
    """Integrate unforced dynamics; total energy must be conserved -> validates
    M and nle jointly, independent of MuJoCo."""
    import jax

    rng = np.random.default_rng(8)
    q0, v0 = rand_state(model, rng, scale=0.5)
    q0 = jnp.asarray(q0)
    v0 = jnp.asarray(v0) * 0.3

    def acc(q, v):
        mn = dyn.mass_and_nle(model, q, v)
        return jnp.linalg.solve(mn.M, -mn.nle)

    def rk4(q, v, dt):
        k1q, k1v = v, acc(q, v)
        k2q, k2v = v + 0.5 * dt * k1v, acc(q + 0.5 * dt * k1q, v + 0.5 * dt * k1v)
        k3q, k3v = v + 0.5 * dt * k2v, acc(q + 0.5 * dt * k2q, v + 0.5 * dt * k2v)
        k4q, k4v = v + dt * k3v, acc(q + dt * k3q, v + dt * k3v)
        return (q + dt / 6 * (k1q + 2 * k2q + 2 * k3q + k4q),
                v + dt / 6 * (k1v + 2 * k2v + 2 * k3v + k4v))

    E0 = float(dyn.kinetic_energy(model, q0, v0) + dyn.potential_energy(model, q0))
    q, v = q0, v0
    step = jax.jit(lambda q, v: rk4(q, v, 1e-3))
    for _ in range(50):
        q, v = step(q, v)
    E1 = float(dyn.kinetic_energy(model, q, v) + dyn.potential_energy(model, q))
    assert abs(E1 - E0) / max(abs(E0), 1.0) < 1e-6
