import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wb_humanoid_mpc_tpu.utils import rotations as rot


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_euler_zyx_roundtrip(rng):
    for _ in range(20):
        e = rng.uniform([-np.pi, -np.pi / 2 + 0.05, -np.pi], [np.pi, np.pi / 2 - 0.05, np.pi])
        R = rot.euler_zyx_to_rot(jnp.array(e))
        e2 = rot.rot_to_euler_zyx(R)
        np.testing.assert_allclose(np.array(e2), e, atol=1e-10)


def test_rotation_orthonormal(rng):
    e = jnp.array(rng.standard_normal(3))
    R = rot.euler_zyx_to_rot(e)
    np.testing.assert_allclose(np.array(R @ R.T), np.eye(3), atol=1e-12)
    assert np.isclose(float(jnp.linalg.det(R)), 1.0)


def test_euler_rate_map_matches_Rdot(rng):
    """omega_world from E(theta) theta_dot must equal vee(Rdot R^T)."""
    e = jnp.array(rng.uniform(-1.0, 1.0, 3))
    edot = jnp.array(rng.standard_normal(3))
    R, Rdot = jax.jvp(rot.euler_zyx_to_rot, (e,), (edot,))
    W = Rdot @ R.T
    omega_ref = jnp.array([W[2, 1], W[0, 2], W[1, 0]])
    omega = rot.euler_zyx_rate_to_world_omega_map(e) @ edot
    np.testing.assert_allclose(np.array(omega), np.array(omega_ref), atol=1e-10)


def test_euler_rate_map_inverse(rng):
    e = jnp.array(rng.uniform(-1.0, 1.0, 3))
    E = rot.euler_zyx_rate_to_world_omega_map(e)
    Einv = rot.world_omega_to_euler_zyx_rate_map(e)
    np.testing.assert_allclose(np.array(Einv @ E), np.eye(3), atol=1e-10)


def test_quat_roundtrip(rng):
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = rot.quat_to_rot(jnp.array(q))
        q2 = rot.rot_to_quat(R)
        q2 = np.array(q2)
        if q2[0] < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_rotation_error_zero_at_identity(rng):
    e = jnp.array(rng.uniform(-1.0, 1.0, 3))
    R = rot.euler_zyx_to_rot(e)
    err = rot.rotation_error_world(R, R)
    np.testing.assert_allclose(np.array(err), 0.0, atol=1e-10)


def test_rotation_error_axis_angle():
    axis = np.array([0.0, 0.0, 1.0])
    a = 0.3
    R = rot.euler_zyx_to_rot(jnp.array([a, 0.0, 0.0]))
    err = rot.rotation_error_world(R, jnp.eye(3))
    np.testing.assert_allclose(np.array(err), a * axis, atol=1e-10)


def test_skew_cross(rng):
    a = jnp.array(rng.standard_normal(3))
    b = jnp.array(rng.standard_normal(3))
    np.testing.assert_allclose(np.array(rot.skew(a) @ b), np.cross(a, b), atol=1e-12)
