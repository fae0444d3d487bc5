"""Rotation / orientation utilities (euler-ZYX convention, TPU-friendly).

The base orientation throughout the framework is parameterized by intrinsic
euler-ZYX angles stored as ``[theta_z, theta_y, theta_x]`` — matching the
reference state layout (reference: `g1_centroidal_mpc/config/mpc/task.info`
initialState comments, and OCS2's `JointModelSphericalZYX` base joint,
reference `createPinocchioModel.cpp:59-66`).

    R(theta) = Rz(theta_z) @ Ry(theta_y) @ Rx(theta_x)

All functions are pure jnp, dtype-polymorphic, and vmap/jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3-vector -> skew-symmetric matrix such that skew(a) @ b = a x b."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, -s], axis=-1),
            jnp.stack([zero, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([-s, zero, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def euler_zyx_to_rot(euler_zyx):
    """[theta_z, theta_y, theta_x] -> world_R_body = Rz @ Ry @ Rx."""
    tz, ty, tx = euler_zyx[..., 0], euler_zyx[..., 1], euler_zyx[..., 2]
    return rot_z(tz) @ rot_y(ty) @ rot_x(tx)


def rot_to_euler_zyx(R):
    """Inverse of :func:`euler_zyx_to_rot` (gimbal-safe via atan2/clip).

    Returns [theta_z, theta_y, theta_x] with theta_y in [-pi/2, pi/2].
    """
    ty = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    tz = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    tx = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([tz, ty, tx], axis=-1)


def euler_zyx_rate_to_world_omega_map(euler_zyx):
    """E(theta) with omega_world = E @ [dtheta_z, dtheta_y, dtheta_x].

    Columns: e_z, Rz @ e_y, Rz @ Ry @ e_x  (intrinsic ZYX composition).
    """
    tz, ty = euler_zyx[..., 0], euler_zyx[..., 1]
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    zero = jnp.zeros_like(tz)
    one = jnp.ones_like(tz)
    # col0 = e_z ; col1 = Rz e_y = [-sz, cz, 0] ; col2 = Rz Ry e_x = [cz*cy, sz*cy, -sy]
    return jnp.stack(
        [
            jnp.stack([zero, -sz, cz * cy], axis=-1),
            jnp.stack([zero, cz, sz * cy], axis=-1),
            jnp.stack([one, zero, -sy], axis=-1),
        ],
        axis=-2,
    )


def world_omega_to_euler_zyx_rate_map(euler_zyx):
    """E(theta)^-1 : world angular velocity -> euler-ZYX rates (closed form)."""
    tz, ty = euler_zyx[..., 0], euler_zyx[..., 1]
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    ty_sec = 1.0 / cy  # singular at |theta_y| = pi/2 (same as reference convention)
    # Derived by inverting E(theta) analytically.
    return jnp.stack(
        [
            jnp.stack([cz * sy * ty_sec, sz * sy * ty_sec, jnp.ones_like(tz)], axis=-1),
            jnp.stack([-sz, cz, jnp.zeros_like(tz)], axis=-1),
            jnp.stack([cz * ty_sec, sz * ty_sec, jnp.zeros_like(tz)], axis=-1),
        ],
        axis=-2,
    )


def quat_to_rot(q_wxyz):
    """Unit quaternion [w, x, y, z] -> rotation matrix."""
    w, x, y, z = q_wxyz[..., 0], q_wxyz[..., 1], q_wxyz[..., 2], q_wxyz[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix -> unit quaternion [w, x, y, z] (branch-free, robust)."""
    # Shepperd's method with jnp.where selection over the four cases.
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.stack(
            [0.25 * s, (R[..., 2, 1] - R[..., 1, 2]) / s,
             (R[..., 0, 2] - R[..., 2, 0]) / s, (R[..., 1, 0] - R[..., 0, 1]) / s],
            axis=-1)

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack(
            [(R[..., 2, 1] - R[..., 1, 2]) / s, 0.25 * s,
             (R[..., 0, 1] + R[..., 1, 0]) / s, (R[..., 0, 2] + R[..., 2, 0]) / s],
            axis=-1)

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
        return jnp.stack(
            [(R[..., 0, 2] - R[..., 2, 0]) / s, (R[..., 0, 1] + R[..., 1, 0]) / s,
             0.25 * s, (R[..., 1, 2] + R[..., 2, 1]) / s],
            axis=-1)

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
        return jnp.stack(
            [(R[..., 1, 0] - R[..., 0, 1]) / s, (R[..., 0, 2] + R[..., 2, 0]) / s,
             (R[..., 1, 2] + R[..., 2, 1]) / s, 0.25 * s],
            axis=-1)

    use_w = tr > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(use_w[..., None], case_w(),
                  jnp.where(use_x[..., None], case_x(),
                            jnp.where(use_y[..., None], case_y(), case_z())))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotation_error_world(R, R_ref):
    """Log-map style 3-dim orientation error used by task-space costs.

    error = vee(log(R @ R_ref^T)) approximated via the skew part (exact axis,
    angle-scaled) — matches Gauss-Newton small-error usage in the reference's
    end-effector costs (reference `EndEffectorKinematicCostHelpers.h:39-96`).
    """
    E = R @ jnp.swapaxes(R_ref, -1, -2)
    # vee of the skew-symmetric part, scaled to rotation angle.
    w = jnp.stack(
        [E[..., 2, 1] - E[..., 1, 2], E[..., 0, 2] - E[..., 2, 0], E[..., 1, 0] - E[..., 0, 1]],
        axis=-1)
    cos_a = jnp.clip(0.5 * (jnp.trace(E, axis1=-2, axis2=-1) - 1.0), -1.0, 1.0)
    angle = jnp.arccos(cos_a)
    sin_a = jnp.sin(angle)
    # w = 2 sin(a) * axis ; error = a * axis = w * a / (2 sin a), safe near a=0.
    scale = jnp.where(sin_a > 1e-6, angle / (2.0 * jnp.where(sin_a > 1e-6, sin_a, 1.0)), 0.5)
    return w * scale[..., None]


def rpy_to_rot(rpy):
    """URDF rpy (fixed-axis XYZ == Rz(y)Ry(p)Rx(r)) -> rotation matrix."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    return rot_z(y) @ rot_y(p) @ rot_x(r)
