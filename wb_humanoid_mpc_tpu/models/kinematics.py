"""Forward kinematics + geometric Jacobians, TPU-first (pure jnp, vmap-safe).

Replaces Pinocchio's FK / `computeFrameJacobian(..., LOCAL_WORLD_ALIGNED)`
(reference: `humanoid_common_mpc/src/pinocchio_model/DynamicsHelperFunctions.cpp:233-272`
uses exactly this frame convention for contact Jacobians).

Design notes (why this is not a Pinocchio translation):
- The kinematic tree pass is a trace-time Python loop over ~n_j joints
  (unrolled by XLA; depth is tiny), producing stacked world-frame joint
  axes/origins.
- Jacobians for *all* bodies are then formed in one shot with a constant
  ancestor mask and broadcasting — no per-column recursion. Batched over
  horizon nodes / scenario instances, the downstream contractions
  (mass matrix, task Jacobian products) become large MXU einsums.
- Velocity convention: generalized velocity v == dq/dt, with base coords
  [world linear velocity (3), euler-ZYX rates (3)] — identical to the
  reference's `JointModelTranslation`+`JointModelSphericalZYX` base.
- 6-vectors are ordered [linear(3), angular(3)] matching the reference's
  wrench layout [force, torque].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.models.robot.urdf import RobotModel
from wb_humanoid_mpc_tpu.utils.rotations import (
    euler_zyx_rate_to_world_omega_map,
    euler_zyx_to_rot,
    skew,
)


@functools.lru_cache(maxsize=None)
def _tree_levels(parent_bodies: tuple[int, ...]) -> tuple[np.ndarray, ...]:
    """Group joint indices by kinematic-tree depth (host-side, trace time).

    All joints within a level have parents in strictly earlier levels, so one
    level is one batched transform update. The G1's 23-joint tree is only 6
    levels deep — this bounds the *sequential* op depth of an FK pass (and of
    every AD pass through it), which is what latency-bound MPC solves on TPU
    actually pay for, unlike the 23-step chain of a scan-based FK.
    """
    n_j = len(parent_bodies)
    depth = np.zeros(n_j, dtype=np.int64)
    for j, pb in enumerate(parent_bodies):
        depth[j] = 0 if pb == 0 else depth[pb - 1] + 1
    return tuple(
        np.nonzero(depth == d)[0].astype(np.int64) for d in range(int(depth.max()) + 1)
    ) if n_j else ()


class FK(NamedTuple):
    """World-frame kinematics of every body (leading axes broadcastable)."""

    R: jnp.ndarray        # [n_b, 3, 3] body orientation in world
    p: jnp.ndarray        # [n_b, 3]    body origin in world
    joint_axis_w: jnp.ndarray  # [n_j, 3] world-frame joint axes
    joint_origin_w: jnp.ndarray  # [n_j, 3] world-frame joint origins
    E_base: jnp.ndarray   # [3, 3] euler-rate -> world angular velocity map


def forward_kinematics(model: RobotModel, q: jnp.ndarray) -> FK:
    """FK for a single configuration q = [p_base(3), theta_zyx(3), q_joints].

    Level-parallel tree pass: joints are grouped by tree depth (host-side,
    `_tree_levels`) and each level is one *batched* transform update over all
    joints at that depth (both legs + waist + both arms advance together).
    The sequential op depth is the tree depth (6 for the G1), not the joint
    count (23) — and every AD pass through FK (jvp/vjp/jacfwd in the LQ
    linearization) inherits that short critical path. Gather/scatter indices
    are trace-time constants, so XLA lowers them to static slices.
    """
    p_base = q[0:3]
    R_base = euler_zyx_to_rot(q[3:6])
    qj = q[6:]

    n_j = model.n_joints
    n_b = model.n_bodies
    dtype = q.dtype

    jR = jnp.asarray(model.joint_R, dtype=dtype)
    jp = jnp.asarray(model.joint_p, dtype=dtype)
    jaxis = jnp.asarray(model.joint_axis, dtype=dtype)
    parents = np.asarray(model.joint_parent_body)

    R_all = jnp.zeros((n_b, 3, 3), dtype=dtype).at[0].set(R_base)
    p_all = jnp.zeros((n_b, 3), dtype=dtype).at[0].set(p_base)
    axes_w = jnp.zeros((n_j, 3), dtype=dtype)
    origins_w = jnp.zeros((n_j, 3), dtype=dtype)

    for idx in _tree_levels(tuple(int(p) for p in parents)):
        pb = parents[idx]                       # constant int array
        Rp = R_all[pb]                          # [k,3,3] static gather
        pp = p_all[pb]                          # [k,3]
        ax = jaxis[idx]                         # [k,3]
        R_joint_w = jnp.einsum("kij,kjl->kil", Rp, jR[idx])
        p_joint_w = pp + jnp.einsum("kij,kj->ki", Rp, jp[idx])
        axis_w = jnp.einsum("kij,kj->ki", R_joint_w, ax)
        R_body = jnp.einsum("kij,kjl->kil", R_joint_w,
                            _axis_angle_rot_batched(ax, qj[idx]))
        R_all = R_all.at[idx + 1].set(R_body)
        p_all = p_all.at[idx + 1].set(p_joint_w)
        axes_w = axes_w.at[idx].set(axis_w)
        origins_w = origins_w.at[idx].set(p_joint_w)

    return FK(
        R=R_all,
        p=p_all,
        joint_axis_w=axes_w,
        joint_origin_w=origins_w,
        E_base=euler_zyx_rate_to_world_omega_map(q[3:6]),
    )


def _axis_angle_rot_batched(axis, angle):
    """Rodrigues rotation about (constant) unit axes; axis [k,3], angle [k]."""
    K = skew(axis)                                     # [k,3,3]
    s, c = jnp.sin(angle), jnp.cos(angle)
    KK = jnp.einsum("kij,kjl->kil", K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=K.dtype), K.shape)
    return eye + s[:, None, None] * K + (1.0 - c)[:, None, None] * KK


class VelBias(NamedTuple):
    """Per-body spatial velocities + bias (zero-q̈) accelerations, world axes.

    All quantities refer to the *body-origin point*: v_o / a_o are the linear
    velocity / acceleration of the material point at the body origin; omega /
    domega the body angular velocity / acceleration. The base linear bias
    acceleration is seeded with +g ẑ (the classic RNEA gravity trick), so the
    Newton-Euler force balance on these biases yields C(q,v)v + g(q) directly.
    """

    v_o: jnp.ndarray     # [n_b, 3]
    omega: jnp.ndarray   # [n_b, 3]
    a_o: jnp.ndarray     # [n_b, 3]
    domega: jnp.ndarray  # [n_b, 3]


def forward_kinematics_vel(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray
                           ) -> tuple[FK, VelBias]:
    """One fused level-parallel pass: FK + velocity + bias-acceleration.

    The TPU-native replacement for Pinocchio's first RNEA sweep: positions,
    twists and zero-q̈ accelerations of every body advance level-by-level in
    *batched* updates (one gather + two packed matmuls + one scatter per
    level), so the kernel count — what a latency-bound MPC solve actually
    pays for — is O(tree depth), not O(n_joints), and needs no AD transpose
    passes (cf. reference RNEA usage `DynamicsHelperFunctions.cpp:287+`).
    """
    import jax

    p_base = q[0:3]
    theta = q[3:6]
    R_base = euler_zyx_to_rot(theta)
    qj = q[6:]
    vj = v[6:]

    n_j = model.n_joints
    n_b = model.n_bodies
    dtype = q.dtype

    jR = jnp.asarray(model.joint_R, dtype=dtype)
    jp = jnp.asarray(model.joint_p, dtype=dtype)
    jaxis = jnp.asarray(model.joint_axis, dtype=dtype)
    parents = np.asarray(model.joint_parent_body)

    E, dE = jax.jvp(euler_zyx_rate_to_world_omega_map, (theta,), (v[3:6],))
    omega0 = E @ v[3:6]
    domega0 = dE @ v[3:6]          # Ė θ̇   (θ̈ = 0)
    g_up = jnp.zeros(3, dtype=dtype).at[2].set(model.gravity)

    R_all = jnp.zeros((n_b, 3, 3), dtype=dtype).at[0].set(R_base)
    p_all = jnp.zeros((n_b, 3), dtype=dtype).at[0].set(p_base)
    # velocity/bias state packed as [n_b, 4, 3] rows (v_o, omega, a_o, domega)
    vb_all = jnp.zeros((n_b, 4, 3), dtype=dtype).at[0].set(
        jnp.stack([v[0:3], omega0, g_up, domega0]))
    axes_w = jnp.zeros((n_j, 3), dtype=dtype)
    origins_w = jnp.zeros((n_j, 3), dtype=dtype)

    for idx in _tree_levels(tuple(int(p) for p in parents)):
        pb = parents[idx]
        Rp = R_all[pb]                          # [k,3,3]
        pp = p_all[pb]
        vbp = vb_all[pb]                        # [k,4,3]
        vp, wp, ap, dwp = vbp[:, 0], vbp[:, 1], vbp[:, 2], vbp[:, 3]
        ax = jaxis[idx]
        qd = vj[idx]                            # [k]

        R_joint_w = jnp.einsum("kij,kjl->kil", Rp, jR[idx])
        r = jnp.einsum("kij,kj->ki", Rp, jp[idx])          # o_j - p_parent
        p_joint_w = pp + r
        axis_w = jnp.einsum("kij,kj->ki", R_joint_w, ax)
        R_body = jnp.einsum("kij,kjl->kil", R_joint_w,
                            _axis_angle_rot_batched(ax, qj[idx]))

        wxr = jnp.cross(wp, r)
        v_child = vp + wxr
        w_child = wp + axis_w * qd[:, None]
        a_child = ap + jnp.cross(dwp, r) + jnp.cross(wp, wxr)
        dw_child = dwp + jnp.cross(wp, axis_w) * qd[:, None]

        R_all = R_all.at[idx + 1].set(R_body)
        p_all = p_all.at[idx + 1].set(p_joint_w)
        vb_all = vb_all.at[idx + 1].set(
            jnp.stack([v_child, w_child, a_child, dw_child], axis=1))
        axes_w = axes_w.at[idx].set(axis_w)
        origins_w = origins_w.at[idx].set(p_joint_w)

    fk = FK(R=R_all, p=p_all, joint_axis_w=axes_w, joint_origin_w=origins_w,
            E_base=E)
    vb = VelBias(v_o=vb_all[:, 0], omega=vb_all[:, 1],
                 a_o=vb_all[:, 2], domega=vb_all[:, 3])
    return fk, vb


def _axis_angle_rot(axis, angle):
    """Rodrigues rotation about a (constant) unit axis."""
    K = skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1.0 - c) * (K @ K)


def point_jacobian(model: RobotModel, fk: FK, body: jnp.ndarray | int, point_w: jnp.ndarray,
                   body_mask: np.ndarray | None = None) -> jnp.ndarray:
    """6 x nq LOCAL_WORLD_ALIGNED Jacobian of a point rigidly attached to `body`.

    Rows = [linear(3); angular(3)], world axes, linear velocity measured at
    ``point_w``. ``body_mask`` (static bool[nq]) selects which generalized
    coords affect the body; defaults to ``model.ancestor_mask[body]`` (then
    `body` must be a static int).
    """
    if body_mask is None:
        body_mask = model.ancestor_mask[int(body)]
    mask = jnp.asarray(body_mask)

    nq = model.nq
    p_base = fk.p[0]

    # base translation columns
    J_lin_base_t = jnp.eye(3)
    J_ang_base_t = jnp.zeros((3, 3))
    # base orientation columns: omega = E_base @ dtheta; v = omega x (x - p_base)
    E = fk.E_base
    r_base = point_w - p_base
    J_lin_base_r = -skew(r_base) @ E
    J_ang_base_r = E

    # joint columns (all joints, masked): v = a x (x - o), omega = a
    a = fk.joint_axis_w            # [n_j,3]
    o = fk.joint_origin_w          # [n_j,3]
    r = point_w[None, :] - o       # [n_j,3]
    J_lin_j = jnp.cross(a, r)      # [n_j,3]
    J_ang_j = a

    J_lin = jnp.concatenate([J_lin_base_t, J_lin_base_r, J_lin_j.T], axis=1)  # [3,nq]
    J_ang = jnp.concatenate([J_ang_base_t, J_ang_base_r, J_ang_j.T], axis=1)
    J = jnp.concatenate([J_lin, J_ang], axis=0)  # [6,nq]
    return J * mask[None, :]


def all_body_jacobians(model: RobotModel, fk: FK) -> jnp.ndarray:
    """Stacked [n_b, 6, nq] Jacobians of every body origin (world-aligned).

    Single broadcasted construction — this is the tensor that turns the mass
    matrix / CMM into one einsum.
    """
    n_b, nq = model.n_bodies, model.nq
    mask = jnp.asarray(model.ancestor_mask)  # [n_b, nq]
    x = fk.p                                  # [n_b, 3] body origins

    E = fk.E_base
    r_base = x - fk.p[0][None, :]                       # [n_b,3]
    J_lin_base_r = -skew(r_base) @ E                    # [n_b,3,3]
    J_lin_base_t = jnp.broadcast_to(jnp.eye(3), (n_b, 3, 3))
    J_ang_base_r = jnp.broadcast_to(E, (n_b, 3, 3))
    J_ang_base_t = jnp.zeros((n_b, 3, 3))

    a = fk.joint_axis_w                                  # [n_j,3]
    o = fk.joint_origin_w
    r = x[:, None, :] - o[None, :, :]                    # [n_b,n_j,3]
    J_lin_j = jnp.cross(jnp.broadcast_to(a, r.shape), r)  # [n_b,n_j,3]
    J_ang_j = jnp.broadcast_to(a, r.shape)

    J_lin = jnp.concatenate(
        [J_lin_base_t, J_lin_base_r, jnp.swapaxes(J_lin_j, 1, 2)], axis=2)  # [n_b,3,nq]
    J_ang = jnp.concatenate(
        [J_ang_base_t, J_ang_base_r, jnp.swapaxes(J_ang_j, 1, 2)], axis=2)
    J = jnp.concatenate([J_lin, J_ang], axis=1)          # [n_b,6,nq]
    return J * mask[:, None, :]


def frame_transform(model: RobotModel, fk: FK, frame_name: str):
    """World (R, p) of a named fixed frame."""
    f = model.frames[frame_name]
    Rb, pb = fk.R[f.body], fk.p[f.body]
    return Rb @ jnp.asarray(f.R), pb + Rb @ jnp.asarray(f.p)


def frame_jacobian(model: RobotModel, fk: FK, frame_name: str) -> jnp.ndarray:
    """6 x nq LOCAL_WORLD_ALIGNED Jacobian of a named fixed frame."""
    f = model.frames[frame_name]
    _, p_w = frame_transform(model, fk, frame_name)
    return point_jacobian(model, fk, f.body, p_w, model.ancestor_mask[f.body])


def frame_velocity(model: RobotModel, fk: FK, frame_name: str, v: jnp.ndarray) -> jnp.ndarray:
    """[linear; angular] world-aligned twist of a frame given generalized vel v."""
    return frame_jacobian(model, fk, frame_name) @ v
