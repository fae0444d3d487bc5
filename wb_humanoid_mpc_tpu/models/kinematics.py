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

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.models.robot.urdf import RobotModel
from wb_humanoid_mpc_tpu.utils.rotations import (
    euler_zyx_rate_to_world_omega_map,
    euler_zyx_to_rot,
    skew,
)


class FK(NamedTuple):
    """World-frame kinematics of every body (leading axes broadcastable)."""

    R: jnp.ndarray        # [n_b, 3, 3] body orientation in world
    p: jnp.ndarray        # [n_b, 3]    body origin in world
    joint_axis_w: jnp.ndarray  # [n_j, 3] world-frame joint axes
    joint_origin_w: jnp.ndarray  # [n_j, 3] world-frame joint origins
    E_base: jnp.ndarray   # [3, 3] euler-rate -> world angular velocity map


def forward_kinematics(model: RobotModel, q: jnp.ndarray) -> FK:
    """FK for a single configuration q = [p_base(3), theta_zyx(3), q_joints].

    Implemented as a `lax.scan` over joints in topological order (parents
    always precede children), carrying the stacked world transforms. The
    scanned body keeps the traced graph O(1) in the number of joints — the
    node functions are instantiated many times by AD transforms (jacfwd /
    jvp / grad), so graph compactness directly bounds XLA compile time.
    """
    import jax

    p_base = q[0:3]
    R_base = euler_zyx_to_rot(q[3:6])
    qj = q[6:]

    n_j = model.n_joints
    n_b = model.n_bodies
    dtype = q.dtype

    jR = jnp.asarray(model.joint_R, dtype=dtype)
    jp = jnp.asarray(model.joint_p, dtype=dtype)
    jaxis = jnp.asarray(model.joint_axis, dtype=dtype)
    parents = jnp.asarray(model.joint_parent_body)

    R_all0 = jnp.zeros((n_b, 3, 3), dtype=dtype).at[0].set(R_base)
    p_all0 = jnp.zeros((n_b, 3), dtype=dtype).at[0].set(p_base)

    def step(carry, inp):
        R_all, p_all = carry
        j, pb, Rj, pj, ax, qv = inp
        Rp = R_all[pb]
        pp = p_all[pb]
        R_joint_w = Rp @ Rj
        p_joint_w = pp + Rp @ pj
        axis_w = R_joint_w @ ax
        R_body = (R_joint_w @ _axis_angle_rot(ax, qv)).astype(R_all.dtype)
        R_all = jax.lax.dynamic_update_index_in_dim(R_all, R_body, j + 1, 0)
        p_all = jax.lax.dynamic_update_index_in_dim(
            p_all, p_joint_w.astype(p_all.dtype), j + 1, 0)
        return (R_all, p_all), (axis_w, p_joint_w)

    idx = jnp.arange(n_j)
    (R_all, p_all), (axes_w, origins_w) = jax.lax.scan(
        step, (R_all0, p_all0), (idx, parents, jR, jp, jaxis, qj))

    return FK(
        R=R_all,
        p=p_all,
        joint_axis_w=axes_w if n_j else jnp.zeros((0, 3), dtype=dtype),
        joint_origin_w=origins_w if n_j else jnp.zeros((0, 3), dtype=dtype),
        E_base=euler_zyx_rate_to_world_omega_map(q[3:6]),
    )


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
