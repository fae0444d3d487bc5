"""MuJoCo-based golden oracle for the JAX rigid-body engine.

Generates an MJCF from our parsed `RobotModel` (same lumped inertias, same
tree) so MuJoCo's CRBA/RNEA/FK provide independent ground truth. Coordinate
mapping between our chart (world linear vel + euler-ZYX rates) and MuJoCo's
free joint (world linear vel + body-local angular vel, quaternion attitude):

    qpos_mj = [p, quat(euler_zyx), q_j]
    v_mj    = blockdiag(I3, R^T E(theta), I_nj) @ v_ours
"""

from __future__ import annotations

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.models.robot.urdf import RobotModel
from wb_humanoid_mpc_tpu.utils.rotations import (
    euler_zyx_rate_to_world_omega_map,
    euler_zyx_to_rot,
    rot_to_quat,
)


def _inertia_about_com(model: RobotModel, b: int) -> np.ndarray:
    m = model.mass[b]
    c = model.com[b]
    return model.inertia_o[b] - m * (np.dot(c, c) * np.eye(3) - np.outer(c, c))


def build_mjcf(model: RobotModel) -> str:
    n_j = model.n_joints
    children: dict[int, list[int]] = {}
    for j in range(n_j):
        children.setdefault(int(model.joint_parent_body[j]), []).append(j)

    def quat_str(R):
        q = np.array(rot_to_quat(jnp.asarray(R)))
        return " ".join(f"{x:.17g}" for x in q)

    def body_xml(b: int, depth: int) -> str:
        ind = "  " * depth
        parts = []
        m = model.mass[b]
        c = model.com[b]
        Ic = _inertia_about_com(model, b)
        full = f"{Ic[0,0]:.17g} {Ic[1,1]:.17g} {Ic[2,2]:.17g} {Ic[0,1]:.17g} {Ic[0,2]:.17g} {Ic[1,2]:.17g}"
        parts.append(
            f'{ind}<inertial pos="{c[0]:.17g} {c[1]:.17g} {c[2]:.17g}" mass="{m:.17g}" fullinertia="{full}"/>'
        )
        for j in children.get(b, []):
            cb = j + 1
            p = model.joint_p[j]
            ax = model.joint_axis[j]
            parts.append(
                f'{ind}<body name="{model.body_names[cb]}" pos="{p[0]:.17g} {p[1]:.17g} {p[2]:.17g}" quat="{quat_str(model.joint_R[j])}">'
            )
            parts.append(
                f'{ind}  <joint name="{model.joint_names[j]}" type="hinge" axis="{ax[0]:.17g} {ax[1]:.17g} {ax[2]:.17g}" damping="0" armature="0" limited="false"/>'
            )
            parts.append(body_xml(cb, depth + 1))
            parts.append(f"{ind}</body>")
        return "\n".join(parts)

    return f"""
<mujoco model="{model.name}">
  <option gravity="0 0 -{model.gravity}"/>
  <compiler inertiafromgeom="false"/>
  <worldbody>
    <body name="{model.body_names[0]}" pos="0 0 0">
      <freejoint/>
{body_xml(0, 3)}
    </body>
  </worldbody>
</mujoco>
"""


class MjOracle:
    def __init__(self, model: RobotModel):
        self.rm = model
        self.m = mujoco.MjModel.from_xml_string(build_mjcf(model))
        self.d = mujoco.MjData(self.m)
        # joint name -> mujoco dof order check
        names = [
            mujoco.mj_id2name(self.m, mujoco.mjtObj.mjOBJ_JOINT, i)
            for i in range(self.m.njnt)
        ]
        assert names[0] is None or self.m.jnt_type[0] == mujoco.mjtJoint.mjJNT_FREE
        assert names[1:] == model.joint_names, names

    # ---- coordinate maps ----
    def qpos_from_q(self, q: np.ndarray) -> np.ndarray:
        quat = np.array(rot_to_quat(euler_zyx_to_rot(jnp.asarray(q[3:6]))))
        return np.concatenate([q[0:3], quat, q[6:]])

    def vel_transform(self, q: np.ndarray) -> np.ndarray:
        """T with v_mj = T @ v_ours."""
        R = np.array(euler_zyx_to_rot(jnp.asarray(q[3:6])))
        E = np.array(euler_zyx_rate_to_world_omega_map(jnp.asarray(q[3:6])))
        n = self.rm.nq
        T = np.eye(n)
        T[3:6, 3:6] = R.T @ E
        return T

    def vel_transform_dot(self, q: np.ndarray, v: np.ndarray) -> np.ndarray:
        def block(e):
            R = euler_zyx_to_rot(e)
            E = euler_zyx_rate_to_world_omega_map(e)
            return R.T @ E

        _, dB = jax.jvp(block, (jnp.asarray(q[3:6]),), (jnp.asarray(v[3:6]),))
        n = self.rm.nq
        Td = np.zeros((n, n))
        Td[3:6, 3:6] = np.array(dB)
        return Td

    def set_state(self, q: np.ndarray, v: np.ndarray | None = None):
        self.d.qpos[:] = self.qpos_from_q(q)
        if v is not None:
            self.d.qvel[:] = self.vel_transform(q) @ v
        else:
            self.d.qvel[:] = 0
        mujoco.mj_forward(self.m, self.d)

    # ---- oracles (in OUR coordinates) ----
    def mass_matrix(self, q: np.ndarray) -> np.ndarray:
        self.set_state(q)
        Mfull = np.zeros((self.m.nv, self.m.nv))
        mujoco.mj_fullM(self.m, self.d, Mfull)
        T = self.vel_transform(q)
        return T.T @ Mfull @ T

    def nle(self, q: np.ndarray, v: np.ndarray) -> np.ndarray:
        self.set_state(q, v)
        bias = np.zeros(self.m.nv)
        mujoco.mj_rne(self.m, self.d, 0, bias)
        Mfull = np.zeros((self.m.nv, self.m.nv))
        mujoco.mj_fullM(self.m, self.d, Mfull)
        T = self.vel_transform(q)
        Td = self.vel_transform_dot(q, v)
        # M_mj (T vdot + Td v) + b = tau_mj ;  ours: M vdot + nle = T^T tau_mj
        return T.T @ bias + T.T @ Mfull @ Td @ v

    def body_pose(self, q: np.ndarray, body_name: str):
        self.set_state(q)
        bid = mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_BODY, body_name)
        xmat = self.d.xmat[bid].reshape(3, 3)
        return xmat, self.d.xpos[bid].copy()

    def point_jacobian(self, q: np.ndarray, body_name: str, point_w: np.ndarray) -> np.ndarray:
        """6 x nq [linear; angular] world-aligned jacobian, our coordinates."""
        self.set_state(q)
        bid = mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_BODY, body_name)
        jacp = np.zeros((3, self.m.nv))
        jacr = np.zeros((3, self.m.nv))
        mujoco.mj_jac(self.m, self.d, jacp, jacr, point_w, bid)
        T = self.vel_transform(q)
        return np.vstack([jacp, jacr]) @ T

    def com(self, q: np.ndarray) -> np.ndarray:
        self.set_state(q)
        # subtree_com of root body = full-robot com
        return self.d.subtree_com[1].copy()

    def centroidal_momentum(self, q: np.ndarray, v: np.ndarray) -> np.ndarray:
        """[linear momentum; angular momentum about com]."""
        self.set_state(q, v)
        mujoco.mj_subtreeVel(self.m, self.d)
        lin = self.rm.total_mass * self.d.subtree_linvel[1]
        ang = self.d.subtree_angmom[1]
        return np.concatenate([lin, ang])
