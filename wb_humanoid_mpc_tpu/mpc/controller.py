"""MRT joint controllers: MPC policy -> PD + feed-forward joint actions.

Re-implements the reference MRT controllers:
- centroidal: `CentroidalMpcMrtJointController.cpp:101-196` — observation
  conversion (quat -> euler-ZYX, momentum map), policy evaluation at t+5 ms,
  contact-consistent inverse dynamics feed-forward with error-feedback desired
  joint accelerations, kp=1200/kd=10 on MPC joints, kp=100/kd=1 on fixed
  joints, weight-compensating fallback before the first policy.
- whole-body: `WBMpcMrtJointController.cpp:141-192` — feed-forward torques
  from `computeJointTorques(policyState, policyInput)` directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.utils.rotations import (
    quat_to_rot,
    rot_to_euler_zyx,
    world_omega_to_euler_zyx_rate_map,
)


@dataclasses.dataclass
class JointAction:
    """Per-joint PD+ff command (reference `RobotJointAction.h:8-16`)."""
    q_des: np.ndarray
    qd_des: np.ndarray
    kp: np.ndarray
    kd: np.ndarray
    ff_effort: np.ndarray

    def total_torque(self, q: np.ndarray, qd: np.ndarray) -> np.ndarray:
        """(reference `getTotalFeedbackTorque`)"""
        return self.kp * (self.q_des - q) + self.kd * (self.qd_des - qd) + self.ff_effort


def robot_state_to_generalized(base_pos, base_quat_wxyz, v_lin_local, omega_local,
                               q_joints, qd_joints):
    """MuJoCo/hardware state -> our chart (q, v)
    (reference `CentroidalMpcMrtJointController.cpp:101-121` updateMpcState)."""
    R = quat_to_rot(jnp.asarray(base_quat_wxyz))
    euler = rot_to_euler_zyx(R)
    v_world = R @ jnp.asarray(v_lin_local)
    omega_world = R @ jnp.asarray(omega_local)
    euler_rates = world_omega_to_euler_zyx_rate_map(euler) @ omega_world
    q = jnp.concatenate([jnp.asarray(base_pos), euler, jnp.asarray(q_joints)])
    v = jnp.concatenate([v_world, euler_rates, jnp.asarray(qd_joints)])
    return q, v


class CentroidalMrtController:
    """kp/kd and ID-feedback gains as in the reference controller."""

    KP = 1200.0
    KD = 10.0
    KP_FIXED = 100.0
    KD_FIXED = 1.0
    ID_KP = 100.0   # error feedback on desired joint accelerations
    ID_KD = 10.0

    def __init__(self, model, policy_lead_time: float = 0.005):
        self.model = model
        self.lead = policy_lead_time
        lay = model.layout
        robot = model.robot

        def ff_torques(x_obs, x_pol, u_pol):
            q = lay.generalized_coordinates(x_obs)
            v = model.generalized_velocity(x_obs, jnp.zeros(lay.n_joints))
            q_des = lay.joint_angles(x_pol)
            qd_des = lay.joint_input(u_pol)
            qdd_des = (self.ID_KP * (q_des - lay.joint_angles(x_obs))
                       + self.ID_KD * (qd_des - v[6:]))
            mn = dyn.mass_and_nle(robot, q, v)
            J_c = jnp.stack([kin.frame_jacobian(robot, mn.fk, f)
                             for f in model.contact_frames])
            W = lay.contact_wrenches(u_pol)
            return dyn.joint_torques(robot, mn.M, mn.nle, qdd_des, J_c, W)

        self._ff = jax.jit(ff_torques)

    def compute(self, t: float, x_obs: np.ndarray, policy) -> JointAction:
        lay = self.model.layout
        if policy is None:
            # weight-compensating fallback (reference :173-196)
            from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
            u = weight_comp_input(self.model.robot.total_mass, self.model.robot.gravity,
                                  jnp.ones(2), lay.input_dim)
            tau = np.asarray(self._ff(jnp.asarray(x_obs), jnp.asarray(x_obs), u))
            n = lay.n_joints
            return JointAction(q_des=np.zeros(n), qd_des=np.zeros(n),
                               kp=np.zeros(n), kd=np.zeros(n), ff_effort=tau)
        x_pol, u_pol, _ = policy.evaluate(t + self.lead)
        tau = np.asarray(self._ff(jnp.asarray(x_obs), jnp.asarray(x_pol), jnp.asarray(u_pol)))
        n = lay.n_joints
        return JointAction(
            q_des=np.asarray(lay.joint_angles(jnp.asarray(x_pol))),
            qd_des=np.asarray(lay.joint_input(jnp.asarray(u_pol))),
            kp=np.full(n, self.KP), kd=np.full(n, self.KD), ff_effort=tau,
        )


class WBMrtController:
    KP = 1200.0
    KD = 10.0
    KP_FIXED = 100.0
    KD_FIXED = 1.0

    def __init__(self, model, policy_lead_time: float = 0.005):
        self.model = model
        self.lead = policy_lead_time
        self._ff = jax.jit(model.joint_torques)

    def compute(self, t: float, x_obs: np.ndarray, policy) -> JointAction:
        lay = self.model.layout
        n = lay.n_joints
        if policy is None:
            from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
            u = weight_comp_input(self.model.robot.total_mass, self.model.robot.gravity,
                                  jnp.ones(2), lay.input_dim)
            tau = np.asarray(self._ff(jnp.asarray(x_obs), u))
            return JointAction(q_des=np.zeros(n), qd_des=np.zeros(n),
                               kp=np.zeros(n), kd=np.zeros(n), ff_effort=tau)
        x_pol, u_pol, _ = policy.evaluate(t + self.lead)
        tau = np.asarray(self._ff(jnp.asarray(x_pol), jnp.asarray(u_pol)))
        return JointAction(
            q_des=np.asarray(lay.joint_angles(jnp.asarray(x_pol))),
            qd_des=np.asarray(lay.joint_velocities(jnp.asarray(x_pol))),
            kp=np.full(n, self.KP), kd=np.full(n, self.KD), ff_effort=tau,
        )
