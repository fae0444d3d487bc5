"""Whole-body dynamics MPC model (flow map + torque recovery), TPU-native.

Replaces `WBAccelDynamicsAD` + the WB dynamics core
(reference `humanoid_wb_mpc/src/dynamics/WBAccelDynamicsAD.cpp:52-57`,
`humanoid_wb_mpc/src/dynamics/DynamicsHelperFunctions.cpp:51-146,199-220`).
Derivatives via `jax.jacfwd` — no CppAD.

State  x = [q_base(6), q_joints(n), v_base(6), v_joints(n)]
Input  u = [W_l(6), W_r(6), qdd_joints(n)]

Flow map:  x_dot = [v ; a(q, v, u)] where the base acceleration solves the
6 base rows of  M(q) a + nle(q,v) = J_c^T W  given the commanded joint
accelerations (exact 6x6 base-block solve; see models/dynamics.py docstring
on the reference's 3x3-split approximation).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.models.layout import WBLayout
from wb_humanoid_mpc_tpu.models.robot.urdf import RobotModel


@dataclasses.dataclass(frozen=True)
class WholeBodyModel:
    robot: RobotModel
    layout: WBLayout
    contact_frames: tuple[str, ...]

    @property
    def state_dim(self) -> int:
        return self.layout.state_dim

    @property
    def input_dim(self) -> int:
        return self.layout.input_dim

    def _contact_jacobians(self, fk):
        return jnp.stack(
            [kin.frame_jacobian(self.robot, fk, f) for f in self.contact_frames])

    def flow_map(self, t, x, u):
        lay = self.layout
        q = lay.generalized_coordinates(x)
        v = lay.generalized_velocities(x)
        qdd_j = lay.joint_input(u)
        W = lay.contact_wrenches(u)

        mn = dyn.mass_and_nle(self.robot, q, v)
        J_c = self._contact_jacobians(mn.fk)
        a = dyn.generalized_accelerations(self.robot, mn.M, mn.nle, qdd_j, J_c, W)
        return jnp.concatenate([v, a])

    def joint_torques(self, x, u):
        """Per-node feed-forward torques (reference
        `WBMpcMrtJointController.cpp:141-155` consumes this)."""
        lay = self.layout
        q = lay.generalized_coordinates(x)
        v = lay.generalized_velocities(x)
        qdd_j = lay.joint_input(u)
        W = lay.contact_wrenches(u)
        mn = dyn.mass_and_nle(self.robot, q, v)
        J_c = self._contact_jacobians(mn.fk)
        return dyn.joint_torques(self.robot, mn.M, mn.nle, qdd_j, J_c, W)

    def initial_state(self, base_pose, joint_angles):
        q = jnp.concatenate([jnp.asarray(base_pose), jnp.asarray(joint_angles)])
        return self.layout.assemble(q, jnp.zeros_like(q))
