"""Centroidal dynamics MPC model (flow map + helpers), TPU-native.

Replaces ocs2's `PinocchioCentroidalDynamicsAD` + `CentroidalModelPinocchioMapping`
(reference `CentroidalDynamicsAD.cpp:38-64`; state/input layout
`CentroidalMpcRobotModel.h:52-101`). No CppAD codegen: derivatives come from
`jax.jacfwd` of this pure function.

State  x = [h(6) normalized centroidal momentum, q_base(6), q_joints(n)]
Input  u = [W_l(6), W_r(6), qd_joints(n)]   (wrenches world-frame at contact frames)

Flow map (FullCentroidalDynamics, `centroidalModelType 0`):
    h_dot   = (1/m) * [ sum_i f_i + m*g_vec ;
                        sum_i ((p_ci - p_com) x f_i + tau_i) ]
    qb_dot  = A_b(q)^-1 (m*h - A_j(q) qd_j)     (centroidal momentum matrix split)
    qj_dot  = u_joints
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.models.layout import CentroidalLayout
from wb_humanoid_mpc_tpu.models.robot.urdf import RobotModel


@dataclasses.dataclass(frozen=True)
class CentroidalModel:
    robot: RobotModel
    layout: CentroidalLayout
    contact_frames: tuple[str, ...]
    # centroidalModelType 1 = Single Rigid Body Dynamics: the centroidal
    # momentum matrix is evaluated at a fixed nominal joint posture and the
    # joint-velocity momentum contribution is dropped (ocs2
    # `FactoryFunctions::loadCentroidalType`, SURVEY.md §2.4).
    srbm: bool = False
    nominal_joint_angles: tuple = ()

    @property
    def state_dim(self) -> int:
        return self.layout.state_dim

    @property
    def input_dim(self) -> int:
        return self.layout.input_dim

    def _momentum_matrix(self, q):
        """A(q) for the full model; SRBD variant uses nominal joints and
        zeros the joint columns."""
        if not self.srbm:
            return dyn.centroidal_momentum_matrix(self.robot, q)
        q_nom = q.at[6:].set(jnp.asarray(self.nominal_joint_angles, dtype=q.dtype))
        A = dyn.centroidal_momentum_matrix(self.robot, q_nom)
        return A.at[:, 6:].set(0.0)

    def flow_map(self, t, x, u):
        """dx/dt for a single (x, u); vmap over nodes/batch."""
        lay = self.layout
        robot = self.robot
        m_total = robot.total_mass

        h = lay.momentum(x)
        q = lay.generalized_coordinates(x)
        qd_j = lay.joint_input(u)

        fk = kin.forward_kinematics(robot, q)
        p_com = dyn.com_position(robot, q)

        # momentum rate from contact wrenches + gravity
        g_vec = jnp.array([0.0, 0.0, -robot.gravity], dtype=x.dtype)
        f_sum = jnp.zeros(3, dtype=x.dtype)
        tau_sum = jnp.zeros(3, dtype=x.dtype)
        for i, frame in enumerate(self.contact_frames):
            _, p_ci = kin.frame_transform(robot, fk, frame)
            f_i = lay.contact_force(u, i)
            tau_i = lay.contact_torque(u, i)
            f_sum = f_sum + f_i
            tau_sum = tau_sum + jnp.cross(p_ci - p_com, f_i) + tau_i
        h_dot = jnp.concatenate([f_sum / m_total + g_vec, tau_sum / m_total])

        # base kinematics from momentum: A_b qb_dot + A_j qd_j = m h
        A = self._momentum_matrix(q)
        A_b = A[:, :6]
        A_j = A[:, 6:]
        qb_dot = jnp.linalg.solve(A_b, m_total * h - A_j @ qd_j)

        return jnp.concatenate([h_dot, qb_dot, qd_j])

    def initial_state(self, base_pose, joint_angles):
        h = jnp.zeros(6)
        return self.layout.assemble(h, jnp.asarray(base_pose), jnp.asarray(joint_angles))

    def state_from_generalized(self, q, v):
        """(q, v) of the rigid-body chart -> centroidal state (momentum map).

        Mirrors the observation conversion in the reference controller
        (`CentroidalMpcMrtJointController.cpp:101-137`: h = A v / mass).
        """
        h = dyn.normalized_centroidal_momentum(self.robot, q, v)
        return jnp.concatenate([h, q])

    def generalized_velocity(self, x, qd_j):
        """Recover full generalized velocity from state + joint velocity input."""
        lay = self.layout
        q = lay.generalized_coordinates(x)
        A = self._momentum_matrix(q)
        qb_dot = jnp.linalg.solve(
            A[:, :6], self.robot.total_mass * lay.momentum(x) - A[:, 6:] @ qd_j)
        return jnp.concatenate([qb_dot, qd_j])
