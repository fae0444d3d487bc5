"""Whole-body-formulation OCP: torque-level cost/constraint library.

Terms reproduced from the reference assembly (`WBMpcInterface.cpp:131-199`):
  - Q/R quadratic cost over the 58-dim state / 35-dim input
  - terminal cost `terminalCostScaling * Q_final`
  - per-foot task-space foot cost incl. acceleration rows
    (`EndEffectorDynamicsFootCost.cpp`; 18 weights in
    `task_space_foot_cost_weights`)
  - joint-limit soft constraint, foot collision, friction cone, contact
    moment XY — shared semantics with the centroidal OCP
  - hard equalities:
      stance: zero foot acceleration with velocity/pose error feedback
        (`ZeroAccelerationConstraintCppAd` + gain pack
         `WBMpcInterface.cpp:205-229`)
      swing: zero wrench + vertical acceleration tracking of the swing spline
        (`SwingLegVerticalConstraintCppAd`, configs
         `WBMpcPreComputation.cpp:66-112`)

Frame accelerations are *classical* LOCAL_WORLD_ALIGNED accelerations
(reference `PinocchioEndEffectorDynamicsCppAd.cpp:642-658` uses
`getFrameClassicalAcceleration`), computed here as
    a_frame = J(q) a_gen + (d/dq [J(q) v]) v
via one jvp — no CppAD.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.core.config import TaskConfig
from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.models.wb_model import WholeBodyModel
from wb_humanoid_mpc_tpu.ocp.base import BarrierParams, NodeTerms, masked_barrier_value
from wb_humanoid_mpc_tpu.ocp.centroidal_ocp import (
    FRICTION_REGULARIZATION,
    _tilt_error,
)


class WBNodeParams(NamedTuple):
    contact: jnp.ndarray      # [2]
    z_pos: jnp.ndarray        # [2]
    z_vel: jnp.ndarray        # [2]
    z_acc: jnp.ndarray        # [2]
    proximity: jnp.ndarray    # [2]
    x_ref: jnp.ndarray        # [nx]
    u_ref: jnp.ndarray        # [nu]


@dataclasses.dataclass(frozen=True)
class WholeBodyOcp:
    model: WholeBodyModel
    cfg: TaskConfig

    @property
    def n_eq(self) -> int:
        return 14 + len(self.cfg.mimic_joints)

    def barrier_params(self) -> BarrierParams:
        # Penalty families per the reference factory (see the centroidal OCP's
        # barrier_params for the rationale): cone + moment -> relaxed log
        # barrier; joint limits + collision -> one-sided hinge.
        c = self.cfg
        log_mu = np.concatenate([
            np.full(2, c.contacts.friction_cone_barrier.mu),
            np.full(8, c.contacts.contact_moment_barrier.mu),
        ])
        log_delta = np.concatenate([
            np.full(2, c.contacts.friction_cone_barrier.delta),
            np.full(8, c.contacts.contact_moment_barrier.delta),
        ])
        n_j = self.model.layout.n_joints
        quad_mu = np.concatenate([
            np.full(2 * n_j, c.joint_limits_barrier.mu),
            np.full(16, c.collision.barrier.mu),
        ])
        quad_delta = np.concatenate([
            np.full(2 * n_j, c.joint_limits_barrier.delta),
            np.full(16, c.collision.barrier.delta),
        ])
        return BarrierParams(jnp.asarray(log_mu), jnp.asarray(log_delta),
                             jnp.asarray(quad_mu), jnp.asarray(quad_delta))

    def node_terms(self, t, x, u, p: WBNodeParams) -> NodeTerms:
        return self.fused_node(t, x, u, p)[0]

    def fused_node(self, t, x, u, p: WBNodeParams) -> tuple[NodeTerms, jnp.ndarray]:
        """(NodeTerms, x_dot) sharing one FK/CRBA/NLE pass.

        The flow map's k1 = [v; a_gen] reuses the same `mass_and_nle` +
        contact-Jacobian bundle the cost/constraint terms need, so the LQ
        linearization differentiates the heavy rigid-body graph exactly once
        per node (reference does the analogous caching via
        `HumanoidPreComputation`/`WBMpcPreComputation`, SURVEY.md §2.1).
        """
        c = self.cfg
        model = self.model
        lay = model.layout
        robot = model.robot

        q = lay.generalized_coordinates(x)
        v = lay.generalized_velocities(x)
        qdd_j = lay.joint_input(u)
        W = lay.contact_wrenches(u)

        mn = dyn.mass_and_nle(robot, q, v)
        fk = mn.fk

        def contact_J(frame):
            return kin.frame_jacobian(robot, fk, frame)

        J_c = jnp.stack([contact_J(f) for f in model.contact_frames])
        a_gen = dyn.generalized_accelerations(robot, mn.M, mn.nle, qdd_j, J_c, W)

        # classical frame accelerations via jvp of the twist map
        def frame_twist(q_, frame):
            fk_ = kin.forward_kinematics(robot, q_)
            return kin.frame_jacobian(robot, fk_, frame) @ v

        foot_kin = []
        for i, frame in enumerate(model.contact_frames):
            R_f, p_f = kin.frame_transform(robot, fk, frame)
            J_f = J_c[i]
            twist = J_f @ v
            _, Jdot_v = jax.jvp(lambda q_: frame_twist(q_, frame), (q,), (v,))
            acc = J_f @ a_gen + Jdot_v  # [6] classical [lin; ang] acceleration
            foot_kin.append((R_f, p_f, J_f, twist, acc))

        # ---------- Gauss-Newton residuals ----------
        rs = [
            jnp.sqrt(jnp.asarray(c.Q)) * (x - p.x_ref),
            jnp.sqrt(jnp.asarray(c.R)) * (u - p.u_ref),
        ]
        w = jnp.sqrt(jnp.asarray(c.task_space_foot_cost_weights))  # 18 entries
        for i in range(2):
            R_f, p_f, J_f, twist, acc = foot_kin[i]
            rs.append(jnp.concatenate([
                # reference position = origin, as in the reference foot cost
                # (`CentroidalMpcEndEffectorFootCost.cpp:137`); zero weight in
                # the G1 config, but nonzero weights must not be discarded
                w[0:3] * p_f,
                w[3:6] * _tilt_error(R_f, jnp.array([0.0, 0.0, 1.0])),
                w[6:9] * twist[:3] * p.proximity[i],
                w[9:12] * twist[3:6],
                w[12:15] * acc[:3],
                w[15:18] * acc[3:6],
            ]))
        # optional joint torque cost (reference `JointTorqueCostCppAd`,
        # `WBMpcInterface.cpp:286-291`; disabled in the G1 config)
        if c.joint_torque_weights is not None:
            tau = dyn.joint_torques(robot, mn.M, mn.nle, qdd_j, J_c, W)
            rs.append(jnp.sqrt(jnp.asarray(c.joint_torque_weights)) * tau)
        r = jnp.concatenate(rs)

        # ---------- relaxed-log-barrier rows (cone, moment, collision) ----------
        h_rows = []
        h_masks = []
        mu_f = c.contacts.friction_coefficient
        for i in range(2):
            f_w = lay.contact_force(u, i)
            cone = mu_f * f_w[2] - jnp.sqrt(f_w[0] ** 2 + f_w[1] ** 2 + FRICTION_REGULARIZATION)
            h_rows.append(masked_barrier_value(cone[None], p.contact[i, None]))
            h_masks.append(p.contact[i, None])
        for i in range(2):
            R_f = foot_kin[i][0]
            f_local = R_f.T @ lay.contact_force(u, i)
            m_local = R_f.T @ lay.contact_torque(u, i)
            rows = jnp.stack([
                m_local[0] - c.contacts.rectangle_y_min * f_local[2],
                -m_local[0] + c.contacts.rectangle_y_max * f_local[2],
                -m_local[1] - c.contacts.rectangle_x_min * f_local[2],
                m_local[1] + c.contacts.rectangle_x_max * f_local[2],
            ])
            h_rows.append(masked_barrier_value(rows, p.contact[i]))
            h_masks.append(jnp.broadcast_to(p.contact[i], (4,)))

        h_log = jnp.concatenate(h_rows)
        h_log_mask = jnp.concatenate(h_masks)

        # ---------- hinge-barrier rows (joint limits + collision) ----------
        # all 16 reference sphere pairs, reference row order
        # (`FootCollisionConstraint.cpp:122-141`; knee row uses the knee
        # radius); hinge penalty per the reference factory, masked rows park
        # at 1.0 >> delta (value and derivatives exactly zero)
        col_active = 1.0 - p.contact[0] * p.contact[1]
        cl, cr = model.contact_frames

        def fpos(name):
            return kin.frame_transform(robot, fk, name)[1]

        l_c, r_c = foot_kin[0][1], foot_kin[1][1]
        l1, l2 = fpos(f"{cl}_collision_p_1"), fpos(f"{cl}_collision_p_2")
        r1, r2 = fpos(f"{cr}_collision_p_1"), fpos(f"{cr}_collision_p_2")
        ankle_l, ankle_r = fpos(c.collision.left_ankle_frame), fpos(c.collision.right_ankle_frame)
        knee_l, knee_r = fpos(c.collision.left_knee_frame), fpos(c.collision.right_knee_frame)
        min_foot = 2.0 * c.collision.foot_radius
        min_knee = 2.0 * c.collision.knee_radius
        pairs = [
            (l1, r1), (l1, r2), (l2, r1), (l2, r2),
            (l_c, r1), (l_c, r2), (r_c, l1), (r_c, l2),
            (l_c, r_c),
            (knee_l, knee_r),
            (l_c, ankle_r), (l1, ankle_r), (l2, ankle_r),
            (r_c, ankle_l), (r1, ankle_l), (r2, ankle_l),
        ]
        min_d = jnp.asarray([min_foot] * 9 + [min_knee] + [min_foot] * 6)
        dists = jnp.stack([jnp.sqrt(jnp.sum((a - b) ** 2) + 1e-12)
                           for a, b in pairs]) - min_d
        coll_rows = masked_barrier_value(dists, col_active, safe_value=1.0)

        qj = lay.joint_angles(x)
        h_quad = jnp.concatenate([
            jnp.asarray(robot.joint_upper) - qj,
            qj - jnp.asarray(robot.joint_lower),
            coll_rows,
        ])

        # ---------- equality constraints ----------
        fc = c.model_settings.foot_constraint
        g_rows = []
        normal = jnp.array([0.0, 0.0, 1.0])
        for i in range(2):
            R_f, p_f, J_f, twist, acc = foot_kin[i]
            tilt = _tilt_error(R_f, normal)
            Av = jnp.concatenate([
                jnp.array([fc.linear_velocity_error_gain_xy,
                           fc.linear_velocity_error_gain_xy,
                           fc.linear_velocity_error_gain_z]),
                jnp.full(3, fc.angular_velocity_error_gain),
            ])
            Aa = jnp.concatenate([
                jnp.array([fc.linear_acceleration_error_gain_xy,
                           fc.linear_acceleration_error_gain_xy,
                           fc.linear_acceleration_error_gain_z]),
                jnp.full(3, fc.angular_acceleration_error_gain),
            ])
            pose_err = jnp.concatenate([
                jnp.array([0.0, 0.0, fc.position_error_gain_z * (p_f[2] - p.z_pos[i])]),
                fc.orientation_error_gain * tilt,
            ])
            stance_rows = Aa * acc + Av * twist + pose_err
            # normalize: wrench rows are O(m g / 2) in Newtons; scale to O(1)
            # so the AL penalty treats all equality rows uniformly
            wrench_scale = 2.0 / (robot.total_mass * robot.gravity)
            wrench_rows = lay.contact_wrench(u, i) * wrench_scale
            g_rows.append(p.contact[i] * stance_rows + (1.0 - p.contact[i]) * wrench_rows)

            # swing vertical-acceleration tracking (1 row)
            swing_row = (
                fc.linear_acceleration_error_gain_z * (acc[2] - p.z_acc[i])
                + fc.linear_velocity_error_gain_z * (twist[2] - p.z_vel[i])
                + fc.position_error_gain_z * (p_f[2] - p.z_pos[i])
            )
            g_rows.append((1.0 - p.contact[i]) * swing_row[None])

        # joint mimic constraints at acceleration level w/ vel+pos feedback
        # (reference `JointMimicDynamicsConstraint`, built `WBMpcInterface.cpp:233-272`)
        qj_all = lay.joint_angles(x)
        vj_all = lay.joint_velocities(x)
        for mj in c.mimic_joints:
            ip = self.model.robot.joint_index(mj.parent_joint_name)
            ic = self.model.robot.joint_index(mj.child_joint_name)
            row = (mj.multiplier * qdd_j[ip] - qdd_j[ic]
                   + mj.velocity_gain * (mj.multiplier * vj_all[ip] - vj_all[ic])
                   + mj.position_gain * (mj.multiplier * qj_all[ip] - qj_all[ic]))
            g_rows.append(row[None])
        g = jnp.concatenate(g_rows)

        terms = NodeTerms(r=r, h_log=h_log, h_log_mask=h_log_mask,
                          h_quad=h_quad, g=g)
        x_dot = jnp.concatenate([v, a_gen])
        return terms, x_dot

    def terminal_residual(self, t, x, p: WBNodeParams) -> jnp.ndarray:
        Qf = jnp.asarray(self.cfg.Q_final) * self.cfg.terminal_cost_scaling
        return jnp.sqrt(Qf) * (x - p.x_ref)


def make_wb_node_params(ocp: WholeBodyOcp, swing, x_ref) -> WBNodeParams:
    """SwingReference + target states -> per-node params."""
    from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input

    lay = ocp.model.layout
    contact = jnp.asarray(swing.contact_flags)
    u_ref = weight_comp_input(ocp.model.robot.total_mass, ocp.model.robot.gravity,
                              contact, lay.input_dim)
    return WBNodeParams(
        contact=contact,
        z_pos=jnp.asarray(swing.z_pos),
        z_vel=jnp.asarray(swing.z_vel),
        z_acc=jnp.asarray(swing.z_acc),
        proximity=jnp.asarray(swing.proximity),
        x_ref=jnp.asarray(x_ref),
        u_ref=u_ref,
    )
