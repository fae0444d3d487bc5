"""Centroidal-formulation OCP: the full cost/constraint library as one
statically-shaped node function.

Terms reproduced from the reference assembly
(`CentroidalMpcInterface.cpp:151-237` `setupOptimalControlProblem`):
  - Q/R quadratic cost around (arm-swing nominal state, weight-comp input)
    (reference `StateInputQuadraticCost.cpp:67-79`)
  - terminal cost `terminalCostScaling * Q_final`
  - per-foot task-space foot cost with plane-tilt orientation error and
    impact-proximity-scaled velocity error (`CentroidalMpcEndEffectorFootCost.cpp:90-146`)
  - torso (mid360_link) task-space cost (`EndEffectorKinematicsQuadraticCost.cpp:110-140`)
  - ICP cost (`ICPCost.cpp:88-119`; zero weight in the G1 config, still wired)
  - per-leg external torque cost, scaled by (1 - other-foot proximity)
    (`ExternalTorqueQuadraticCostAD.cpp:110-136`)
  - joint-limit soft constraint (piecewise barrier, `JointLimitsSoftConstraint.cpp:57-88`)
  - foot/knee/ankle collision soft constraint, all 16 reference sphere-pair
    distances (9 foot-foot, 1 knee-knee, 6 foot-ankle), active only when
    not double-stance (`FootCollisionConstraint.cpp:80-146`)
  - per-foot friction cone (analytic, regularized;
    `FrictionForceConeConstraint.cpp:173-180`) and CoP-rectangle moment rows
    (`ContactMomentXYConstraintCppAd.cpp:85-103`) as relaxed-log-barrier rows
  - hard equalities: stance 6-DoF twist constraint w/ error feedback
    (`ZeroVelocityConstraintCppAd.cpp`, config `CentroidalMpcInterface.cpp:243-264`),
    swing zero wrench (`ZeroWrenchConstraint`), swing normal-velocity tracking
    (`HumanoidPreComputation.cpp:96-118`).

Stance/swing share a 6-row slot per foot (stance: twist rows, swing:
zero-wrench rows) + 1 masked swing row, keeping shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.core.config import TaskConfig
from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.models.centroidal_model import CentroidalModel
from wb_humanoid_mpc_tpu.ocp.base import BarrierParams, NodeTerms, masked_barrier_value

FRICTION_REGULARIZATION = 25.0  # reference FrictionForceConeConstraint.h:66-67 default


class NodeParams(NamedTuple):
    """Per-node reference data (pytree; leading axes broadcast over nodes)."""

    contact: jnp.ndarray      # [2] 1.0 if foot in contact
    z_pos: jnp.ndarray        # [2] swing/stance z reference
    z_vel: jnp.ndarray        # [2] swing z velocity reference
    proximity: jnp.ndarray    # [2] impact proximity factor
    x_ref: jnp.ndarray        # [nx] nominal state (incl. arm swing)
    u_ref: jnp.ndarray        # [nu] nominal input (weight compensating)
    torso_ref: jnp.ndarray    # [n_ts_links, 18] = [p(3), R(9) row-major, v(3), omega(3)]


def _tilt_error(R, normal):
    """3-dim orientation-vs-plane error: n x (R e_z) — zero iff the frame
    z-axis aligns with the plane normal (stands in for ocs2's
    `rotationMatrixDistanceToPlane`, submodule-only).

    Sign convention matters for the stance feedback rows `omega + k*e = 0`:
    with e = n x (R e_z) one has de/dt = +omega_xy near upright, so the
    constraint drives e -> 0 (verified: the opposite sign destabilizes the
    stance foot during single support)."""
    z_axis = R[:, 2]
    return jnp.cross(normal, z_axis)


def _rotation_error(R, R_ref):
    E = R @ R_ref.T
    return 0.5 * jnp.array([E[2, 1] - E[1, 2], E[0, 2] - E[2, 0], E[1, 0] - E[0, 1]])


@dataclasses.dataclass(frozen=True)
class CentroidalOcp:
    model: CentroidalModel
    cfg: TaskConfig

    # ---- static dimensions ----
    @property
    def n_eq(self) -> int:
        # 2 feet x (6 stance-twist/zero-wrench + 1 swing normal vel) + mimic rows
        return 14 + len(self.cfg.mimic_joints)

    def barrier_params(self) -> BarrierParams:
        # Penalty families per the reference factory: cone + contact-moment use
        # the relaxed LOG barrier (`HumanoidCostConstraintFactory.cpp:156-211`,
        # RelaxedBarrierPenalty); collision and joint limits use the one-sided
        # piecewise-polynomial HINGE (`:99-149`, PieceWisePolynomialBarrierPenalty
        # — zero value/gradient outside the delta boundary layer). Rounds 1-3
        # wrongly ran collision through the log barrier, whose -mu*ln(h)
        # gradient at nominal clearance (h ~ 0.1, mu 30000) dominated the OCP
        # and needed an unvalidated 1e-3 mu rescale; the hinge needs no hack.
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

    # ---- the per-node function ----
    def node_terms(self, t, x, u, p: NodeParams) -> NodeTerms:
        return self.fused_node(t, x, u, p)[0]

    def fused_node(self, t, x, u, p: NodeParams) -> tuple[NodeTerms, jnp.ndarray]:
        """(NodeTerms, x_dot) sharing one FK / centroidal-momentum pass.

        The flow map's h_dot needs the contact positions and the CoM, and its
        qb_dot is exactly the base part of the generalized velocity the cost
        terms already recover — so the dynamics come for free with the terms
        (the reference caches the analogous quantities per node via
        `HumanoidPreComputation`, SURVEY.md §2.1). The solver's "node"
        sensitivity mode uses this to linearize the whole node once.
        """
        c = self.cfg
        model = self.model
        lay = model.layout
        robot = model.robot
        n_j = lay.n_joints

        q = lay.generalized_coordinates(x)
        qd_j = lay.joint_input(u)
        v = model.generalized_velocity(x, qd_j)
        fk = kin.forward_kinematics(robot, q)

        # ---------- Gauss-Newton residuals ----------
        rs = []
        # quadratic state/input cost (diagonal Q/R)
        rs.append(jnp.sqrt(jnp.asarray(c.Q)) * (x - p.x_ref))
        rs.append(jnp.sqrt(jnp.asarray(c.R)) * (u - p.u_ref))

        # per-foot task-space cost
        w = jnp.sqrt(jnp.asarray(c.task_space_foot_cost_weights))
        foot_kin = []
        for i, frame in enumerate(model.contact_frames):
            R_f, p_f = kin.frame_transform(robot, fk, frame)
            J_f = kin.frame_jacobian(robot, fk, frame)
            twist = J_f @ v
            foot_kin.append((R_f, p_f, J_f, twist))
            err = jnp.concatenate([
                # reference position is literally the origin in the reference
                # implementation (`CentroidalMpcEndEffectorFootCost.cpp:137`,
                # "TODO Update this reference for non flat ground"); the G1
                # config zeroes the position weights, but a nonzero weight
                # must behave like the reference, not be discarded
                w[0:3] * p_f,
                w[3:6] * _tilt_error(R_f, jnp.array([0.0, 0.0, 1.0])),
                w[6:9] * twist[:3] * p.proximity[i],
                w[9:12] * twist[3:6],
            ])
            rs.append(err)

        # torso / generic link task-space costs
        for ts_idx, (name, ts) in enumerate(c.task_space_costs.items()):
            R_l, p_l = kin.frame_transform(robot, fk, ts.link_name)
            J_l = kin.frame_jacobian(robot, fk, ts.link_name)
            tw = J_l @ v
            wl = jnp.sqrt(jnp.asarray(ts.weights[:12]))
            p_ref = p.torso_ref[ts_idx, 0:3]
            R_ref = p.torso_ref[ts_idx, 3:12].reshape(3, 3)
            v_ref = p.torso_ref[ts_idx, 12:15]
            w_ref = p.torso_ref[ts_idx, 15:18]
            rs.append(jnp.concatenate([
                wl[0:3] * (p_l - p_ref),
                wl[3:6] * _rotation_error(R_l, R_ref),
                wl[6:9] * (tw[:3] - v_ref),
                wl[9:12] * (tw[3:6] - w_ref),
            ]))

        # ICP / com-centering cost (zero weight for G1 but wired)
        com = dyn.com_position(robot, q)
        mid = 0.5 * (foot_kin[0][1] + foot_kin[1][1])
        icp_w = jnp.sqrt(jnp.asarray(c.icp_error_weight))
        rs.append(icp_w * (mid[:2] - com[:2]))

        # leg torque costs: tau_ext = (J^T W)_joints, scaled by swing midpoint
        for i, key in enumerate(("left_leg_torque_cost", "right_leg_torque_cost")):
            lt = c.leg_torque_costs.get(key)
            if lt is None:
                continue
            J_f = foot_kin[i][2]
            tau_ext = J_f.T @ lay.contact_wrench(u, i)
            idx = np.array([6 + model.robot.joint_index(jn) for jn in lt.active_joint_names])
            mid_swing_scaler = 1.0 - p.proximity[1 - i]  # other foot's proximity
            rs.append(jnp.sqrt(jnp.asarray(lt.weights)) * tau_ext[idx] * mid_swing_scaler)

        r = jnp.concatenate(rs)

        # ---------- relaxed-log-barrier rows ----------
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
        qj = lay.joint_angles(x)
        ub = jnp.asarray(robot.joint_upper)
        lb = jnp.asarray(robot.joint_lower)

        # foot/knee/ankle collision (state-only) — all 16 reference sphere
        # pairs in the reference's row order (`FootCollisionConstraint.cpp:
        # 122-141`: 9 foot-foot rows, 1 knee-knee row with the knee radius,
        # 6 foot-ankle rows); inactive in double support (`:81-86`); hinge
        # penalty per the reference factory (`HumanoidCostConstraintFactory
        # .cpp:99-116`) — masked rows park at 1.0 >> delta so value and
        # derivatives are exactly zero
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
            (l1, r1), (l1, r2), (l2, r1), (l2, r2),            # rows 0-3
            (l_c, r1), (l_c, r2), (r_c, l1), (r_c, l2),        # rows 4-7
            (l_c, r_c),                                        # row 8
            (knee_l, knee_r),                                  # row 9 (knee)
            (l_c, ankle_r), (l1, ankle_r), (l2, ankle_r),      # rows 10-12
            (r_c, ankle_l), (r1, ankle_l), (r2, ankle_l),      # rows 13-15
        ]
        min_d = jnp.asarray([min_foot] * 9 + [min_knee] + [min_foot] * 6)
        dists = jnp.stack([jnp.sqrt(jnp.sum((a - b) ** 2) + 1e-12) for a, b in pairs]) - min_d
        coll_rows = masked_barrier_value(dists, col_active, safe_value=1.0)

        h_quad = jnp.concatenate([ub - qj, qj - lb, coll_rows])

        # ---------- equality constraints ----------
        fc = c.model_settings.foot_constraint
        gz = fc.position_error_gain_z
        g_ori = fc.orientation_error_gain
        g_rows = []
        for i in range(2):
            R_f, p_f, J_f, twist = foot_kin[i]
            tilt = _tilt_error(R_f, jnp.array([0.0, 0.0, 1.0]))
            stance_rows = jnp.concatenate([
                twist[:3] + jnp.array([0.0, 0.0, 1.0]) * gz * (p_f[2] - p.z_pos[i]),
                twist[3:6] + g_ori * tilt,
            ])
            # normalize: wrench rows are O(m g / 2) in Newtons; scale to O(1)
            # so the AL penalty treats all equality rows uniformly
            wrench_scale = 2.0 / (robot.total_mass * robot.gravity)
            wrench_rows = lay.contact_wrench(u, i) * wrench_scale
            g_rows.append(p.contact[i] * stance_rows + (1.0 - p.contact[i]) * wrench_rows)
            normal_vel = twist[2] + gz * (p_f[2] - p.z_pos[i]) - p.z_vel[i]
            g_rows.append((1.0 - p.contact[i]) * normal_vel[None])

        # joint mimic constraints (velocity level + position feedback;
        # reference `JointMimicKinematicConstraint`, built
        # `CentroidalMpcInterface.cpp:277-313`)
        qj = lay.joint_angles(x)
        for mj in c.mimic_joints:
            ip = robot.joint_index(mj.parent_joint_name)
            ic = robot.joint_index(mj.child_joint_name)
            row = (mj.multiplier * qd_j[ip] - qd_j[ic]
                   + mj.position_gain * (mj.multiplier * qj[ip] - qj[ic]))
            g_rows.append(row[None])
        g = jnp.concatenate(g_rows)

        terms = NodeTerms(r=r, h_log=h_log, h_log_mask=h_log_mask,
                          h_quad=h_quad, g=g)

        # ---------- flow map (same FK pass; `com` computed for the ICP cost,
        # foot positions in foot_kin) ----------
        m_total = robot.total_mass
        g_vec = jnp.array([0.0, 0.0, -robot.gravity], dtype=x.dtype)
        f_sum = jnp.zeros(3, dtype=x.dtype)
        tau_sum = jnp.zeros(3, dtype=x.dtype)
        for i in range(2):
            p_ci = foot_kin[i][1]
            f_i = lay.contact_force(u, i)
            tau_i = lay.contact_torque(u, i)
            f_sum = f_sum + f_i
            tau_sum = tau_sum + jnp.cross(p_ci - com, f_i) + tau_i
        h_dot = jnp.concatenate([f_sum / m_total + g_vec, tau_sum / m_total])
        x_dot = jnp.concatenate([h_dot, v[:6], qd_j])
        return terms, x_dot

    def terminal_residual(self, t, x, p: NodeParams) -> jnp.ndarray:
        """Terminal GN residual (reference `HumanoidCostConstraintFactory.cpp:218-227`)."""
        Qf = jnp.asarray(self.cfg.Q_final) * self.cfg.terminal_cost_scaling
        return jnp.sqrt(Qf) * (x - p.x_ref)
