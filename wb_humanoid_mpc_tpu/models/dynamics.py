"""Rigid-body dynamics via Lagrangian automatic differentiation (TPU-first).

Replaces Pinocchio's CRBA / nonLinearEffects / centroidal-momentum algorithms
and the entire CppAD codegen subsystem of the reference
(reference: `humanoid_common_mpc/src/pinocchio_model/DynamicsHelperFunctions.cpp`;
codegen init path surveyed at SURVEY.md §3.4).

Key identities (all verified in tests):
- Mass matrix:      M(q)   = sum_b J_b^T I_b^W(q) J_b        (one einsum)
- Bias forces:      nle(q,v) = d/dt(M v) - grad_q T + grad_q V
                    with d/dt(M v) = jvp of q -> M(q) v along v
- Centroidal momentum matrix: A_G(q) = shift-to-com( sum_b I_b^W J_b )
- Contact-consistent inverse dynamics / base-acceleration solve mirror the
  reference's block-diagonal base-mass exploitation
  (`DynamicsHelperFunctions.cpp:199-218`): the base mass matrix of the
  translation+eulerZYX joint is NOT block diagonal in general, so we solve
  the full 6x6 base block (cheap, batched) — the reference's 3x3 split is a
  CppAD workaround, valid only because Pinocchio's base block is expressed at
  the base origin where coupling vanishes; we keep the exact 6x6 solve.

Everything is pure-functional over fixed shapes: `vmap` over horizon nodes and
scenario instances turns the per-instance small-matrix algebra into large
batched GEMMs on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.models.kinematics import FK, all_body_jacobians, forward_kinematics
from wb_humanoid_mpc_tpu.models.robot.urdf import RobotModel
from wb_humanoid_mpc_tpu.utils.rotations import skew


def spatial_inertia_world(model: RobotModel, fk: FK) -> jnp.ndarray:
    """[n_b, 6, 6] spatial inertia of each body at its origin, world axes.

    Acting on [v_origin; omega]: momentum [p_lin; L_origin] = I @ twist with
        p_lin = m v - h x omega,   L = I_o omega + h x v,   h = m * (R c).
    """
    m = jnp.asarray(model.mass)               # [n_b]
    c = jnp.asarray(model.com)                # [n_b,3]
    Io = jnp.asarray(model.inertia_o)         # [n_b,3,3]
    R = fk.R                                   # [n_b,3,3]

    h_w = m[:, None] * jnp.einsum("bij,bj->bi", R, c)       # [n_b,3]
    Io_w = jnp.einsum("bij,bjk,blk->bil", R, Io, R)          # R Io R^T
    Sh = skew(h_w)                                           # [n_b,3,3]
    eye = jnp.broadcast_to(jnp.eye(3), Sh.shape)
    top = jnp.concatenate([m[:, None, None] * eye, -Sh], axis=2)
    bot = jnp.concatenate([Sh, Io_w], axis=2)
    return jnp.concatenate([top, bot], axis=1)               # [n_b,6,6]


def mass_matrix_from(model: RobotModel, fk: FK, J: jnp.ndarray) -> jnp.ndarray:
    I_w = spatial_inertia_world(model, fk)
    return jnp.einsum("bri,brs,bsj->ij", J, I_w, J)


def mass_matrix(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """nq x nq generalized mass matrix (CRBA equivalent)."""
    fk = forward_kinematics(model, q)
    return mass_matrix_from(model, fk, all_body_jacobians(model, fk))


def kinetic_energy(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * v @ mass_matrix(model, q) @ v


def potential_energy(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    fk = forward_kinematics(model, q)
    m = jnp.asarray(model.mass)
    c = jnp.asarray(model.com)
    com_w = fk.p + jnp.einsum("bij,bj->bi", fk.R, c)
    return model.gravity * jnp.sum(m * com_w[:, 2])


def com_position(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    fk = forward_kinematics(model, q)
    m = jnp.asarray(model.mass)
    c = jnp.asarray(model.com)
    com_w = fk.p + jnp.einsum("bij,bj->bi", fk.R, c)
    return (m[:, None] * com_w).sum(0) / jnp.sum(m)


def nonlinear_effects(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """nle(q, v) = C(q,v) v + g(q)   (Coriolis/centrifugal + gravity).

    Lagrangian identity:  nle = (d/dt M) v - ∇_q T(q,v) + ∇_q V(q), where
    (d/dt M) v = J_q(M v)[v]. Exact, fully AD-generated — the TPU-native
    replacement for Pinocchio's RNEA-with-zero-acceleration.
    """
    Mv = lambda q_: mass_matrix(model, q_) @ v
    _, dMv = jax.jvp(Mv, (q,), (v,))
    gradT = jax.grad(lambda q_: kinetic_energy(model, q_, v))(q)
    gradV = jax.grad(lambda q_: potential_energy(model, q_))(q)
    return dMv - gradT + gradV


class MassNle(NamedTuple):
    M: jnp.ndarray
    nle: jnp.ndarray
    fk: FK
    J: jnp.ndarray  # [n_b,6,nq] body Jacobians


def mass_and_nle(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> MassNle:
    fk = forward_kinematics(model, q)
    J = all_body_jacobians(model, fk)
    M = mass_matrix_from(model, fk, J)
    nle = nonlinear_effects(model, q, v)
    return MassNle(M, nle, fk, J)


def centroidal_momentum_matrix(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """A_G(q): 6 x nq map with h_G = A_G v, h_G = [linear; angular about com]."""
    fk = forward_kinematics(model, q)
    J = all_body_jacobians(model, fk)
    I_w = spatial_inertia_world(model, fk)
    # momentum of each body about its own origin -> shift to world origin:
    # p_lin unchanged; L_O = L_b + p_b x p_lin
    A_b = jnp.einsum("brs,bsj->brj", I_w, J)      # [n_b,6,nq] per-body momentum maps
    p = fk.p
    lin = A_b[:, 0:3, :]
    ang_O = A_b[:, 3:6, :] + jnp.einsum("bij,bjn->bin", skew(p), lin)
    lin = lin.sum(0)
    ang_O = ang_O.sum(0)
    # shift from world origin to com: L_G = L_O - p_com x p_lin
    pc = com_position(model, q)
    ang_G = ang_O - skew(pc) @ lin
    return jnp.concatenate([lin, ang_G], axis=0)


def normalized_centroidal_momentum(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """h_G / total_mass — the reference's normalized centroidal momentum state."""
    return (centroidal_momentum_matrix(model, q) @ v) / model.total_mass


def base_acceleration(M: jnp.ndarray, nle: jnp.ndarray, qdd_joints: jnp.ndarray,
                      tau_ext: jnp.ndarray) -> jnp.ndarray:
    """Solve the 6-dim base rows of M qdd + nle = tau_ext for base acceleration.

    Reference `DynamicsHelperFunctions.cpp:199-218` splits the base block into
    two 3x3 inverses (a CppAD workaround); we solve the exact 6x6 base block.
    """
    M_bb = M[:6, :6]
    M_bj = M[:6, 6:]
    rhs = -nle[:6] - M_bj @ qdd_joints + tau_ext[:6]
    return jnp.linalg.solve(M_bb, rhs)


def joint_torques(model: RobotModel, M: jnp.ndarray, nle: jnp.ndarray,
                  qdd_joints: jnp.ndarray, J_contacts: jnp.ndarray,
                  wrenches: jnp.ndarray) -> jnp.ndarray:
    """Contact-consistent inverse dynamics -> actuated joint torques.

    Mirrors reference `computeJointTorques` (`DynamicsHelperFunctions.cpp:233-272`):
    project contact wrenches to joint space, solve base acceleration, then
    tau_j = [M qdd + nle - J^T W]_joints.

    J_contacts: [n_c, 6, nq]; wrenches: [n_c, 6] world-frame [force; torque].
    """
    tau_ext = jnp.einsum("crn,cr->n", J_contacts, wrenches)
    a_base = base_acceleration(M, nle, qdd_joints, tau_ext)
    qdd = jnp.concatenate([a_base, qdd_joints])
    n_j = qdd_joints.shape[0]
    return M[6:, :] @ qdd + nle[6:] - tau_ext[6:]


def generalized_accelerations(model: RobotModel, M: jnp.ndarray, nle: jnp.ndarray,
                              qdd_joints: jnp.ndarray, J_contacts: jnp.ndarray,
                              wrenches: jnp.ndarray) -> jnp.ndarray:
    """[a_base(6); qdd_joints] given joint accelerations + contact wrenches
    (reference `humanoid_wb_mpc/src/dynamics/DynamicsHelperFunctions.cpp:97-110`)."""
    tau_ext = jnp.einsum("crn,cr->n", J_contacts, wrenches)
    a_base = base_acceleration(M, nle, qdd_joints, tau_ext)
    return jnp.concatenate([a_base, qdd_joints])
