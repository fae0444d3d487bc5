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


class MassNle(NamedTuple):
    M: jnp.ndarray
    nle: jnp.ndarray
    fk: FK
    J: jnp.ndarray  # [n_b,6,nq] body Jacobians


def nle_newton_euler(model: RobotModel, fk: FK, vb, J: jnp.ndarray) -> jnp.ndarray:
    """nle(q,v) from one Newton-Euler force balance over all bodies at once.

    Given per-body twists and zero-q̈ bias accelerations (gravity seeded into
    the base bias — `forward_kinematics_vel`), the net bias wrench of body b
    at its origin is

        F   = m (a_o + ω̇ × r_c + ω × (ω × r_c))        r_c = R c
        N_o = I_c^w ω̇ + ω × (I_c^w ω) + r_c × F         I_c^w = R I_c Rᵀ

    and nle = Σ_b J_bᵀ [F; N_o] — a single batched contraction instead of the
    backward recursion of Pinocchio's RNEA (and instead of AD transpose
    passes; reference `DynamicsHelperFunctions.cpp:287+`).
    """
    dtype = fk.R.dtype
    m = jnp.asarray(model.mass, dtype=dtype)
    c = jnp.asarray(model.com, dtype=dtype)
    Io = jnp.asarray(model.inertia_o, dtype=dtype)
    # inertia about the COM (body frame): parallel-axis from the origin inertia
    Sc = skew(c)
    Ic = Io - m[:, None, None] * jnp.einsum("bji,bjk->bik", Sc, Sc)

    R, w, dw, a_o = fk.R, vb.omega, vb.domega, vb.a_o
    r_c = jnp.einsum("bij,bj->bi", R, c)
    a_c = a_o + jnp.cross(dw, r_c) + jnp.cross(w, jnp.cross(w, r_c))
    F = m[:, None] * a_c
    Ic_w = jnp.einsum("bij,bjk,blk->bil", R, Ic, R)
    Icw_w = jnp.einsum("bij,bj->bi", Ic_w, w)
    N_o = (jnp.einsum("bij,bj->bi", Ic_w, dw) + jnp.cross(w, Icw_w)
           + jnp.cross(r_c, F))
    wrench = jnp.concatenate([F, N_o], axis=1)          # [n_b, 6]
    return jnp.einsum("bri,br->i", J, wrench)


def mass_and_nle(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> MassNle:
    """(M, nle, fk, J) from one fused level-parallel kinematics pass.

    M via the world-Jacobian contraction (CRBA equivalent), nle via the
    batched Newton-Euler balance on propagated twists/bias accelerations —
    no AD transpose passes, so the traced graph is ~3x smaller than a
    Lagrangian-AD formulation (this function sits under jacfwd inside the LQ
    linearization of every SQP solve; graph size == TPU kernel count ==
    latency). Replaces Pinocchio CRBA + RNEA-at-zero-acceleration.
    """
    from wb_humanoid_mpc_tpu.models.kinematics import forward_kinematics_vel

    fk, vb = forward_kinematics_vel(model, q, v)
    J = all_body_jacobians(model, fk)
    M = mass_matrix_from(model, fk, J)
    nle = nle_newton_euler(model, fk, vb, J)
    return MassNle(M, nle, fk, J)


def nonlinear_effects(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """nle(q, v) = C(q,v) v + g(q)   (Coriolis/centrifugal + gravity)."""
    return mass_and_nle(model, q, v).nle


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
