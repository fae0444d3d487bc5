"""Equality-constraint projection for the LQ subproblem.

The reference's `projectStateInputEqualityConstraints true` path
(`task.info:88`; ocs2_sqp projects the state-input equalities before handing
the reduced LQ problem to HPIPM). Per node, with the linearized constraint

    g + Cx dx + Du du = 0,           Du: [nc, nu]

the control splits into du = L dx + Z dz + w with

    L = -Du^+ Cx,   w = -Du^+ g,     Du^+ = Du^T (Du Du^T + eps I)^-1,
    Z  = orthonormal null-space basis of Du (last nu-nc columns of the
         complete QR of Du^T),

and the stage cost/dynamics transform to the reduced coordinates (dx, dz):

    A' = A + B L          B' = B Z          d' = d + B w
    Qxx' = Qxx + L^T Quu L + L^T Qux + Qux^T L
    Quu' = Z^T Quu Z      Qux' = Z^T (Quu L + Qux)
    qx' = qx + L^T (qu + Quu w) + Qux^T w
    qu' = Z^T (qu + Quu w)

Masked (inactive) constraint rows are exactly zero rows of [g, Cx, Du]; the
damped pseudo-inverse ignores them and the conservative null-space split
(always nu - nc columns) keeps shapes static. Everything is vmapped over
nodes — batched QR/Cholesky on the MXU replaces HPIPM's sequential
elimination.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.solver.transcription import LQApprox


class ProjectionData(NamedTuple):
    L: jnp.ndarray   # [N, nu, nx]
    Z: jnp.ndarray   # [N, nu, nz]
    w: jnp.ndarray   # [N, nu]


def project_lq(lq: LQApprox, Cx: jnp.ndarray, Du: jnp.ndarray, g: jnp.ndarray,
               eps: float = 1e-8) -> tuple[LQApprox, ProjectionData]:
    """Transform the node-wise LQ data onto the constraint null space.

    Cx: [N, nc, nx], Du: [N, nc, nu], g: [N, nc]. Returns the reduced LQ
    (control dim nz = nu - nc) plus the recovery map (L, Z, w).
    """
    nc = Du.shape[1]
    nu = Du.shape[2]
    nz = nu - nc

    one = project_node(eps)

    A, B, d, Qxx, Quu, Qux, qx, qu, L, Z, w = jax.vmap(one)(
        lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu, Cx, Du, g)

    reduced = LQApprox(A=A, B=B, d=d, Qxx=Qxx, Quu=Quu, Qux=Qux, qx=qx, qu=qu,
                       QN=lq.QN, qN=lq.qN, cost=lq.cost, g_norm=lq.g_norm,
                       defect_norm=lq.defect_norm)
    return reduced, ProjectionData(L=L, Z=Z, w=w)


def project_node(eps: float = 1e-8):
    """Single-node projection closure (used standalone by the horizon-sharded
    solver, `solver/sharded_sqp.py`): (A, B, d, Qxx, Quu, Qux, qx, qu, C, D, g)
    -> (A', B', d', Qxx', Quu', Qux', qx', qu', L, Z, w)."""

    def one(A, B, d, Qxx, Quu, Qux, qx, qu, C, D, gv):
        nc = D.shape[0]
        # damped pseudo-inverse rows (handles masked zero rows); damping is
        # relative to the row scale so float32 stays well conditioned
        M0 = D @ D.T
        scale = jnp.maximum(jnp.max(jnp.diagonal(M0)), 1.0)
        M = M0 + (eps * scale) * jnp.eye(nc, dtype=D.dtype)
        Lchol = jnp.linalg.cholesky(0.5 * (M + M.T))
        Dp = jax.scipy.linalg.cho_solve((Lchol, True), jnp.eye(nc, dtype=D.dtype))
        Dpinv = D.T @ Dp                    # [nu, nc]
        L = -Dpinv @ C                      # [nu, nx]
        w = -Dpinv @ gv                     # [nu]
        # null-space basis: complete QR of D^T
        Q, _ = jnp.linalg.qr(D.T, mode="complete")   # [nu, nu]
        Z = Q[:, nc:]                        # [nu, nz]

        QuuL = Quu @ L
        A_p = A + B @ L
        B_p = B @ Z
        d_p = d + B @ w
        Qxx_p = Qxx + L.T @ QuuL + L.T @ Qux + Qux.T @ L
        Quu_p = Z.T @ Quu @ Z
        Qux_p = Z.T @ (QuuL + Qux)
        qu_w = qu + Quu @ w
        qx_p = qx + L.T @ qu_w + Qux.T @ w
        qu_p = Z.T @ qu_w
        return A_p, B_p, d_p, Qxx_p, Quu_p, Qux_p, qx_p, qu_p, L, Z, w

    return one


def recover_controls(proj: ProjectionData, dxs: jnp.ndarray, dzs: jnp.ndarray) -> jnp.ndarray:
    """du_k = L_k dx_k + Z_k dz_k + w_k."""
    return (jnp.einsum("kij,kj->ki", proj.L, dxs[:-1])
            + jnp.einsum("kij,kj->ki", proj.Z, dzs)
            + proj.w)
