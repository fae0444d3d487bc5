"""Riccati backward/forward passes for the multiple-shooting LQ subproblem.

TPU-native replacement of HPIPM's block-banded interior-point/Riccati solve
(SURVEY.md §2.4 ocs2_sqp; the reference delegates the QP to HPIPM/BLASFEO).
Here: a `lax.scan` backward Riccati recursion with Levenberg regularization,
vmap-able over batched problem instances (the batch axis turns the [nx,nx]
factorizations into MXU-batched GEMM/Cholesky). The associative-scan
(O(log N) depth) variant lives in `solver/priccati.py`.

Convention (dx_k = x_k deviation, du_k = u_k deviation):
    dynamics   dx_{k+1} = A_k dx_k + B_k du_k + d_k       (d = shooting defect)
    stage cost 1/2 dx'Qxx dx + 1/2 du'Quu du + du'Qux dx + qx'dx + qu'du
    terminal   1/2 dx'QN dx + qN'dx
Outputs feedback gains K_k, feedforward k_k with du = K dx + k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.solver.transcription import LQApprox


def levenberg_damp(lq: LQApprox, reg: float) -> LQApprox:
    """Fold relative Levenberg trust-region damping into the stage data:
    Quu_k += reg * max(max(diag(Quu_k)), 1) * I. Applied once, before any
    Riccati variant, so the sequential scan, the associative-scan pass and
    the horizon-sharded pass all solve the SAME damped QP (see
    `SqpSolverConfig.reg`)."""
    nu = lq.Quu.shape[-1]
    diag = jnp.diagonal(lq.Quu, axis1=-2, axis2=-1)
    scale = jnp.maximum(jnp.max(diag, axis=-1), 1.0)
    eyeu = jnp.eye(nu, dtype=lq.Quu.dtype)
    return lq._replace(Quu=lq.Quu + (reg * scale)[..., None, None] * eyeu)


class RiccatiSolution(NamedTuple):
    K: jnp.ndarray   # [N, nu, nx]
    k: jnp.ndarray   # [N, nu]
    P: jnp.ndarray   # [N+1, nx, nx]  (value Hessians, diagnostic)
    p: jnp.ndarray   # [N+1, nx]


def backward_pass(lq: LQApprox, reg: float = 1e-8) -> RiccatiSolution:
    nu = lq.B.shape[-1]
    eyeu = jnp.eye(nu, dtype=lq.B.dtype)

    def step(carry, inp):
        P_next, p_next = carry
        A, B, d, Qxx, Quu, Qux, qx, qu = inp

        Pd_p = P_next @ d + p_next
        Qx = qx + A.T @ Pd_p
        Qu = qu + B.T @ Pd_p
        PA = P_next @ A
        PB = P_next @ B
        Qxx_h = Qxx + A.T @ PA
        Quu_h = Quu + B.T @ PB
        # relative Levenberg regularization: keeps the Cholesky PD in float32
        # even when Quu spans many orders of magnitude
        scale = jnp.maximum(jnp.max(jnp.diagonal(Quu_h)), 1.0)
        Quu_h = Quu_h + (reg * scale) * eyeu
        Qux_h = Qux + B.T @ PA

        # solve via Cholesky (Quu_h symmetric pd after regularization)
        L = jnp.linalg.cholesky(0.5 * (Quu_h + Quu_h.T))
        K = -jax.scipy.linalg.cho_solve((L, True), Qux_h)
        kff = -jax.scipy.linalg.cho_solve((L, True), Qu)

        P = Qxx_h + Qux_h.T @ K
        P = 0.5 * (P + P.T)
        p = Qx + Qux_h.T @ kff
        return (P, p), (K, kff, P, p)

    init = (lq.QN, lq.qN)
    (_, _), (K, k, Ps, ps) = jax.lax.scan(
        step, init,
        (lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu),
        reverse=True,
    )
    P_all = jnp.concatenate([Ps, lq.QN[None]], axis=0)
    p_all = jnp.concatenate([ps, lq.qN[None]], axis=0)
    return RiccatiSolution(K=K, k=k, P=P_all, p=p_all)


def forward_pass(lq: LQApprox, sol: RiccatiSolution, dx0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Roll the linear closed loop; returns (dxs [N+1,nx], dus [N,nu])."""

    def step(dx, inp):
        A, B, d, K, k = inp
        du = K @ dx + k
        dx_next = A @ dx + B @ du + d
        return dx_next, (dx, du)

    dx_last, (dxs, dus) = jax.lax.scan(
        step, dx0, (lq.A, lq.B, lq.d, sol.K, sol.k))
    dxs = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dxs, dus
