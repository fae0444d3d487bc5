"""Associative-scan (parallel-prefix) Riccati recursion: O(log N) depth.

The horizon-parallel LQ solver mandated by the north star (SURVEY.md §5.7):
instead of the sequential backward `lax.scan` in `solver/riccati.py`, the value
functions are combined with `jax.lax.associative_scan`, giving logarithmic
depth in horizon length — the MPC analogue of long-context sequence
parallelism. Technique follows the parallel LQT formulation of Särkkä &
García-Fernández (IEEE TAC 2021; see PAPERS.md "The Parallelization of Riccati
Recursion"): each interval carries a conditional-value-function element
    e = (A, b, C, J, eta)
with the associative combination
    (e_i * e_j) — see `_combine` —
and leaves built from LQR stage data after eliminating the control (and the
Qux cross term by completing the square).

Cross-term elimination: with K0 = -Quu^{-1} Qux, k0 = -Quu^{-1} qu,
    A' = A + B K0,  d' = d + B k0,
    Q' = Qxx + Qux^T K0,  q' = qx + K0^T qu  (the Schur-complement stage cost)
the reduced problem has no cross terms and the standard elements apply:
    leaf_k:  A=A', b=d', C=B Quu^{-1} B^T, J=Q', eta=-q'
    terminal leaf: A=0, b=0, C=0, J=QN, eta=-qN.
After a reversed inclusive scan, element k (combined k..N) yields
    P_k = J_k^comb,  p_k = -eta_k^comb,
and the per-node gains are recovered independently (vmapped) from
(P_{k+1}, p_{k+1}) — no sequential dependence anywhere in the backward pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wb_humanoid_mpc_tpu.solver.riccati import RiccatiSolution
from wb_humanoid_mpc_tpu.solver.transcription import LQApprox


class _Elem(NamedTuple):
    A: jnp.ndarray
    b: jnp.ndarray
    C: jnp.ndarray
    J: jnp.ndarray
    eta: jnp.ndarray


def _combine(ej, ei):
    """Combine e_i (earlier) with e_j (later): value-function composition.

    NOTE on argument order: `associative_scan(fn, elems, reverse=True)` calls
    fn(right, left)=fn(later, earlier) composing toward the front; we name the
    arguments accordingly.
    """
    Ai, bi, Ci, Ji, etai = ei
    Aj, bj, Cj, Jj, etaj = ej
    n = Ai.shape[-1]
    I = jnp.eye(n, dtype=Ai.dtype)

    # (I + C_i J_j)^{-1} via LU solve (batched-friendly)
    M1 = I + Ci @ Jj
    AjM = jnp.linalg.solve(M1.swapaxes(-1, -2), Aj.swapaxes(-1, -2)).swapaxes(-1, -2)
    # AjM = A_j (I + C_i J_j)^{-1}
    A = AjM @ Ai
    b = (AjM @ (bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
    C = AjM @ Ci @ Aj.swapaxes(-1, -2) + Cj

    M2 = I + Jj @ Ci
    AiTM = jnp.linalg.solve(M2, jnp.broadcast_to(I, M2.shape))  # (I+J_j C_i)^{-1}
    tmp = Ai.swapaxes(-1, -2) @ AiTM
    J = tmp @ Jj @ Ai + Ji
    eta = (tmp @ (etaj[..., None] - Jj @ bi[..., None]))[..., 0] + etai
    return _Elem(A, b, C, J, eta)


def stage_leaf(A, B, d, Qxx, Quu, Qux, qx, qu, reg: float) -> _Elem:
    """Scan element of one LQR stage after eliminating the control and the
    Qux cross term (complete-the-square; see module docstring). Exposed for
    the horizon-sharded solvers (`parallel/horizon.py`, `solver/sharded_sqp.py`)."""
    nu = B.shape[-1]
    eyeu = jnp.eye(nu, dtype=B.dtype)
    scale = jnp.maximum(jnp.max(jnp.diagonal(Quu)), 1.0)
    Quu_r = Quu + (reg * scale) * eyeu
    L = jnp.linalg.cholesky(0.5 * (Quu_r + Quu_r.swapaxes(-1, -2)))
    K0 = -jax.scipy.linalg.cho_solve((L, True), Qux)
    k0 = -jax.scipy.linalg.cho_solve((L, True), qu)
    BiQ = jax.scipy.linalg.cho_solve((L, True), B.swapaxes(-1, -2))
    A_p = A + B @ K0
    d_p = d + B @ k0
    C = B @ BiQ
    J = Qxx + Qux.swapaxes(-1, -2) @ K0
    q_p = qx + K0.swapaxes(-1, -2) @ qu
    return _Elem(A_p, d_p, 0.5 * (C + C.swapaxes(-1, -2)),
                 0.5 * (J + J.swapaxes(-1, -2)), -q_p)


def _leaves(lq: LQApprox, reg: float):
    N, nx, nu = lq.B.shape[0], lq.B.shape[1], lq.B.shape[2]

    stage = jax.vmap(lambda *a: stage_leaf(*a, reg))(
        lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu)
    term = _Elem(
        A=jnp.zeros((1, nx, nx), lq.A.dtype),
        b=jnp.zeros((1, nx), lq.A.dtype),
        C=jnp.zeros((1, nx, nx), lq.A.dtype),
        J=lq.QN[None],
        eta=-lq.qN[None],
    )
    return jax.tree.map(lambda s, t: jnp.concatenate([s, t], axis=0), stage, term)


def parallel_backward_pass(lq: LQApprox, reg: float = 1e-8) -> RiccatiSolution:
    elems = _leaves(lq, reg)
    comb = jax.lax.associative_scan(_combine, elems, reverse=True, axis=0)
    P = 0.5 * (comb.J + comb.J.swapaxes(-1, -2))   # [N+1, nx, nx]
    p = -comb.eta                                   # [N+1, nx]

    nu = lq.B.shape[-1]
    eyeu = jnp.eye(nu, dtype=lq.B.dtype)

    def gains(A, B, d, Qxx, Quu, Qux, qx, qu, P_next, p_next):
        Quu_h = Quu + B.T @ P_next @ B
        scale = jnp.maximum(jnp.max(jnp.diagonal(Quu_h)), 1.0)
        Quu_h = Quu_h + (reg * scale) * eyeu
        Qux_h = Qux + B.T @ P_next @ A
        Qu = qu + B.T @ (P_next @ d + p_next)
        L = jnp.linalg.cholesky(0.5 * (Quu_h + Quu_h.T))
        K = -jax.scipy.linalg.cho_solve((L, True), Qux_h)
        kff = -jax.scipy.linalg.cho_solve((L, True), Qu)
        return K, kff

    K, k = jax.vmap(gains)(lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux,
                           lq.qx, lq.qu, P[1:], p[1:])
    return RiccatiSolution(K=K, k=k, P=P, p=p)


def parallel_forward_pass(lq: LQApprox, sol: RiccatiSolution, dx0):
    """Closed-loop linear rollout as an associative affine scan (O(log N))."""
    F = lq.A + jnp.einsum("kij,kjl->kil", lq.B, sol.K)
    f = lq.d + jnp.einsum("kij,kj->ki", lq.B, sol.k)

    def comb(a, b):
        # affine composition: (F_b, f_b) after (F_a, f_a)
        Fa, fa = a
        Fb, fb = b
        return Fb @ Fa, (Fb @ fa[..., None])[..., 0] + fb

    Fs, fs = jax.lax.associative_scan(comb, (F, f), axis=0)
    dxs_tail = jnp.einsum("kij,j->ki", Fs, dx0) + fs
    dxs = jnp.concatenate([dx0[None], dxs_tail], axis=0)
    dus = jnp.einsum("kij,kj->ki", sol.K, dxs[:-1]) + sol.k
    return dxs, dus
