"""Pallas TPU kernel: the WHOLE LQ solve (backward Riccati + forward
rollout) in ONE kernel launch.

`solver/riccati.py::backward_pass` is a `lax.scan` whose per-step body
contains a Cholesky factorization — XLA lowers it to ~N sequential groups of
tiny kernels, and at N=28 the phase costs ~0.9 ms of pure launch overhead
for ~μs of MXU work (PERF_r04.md §1: the solve is kernel-depth bound). This
kernel keeps all stage data VMEM-resident (~1.5 MB for the N=28 whole-body
problem) and runs the full backward recursion AND the forward rollout inside
one launch, eliminating the inter-phase HBM round-trip as well.

The per-step Quu_h factorization is replaced by a masked Gauss–Jordan
inverse: `nu` iterations of full-matrix rank-1 updates built from
`broadcasted_iota` masks — no dynamic slicing on tiled axes, every shape
static, numerically safe without pivoting because Quu_h is symmetric
positive definite after the relative Levenberg regularization (same rule as
`backward_pass`). Same role as HPIPM's block-banded Riccati factorization in
the reference's QP backend (SURVEY.md §2.4, `ocs2_sqp` multiple-shooting
solver; `task.info` sqp settings).

Dispatch: `riccati_rollout(lq, dx0, reg, backend="auto")` uses this kernel
on TPU and the `lax.scan` reference pair (`backward_pass` + `forward_pass`)
elsewhere; "interpret" runs the kernel in interpret mode for CPU equivalence
tests.

Layout rules (see `ops/rollout.py`): vector quantities ride as [·, 1, n] so
every dynamic index lands on the leading (untiled) axis; all in-kernel
matmuls request `precision=HIGHEST` because the global matmul-precision
setting does not reach inside a Pallas kernel and single-pass bf16 compounds
over the 28-step recursion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gj_inverse(M, mm, dt):
    """Inverse of a symmetric positive-definite [n, n] matrix by
    Gauss–Jordan elimination without pivoting (SPD => stable), expressed as
    n rank-1 updates with iota masks — Mosaic-friendly: no gathers, no
    dynamic slices, all shapes static."""
    n = M.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(dt)

    def body(j, carry):
        Ac, Inv = carry
        ej = (rows == j).astype(dt)          # [n, 1] pivot selector
        col = mm(Ac, ej)                     # [n, 1] column j of Ac
        piv = jnp.sum(col * ej)              # Ac[j, j]
        rowA = mm(ej.T, Ac) / piv            # [1, n] scaled pivot row
        rowI = mm(ej.T, Inv) / piv
        cm = col - ej                        # rank-1 update: rows i != j get
        Ac = Ac - mm(cm, rowA)               #   -Ac[i,j] * rowA; row j
        Inv = Inv - mm(cm, rowI)             #   becomes the scaled pivot row
        return Ac, Inv

    _, Inv = jax.lax.fori_loop(0, n, body, (M, eye))
    return Inv


def _riccati_kernel(A_ref, B_ref, d_ref, Qxx_ref, Quu_ref, Qux_ref,
                    qx_ref, qu_ref, QN_ref, qN_ref, dx0_ref,
                    K_ref, k_ref, dxs_ref, dus_ref, *, reg):
    N = A_ref.shape[0]
    nu = B_ref.shape[-1]
    dt = A_ref.dtype
    mm = functools.partial(jnp.dot, preferred_element_type=dt,
                           precision=jax.lax.Precision.HIGHEST)
    eyeu = (jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 1)).astype(dt)

    # ---- backward Riccati recursion (carry: P [nx,nx], p [1,nx]) ----
    def bwd(t, carry):
        P, p = carry
        i = N - 1 - t
        A = A_ref[i]
        B = B_ref[i]
        d = d_ref[i]                          # [1, nx]
        Qxx = Qxx_ref[i]
        Quu = Quu_ref[i]
        Qux = Qux_ref[i]
        qx = qx_ref[i]                        # [1, nx]
        qu = qu_ref[i]                        # [1, nu]

        Pd_p = mm(d, P.T) + p                 # (P d + p)^T as a row
        Qx = qx + mm(Pd_p, A)                 # (A^T (P d + p))^T
        Qu = qu + mm(Pd_p, B)
        PA = mm(P, A)
        PB = mm(P, B)
        Qxx_h = Qxx + mm(A.T, PA)
        Quu_h = Quu + mm(B.T, PB)
        # relative Levenberg regularization (same rule as backward_pass):
        # keeps the factorization PD in float32 across Quu magnitude spans
        scale = jnp.maximum(jnp.max(Quu_h * eyeu), 1.0)
        Quu_h = Quu_h + (reg * scale) * eyeu
        Qux_h = Qux + mm(B.T, PA)

        Quu_h = 0.5 * (Quu_h + Quu_h.T)
        Inv = _gj_inverse(Quu_h, mm, dt)
        K = -mm(Inv, Qux_h)                   # [nu, nx]
        kf = -mm(Qu, Inv.T)                   # (-Inv Qu)^T as a row [1, nu]

        P_new = Qxx_h + mm(Qux_h.T, K)
        P_new = 0.5 * (P_new + P_new.T)
        p_new = Qx + mm(kf, Qux_h)            # (Qux_h^T kf)^T as a row
        K_ref[i] = K
        k_ref[i] = kf
        return P_new, p_new

    jax.lax.fori_loop(0, N, bwd, (QN_ref[:], qN_ref[:]))

    # ---- forward rollout of the closed loop (reads K/k back from VMEM) ----
    def fwd(i, dx):                           # dx: [1, nx]
        du = mm(dx, K_ref[i].T) + k_ref[i]
        dx_next = mm(dx, A_ref[i].T) + mm(du, B_ref[i].T) + d_ref[i]
        dxs_ref[i] = dx
        dus_ref[i] = du
        return dx_next

    dxs_ref[N] = jax.lax.fori_loop(0, N, fwd, dx0_ref[:])


@functools.partial(jax.jit, static_argnames=("reg", "interpret"))
def pallas_riccati_rollout(A, B, d, Qxx, Quu, Qux, qx, qu, QN, qN, dx0,
                           reg: float = 1e-8, interpret: bool = False):
    """(K [N,nu,nx], k [N,nu], dxs [N+1,nx], dus [N,nu]) in one launch."""
    N, nx = A.shape[0], A.shape[-1]
    nu = B.shape[-1]
    dt = A.dtype
    K, k3, dxs3, dus3 = pl.pallas_call(
        functools.partial(_riccati_kernel, reg=reg),
        out_shape=[
            jax.ShapeDtypeStruct((N, nu, nx), dt),
            jax.ShapeDtypeStruct((N, 1, nu), dt),
            jax.ShapeDtypeStruct((N + 1, 1, nx), dt),
            jax.ShapeDtypeStruct((N, 1, nu), dt),
        ],
        interpret=interpret,
    )(A, B, d[:, None, :], Qxx, Quu, Qux, qx[:, None, :], qu[:, None, :],
      QN, qN[None].astype(dt), dx0[None].astype(dt))
    return K, k3[:, 0, :], dxs3[:, 0, :], dus3[:, 0, :]


def riccati_rollout(lq, dx0, reg: float = 1e-8, backend: str = "auto"):
    """Fused drop-in for `backward_pass(lq, reg)` + `forward_pass`:
    returns (dxs [N+1,nx], dus [N,nu]).

    backend: "scan" (XLA reference pair), "pallas" (TPU kernel),
    "interpret" (Pallas interpret mode — tests), "auto" (pallas on TPU,
    scan elsewhere — the driver's CPU-mesh dryrun keeps the scan path).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "scan":
        from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass

        sol = backward_pass(lq, reg)
        return forward_pass(lq, sol, dx0)
    _, _, dxs, dus = pallas_riccati_rollout(
        lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu,
        lq.QN, lq.qN, dx0, reg=reg, interpret=(backend == "interpret"))
    return dxs, dus
