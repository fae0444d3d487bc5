"""Pallas TPU kernel: LQ forward rollout in ONE kernel launch.

The solver's forward pass (`solver/riccati.py::forward_pass`) rolls the
linear closed loop dx_{k+1} = A_k dx_k + B_k (K_k dx_k + k_k) + d_k over the
horizon. As a `lax.scan` of [58x58] matvecs it lowers to ~N tiny kernels
whose cost is pure launch overhead — the solve is kernel-depth bound, not
FLOP bound (PERF_r04.md §4). This kernel keeps all stage data VMEM-resident
(N=28 whole-body stage data is ~0.8 MB) and runs the whole recursion inside
one kernel: a `fori_loop` of MXU matvecs with zero intermediate HBM traffic.

Replaces the QP forward-substitution half of the reference's HPIPM backend
(SURVEY.md §2.4, `ocs2_sqp` -> HPIPM/BLASFEO); the backward Riccati stays in
XLA (it needs per-step Cholesky factorizations).

Dispatch: `forward_rollout(..., backend="auto")` uses the Pallas kernel on
TPU and the `lax.scan` reference path elsewhere (CPU tests run the kernel in
interpret mode to pin down equivalence).

Vector carries are kept [1, n] (2-D) and per-node vectors are stored as
[N, 1, n] so every dynamic index lands on the leading (untiled) axis — the
last two axes stay static for Mosaic's (8, 128) tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _rollout_kernel(A_ref, B_ref, d_ref, K_ref, k_ref, dx0_ref,
                    dxs_ref, dus_ref):
    N = A_ref.shape[0]

    # full-f32 MXU passes: the global `jax_default_matmul_precision=highest`
    # does not reach inside a Pallas kernel, and single-pass bf16 multiplies
    # compound to ~1e-2 relative error over a 28-step recursion
    mm = functools.partial(jnp.dot, preferred_element_type=A_ref.dtype,
                           precision=jax.lax.Precision.HIGHEST)

    def body(i, dx):                      # dx: [1, nx]
        A = A_ref[i]                      # [nx, nx]
        B = B_ref[i]                      # [nx, nu]
        K = K_ref[i]                      # [nu, nx]
        d = d_ref[i]                      # [1, nx]
        kf = k_ref[i]                     # [1, nu]
        du = mm(dx, K.T) + kf
        dx_next = mm(dx, A.T) + mm(du, B.T) + d
        dxs_ref[i] = dx
        dus_ref[i] = du
        return dx_next

    dx_last = jax.lax.fori_loop(0, N, body, dx0_ref[:])
    dxs_ref[N] = dx_last


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_forward_rollout(A, B, d, K, k, dx0, interpret: bool = False):
    """(dxs [N+1,nx], dus [N,nu]) from one Pallas kernel launch."""
    N, nx = A.shape[0], A.shape[-1]
    nu = B.shape[-1]
    dt = A.dtype
    dxs3, dus3 = pl.pallas_call(
        _rollout_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, 1, nx), dt),
            jax.ShapeDtypeStruct((N, 1, nu), dt),
        ],
        interpret=interpret,
    )(A, B, d[:, None, :], K, k[:, None, :], dx0[None].astype(dt))
    return dxs3[:, 0, :], dus3[:, 0, :]


def forward_rollout(lq, sol, dx0, backend: str = "auto"):
    """Drop-in for `solver/riccati.py::forward_pass` with backend dispatch.

    backend: "scan" (XLA lax.scan reference), "pallas" (TPU kernel),
    "interpret" (Pallas interpret mode, any backend — for tests),
    "auto" (pallas on TPU, scan elsewhere).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "scan":
        from wb_humanoid_mpc_tpu.solver.riccati import forward_pass

        return forward_pass(lq, sol, dx0)
    dxs, dus = pallas_forward_rollout(
        lq.A, lq.B, lq.d, sol.K, sol.k, dx0,
        interpret=(backend == "interpret"))
    return dxs, dus
