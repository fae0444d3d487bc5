"""Horizon-block distributed Riccati: shard the MPC horizon across devices.

The mandated TPU-native analogue of long-context sequence parallelism
(SURVEY.md §5.7 / §2.5 item 5): the backward Riccati recursion and the
forward closed-loop rollout are associative scans (`solver/priccati.py`,
after Särkkä & García-Fernández's parallel LQT formulation), so they
parallelize across devices as a classic two-level prefix scan:

  1. each device owns a contiguous block of horizon elements and runs the
     LOCAL associative scan on-chip (O(log K) depth for block size K);
  2. the per-block summary elements (the combination of a whole block) are
     `all_gather`ed over the ICI ring — P elements of [nx, nx] matrices, the
     Schur-complement coupling data between blocks;
  3. every device redundantly combines the P summaries into its block's
     suffix (backward pass) / prefix (forward pass) element — O(log P),
     tiny — and applies it to its local scan results.

Total: O(log N) depth, one all_gather of O(P nx^2) per pass — the
cross-block reduction rides ICI, never the host.

`block_backward_gains` / `block_forward_rollout` are the in-shard_map
building blocks (also used by the full 2-D batchxhorizon sharded SQP,
`solver/sharded_sqp.py`); `horizon_sharded_lq_solve` wraps them for a single
LQ problem. Results match the sequential `solver/riccati.py` passes to float
tolerance (tests/test_horizon_sharded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from wb_humanoid_mpc_tpu.solver.priccati import _combine, _Elem, _leaves
from wb_humanoid_mpc_tpu.solver.transcription import LQApprox


def _identity_elem(n: int, k: int, dtype) -> _Elem:
    """k identity elements of the value-function composition monoid."""
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (k, n, n))
    zM = jnp.zeros((k, n, n), dtype)
    zv = jnp.zeros((k, n), dtype)
    return _Elem(A=eye, b=zv, C=zM, J=zM, eta=zv)


def _affine_identity(n: int, k: int, dtype):
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (k, n, n))
    return eye, jnp.zeros((k, n), dtype)


def _affine_combine(a, b):
    """(F_b, f_b) after (F_a, f_a) — forward-rollout composition."""
    Fa, fa = a
    Fb, fb = b
    return Fb @ Fa, (Fb @ fa[..., None])[..., 0] + fb


def block_value_functions(elems_loc: _Elem, axis: str):
    """Distributed reversed scan: local elements [K, ...] -> (P, p) [K, ...]
    plus (P_next, p_next) of element k+1 (fetched cross-block via ppermute).

    Must run inside `shard_map` over mesh axis `axis`.
    """
    nx = elems_loc.A.shape[-1]
    dtype = elems_loc.A.dtype
    n_dev = jax.lax.axis_size(axis)

    loc = jax.lax.associative_scan(_combine, elems_loc, reverse=True, axis=0)
    summary = jax.tree.map(lambda a: a[0:1], loc)                  # whole block
    sums = jax.lax.all_gather(summary, axis, axis=0, tiled=True)   # [n_dev,...]
    # T_i = combine(blocks i..P-1); suffix S_i = T_{i+1} (identity for last)
    T = jax.lax.associative_scan(_combine, sums, reverse=True, axis=0)
    T_pad = jax.tree.map(lambda a, i: jnp.concatenate([a, i], axis=0), T,
                         _identity_elem(nx, 1, dtype))
    i_dev = jax.lax.axis_index(axis)
    suffix = jax.tree.map(lambda a: a[i_dev + 1], T_pad)
    comb = jax.vmap(lambda le: _combine(suffix, le))(loc)
    P_loc = 0.5 * (comb.J + comb.J.swapaxes(-1, -2))               # [K, nx, nx]
    p_loc = -comb.eta                                              # [K, nx]

    # (P, p) of element k+1: shift by one, last row from the next block
    perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]
    P_first = jax.lax.ppermute(P_loc[0:1], axis, perm)
    p_first = jax.lax.ppermute(p_loc[0:1], axis, perm)
    P_next = jnp.concatenate([P_loc[1:], P_first], axis=0)
    p_next = jnp.concatenate([p_loc[1:], p_first], axis=0)
    return P_loc, p_loc, P_next, p_next


def block_backward_gains(elems_loc: _Elem, A, B, d, Qxx, Quu, Qux, qx, qu,
                         axis: str, reg: float):
    """Distributed backward pass inside shard_map: per-local-node feedback
    gains (K, k_ff). Stage arrays are the block's [K, ...] slices."""
    nu = B.shape[-1]
    eyeu = jnp.eye(nu, dtype=B.dtype)
    _, _, P_next, p_next = block_value_functions(elems_loc, axis)

    def gains(A_, B_, d_, Qxx_, Quu_, Qux_, qx_, qu_, Pn, pn):
        Quu_h = Quu_ + B_.T @ Pn @ B_
        scale = jnp.maximum(jnp.max(jnp.diagonal(Quu_h)), 1.0)
        Quu_h = Quu_h + (reg * scale) * eyeu
        Qux_h = Qux_ + B_.T @ Pn @ A_
        Qu = qu_ + B_.T @ (Pn @ d_ + pn)
        L = jnp.linalg.cholesky(0.5 * (Quu_h + Quu_h.T))
        Kg = -jax.scipy.linalg.cho_solve((L, True), Qux_h)
        kg = -jax.scipy.linalg.cho_solve((L, True), Qu)
        return Kg, kg

    return jax.vmap(gains)(A, B, d, Qxx, Quu, Qux, qx, qu, P_next, p_next)


def block_forward_rollout(F, f, dx0, axis: str):
    """Distributed affine prefix scan inside shard_map: local links
    (F, f) [K, nx(,nx)] + replicated dx0 -> dx at each local NODE (block-start
    aligned), i.e. dx_k for the block's global node indices."""
    nx = F.shape[-1]
    dtype = F.dtype
    i_dev = jax.lax.axis_index(axis)

    locF = jax.lax.associative_scan(_affine_combine, (F, f), axis=0)
    sumF = jax.tree.map(lambda a: a[-1:], locF)
    sumsF = jax.lax.all_gather(sumF, axis, axis=0, tiled=True)
    Tf = jax.lax.associative_scan(_affine_combine, sumsF, axis=0)
    eyeI = _affine_identity(nx, 1, dtype)
    Tf_pad = jax.tree.map(lambda i, a: jnp.concatenate([i, a], axis=0), eyeI, Tf)
    prefix = jax.tree.map(lambda a: a[i_dev], Tf_pad)   # all blocks before mine
    Fg, fg = jax.vmap(lambda le: _affine_combine(prefix, le))(locF)
    dx_next = jnp.einsum("kij,j->ki", Fg, dx0) + fg     # dx_{k+1} per local row
    prevF, prevf = prefix
    dx_first = prevF @ dx0 + prevf                      # dx at block start
    return jnp.concatenate([dx_first[None], dx_next[:-1]], axis=0), dx_next


def horizon_sharded_lq_solve(lq: LQApprox, dx0: jnp.ndarray, mesh: Mesh,
                             axis: str = "h", reg: float = 1e-8):
    """Backward + forward Riccati of one LQ problem, horizon-sharded.

    lq leaves are replicated on entry (single-controller jit arrays); the
    shard_map region re-shards them over `axis`. Returns (dxs [N+1, nx],
    dus [N, nu]) identical to `backward_pass` + `forward_pass`.
    """
    N, nx = lq.A.shape[0], lq.A.shape[1]
    n_dev = mesh.shape[axis]
    M = N + 1                      # scan elements incl. terminal
    K = -(-M // n_dev)             # block size (ceil)
    pad = K * n_dev - M
    dtype = lq.A.dtype

    elems = _leaves(lq, reg)       # [M, ...]
    if pad:
        elems = jax.tree.map(lambda a, i: jnp.concatenate([a, i], axis=0),
                             elems, _identity_elem(nx, pad, dtype))

    # stage data padded to K * n_dev rows for uniform sharding
    pad_s = K * n_dev - N

    def pad_stage(a):
        if pad_s == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((pad_s,) + a.shape[1:], a.dtype)], axis=0)

    stage = tuple(pad_stage(a) for a in
                  (lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu))
    spec_e = _Elem(A=P(axis), b=P(axis), C=P(axis), J=P(axis), eta=P(axis))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_e,) + (P(axis),) * 9 + (P(),),
        out_specs=(P(axis), P(axis)))
    def solve_block(e, A, B, d, Qxx, Quu, Qux, qx, qu, node_idx, dx0_):
        Kg, kg = block_backward_gains(e, A, B, d, Qxx, Quu, Qux, qx, qu,
                                      axis, reg)
        F = A + jnp.einsum("kij,kjl->kil", B, Kg)
        f = d + jnp.einsum("kij,kj->ki", B, kg)
        # padded stage rows must act as identity links
        valid = (node_idx < N)[:, None, None]
        F = jnp.where(valid, F, jnp.broadcast_to(jnp.eye(F.shape[-1], dtype=dtype), F.shape))
        f = jnp.where(valid[..., 0], f, jnp.zeros_like(f))
        dx_here, _ = block_forward_rollout(F, f, dx0_, axis)
        du = jnp.einsum("kij,kj->ki", Kg, dx_here) + kg
        return dx_here, du

    node_idx = jnp.arange(K * n_dev)
    dxs_blocks, dus_blocks = solve_block(elems, *stage, node_idx, dx0)
    return dxs_blocks[:M], dus_blocks[:N]
