"""Batched + multi-chip sharded MPC solves.

The scaling layer mandated by BASELINE.md: thousands of MPC scenario
instances (gait/command/state variations) solved as one XLA program.

- `make_batched_solver`: `vmap` of the SQP solve over a leading batch axis —
  every per-node [35x35] factorization becomes a [B*N, 35, 35] batched GEMM
  stream on the MXU.
- `shard_batched_solver`: lays the batch across a `jax.sharding.Mesh` data-
  parallel axis. The solve is embarrassingly parallel over instances, so XLA
  inserts no collectives on the hot path; cross-chip reductions only appear in
  the caller's diagnostics (e.g. mean cost via `psum`).

This replaces the reference's single-CPU 4-thread parallelism (SURVEY.md §2.5)
with the TPU-native batch axis; horizon-block (temporal) parallelism is
provided separately by the associative-scan Riccati (`solver/priccati.py`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver


def make_batched_solver(ocp, flow, bp, cfg: SqpSolverConfig):
    """solve_batched(t0, x0[B], init_traj[B,...], params[B,...], lam[B,...])."""
    solve = make_sqp_solver(ocp, flow, bp, cfg)
    return jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0, 0)))


def shard_batched_solver(ocp, flow, bp, cfg: SqpSolverConfig, mesh: Mesh,
                         axis: str = "dp"):
    """Data-parallel sharded batched solve over `mesh` along `axis`.

    Returns (solve_fn, shard_fn) where shard_fn places a batched pytree with
    leading batch axis onto the mesh.
    """
    solve = make_sqp_solver(ocp, flow, bp, cfg)
    vsolve = jax.vmap(solve, in_axes=(None, 0, 0, 0, 0))

    batch_sharding = NamedSharding(mesh, P(axis))

    def shard_fn(tree):
        def put(x):
            spec = P(axis, *([None] * (np.ndim(x) - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.tree.map(put, tree)

    jitted = jax.jit(vsolve)
    return jitted, shard_fn
