"""Scaling-efficiency benchmark harness (BASELINE.md reporting points).

Measures batched SQP iterations/s at increasing batch sizes and across the
device mesh, producing the `1 chip / 1 host / N hosts` scaling report the
driver baseline mandates. On a single chip, batch scaling demonstrates the
MXU utilization curve; on a multi-chip mesh, the data-parallel axis is
communication-free, so scaling efficiency tracks compilation/partition
overhead only.
"""

from __future__ import annotations

import time

import numpy as np


def _wb_problem(n_nodes: int):
    import jax.numpy as jnp

    from __graft_entry__ import _wb_setup
    from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
    from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
    from wb_humanoid_mpc_tpu.refs.swing import SwingReference
    from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
    from wb_humanoid_mpc_tpu.solver.transcription import Trajectory

    cfg, model = _wb_setup()
    ocp = WholeBodyOcp(model=model, cfg=cfg)
    N = n_nodes
    solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1)
    solve = make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg)

    swing = SwingReference(
        contact_flags=np.ones((N + 1, 2)), z_pos=np.zeros((N + 1, 2)),
        z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
        proximity=np.ones((N + 1, 2)))
    x0 = jnp.asarray(cfg.initial_state, dtype=jnp.float32)
    params = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
    u0 = weight_comp_input(model.robot.total_mass, model.robot.gravity,
                           jnp.ones(2), model.layout.input_dim)
    traj = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
    lam = jnp.zeros((N, ocp.n_eq))
    return ocp, solve, x0, traj, params, lam


def batched_throughput(batch: int, n_nodes: int = 28, formulation: str = "wb",
                       n_rounds: int = 30, seed: int = 0) -> dict:
    """Instances/s and SQP iterations/s for a vmapped batch on the current
    device set (single program; XLA shards if inputs are sharded)."""
    import jax
    import jax.numpy as jnp

    ocp, solve, x0, traj, params, lam = _wb_problem(n_nodes)
    rng = np.random.default_rng(seed)
    B = batch
    x0s = jnp.tile(x0, (B, 1)) + jnp.asarray(
        rng.standard_normal((B, x0.shape[0])).astype(np.float32) * 0.005)
    trajB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), traj)
    paramsB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), params)
    lamB = jnp.broadcast_to(lam, (B,) + lam.shape)

    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0, 0)))
    sol = jax.block_until_ready(vsolve(0.0, x0s, trajB, paramsB, lamB))
    trajB, lamB = sol.traj, sol.lam

    # warm-started rounds dispatched back-to-back, one block at the end —
    # the production MRT pipelining mode (per-round blocking would charge
    # every round the tunnel's ~24 ms blocking-dispatch artifact, see
    # PERF_r04.md §3)
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        sol = vsolve(0.0, x0s, trajB, paramsB, lamB)
        trajB, lamB = sol.traj, sol.lam
    jax.block_until_ready(sol)
    dt = (time.perf_counter() - t0) / n_rounds

    return {
        "batch": B,
        "n_nodes": n_nodes,
        "round_time_s": dt,
        "instances_per_s": B / dt,
        "sqp_iterations_per_s": B / dt,  # 1 iteration per solve
        "devices": len(jax.devices()),
        "finite": bool(np.isfinite(np.asarray(sol.cost)).all()),
    }


def scaling_report(batches=(1, 8, 64, 256, 1024), n_nodes: int = 28) -> list[dict]:
    """Batch sweep; points that exceed device memory are recorded as such
    instead of aborting the report (the v5e's 16 GB HBM caps the vmapped
    whole-body LQ around batch ~48 at N=28 without rematerialization)."""
    out = []
    for b in batches:
        try:
            out.append(batched_throughput(b, n_nodes))
        except Exception as e:  # noqa: BLE001 — record OOM/compile failures
            out.append({"batch": b, "n_nodes": n_nodes,
                        "error": str(e).splitlines()[0][:200]})
            break
    return out
