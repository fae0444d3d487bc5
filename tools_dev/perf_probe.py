"""TPU perf probe: tunnel dispatch floor + bench-problem per-phase breakdown.

Runs on the tunneled axon TPU (default backend). Produces the numbers for
PERF_r04.md: trivial-op round-trip (the latency floor any single solve pays),
fused solve p50, staged per-phase device times.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

# ---- 1. dispatch floor ----
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros(8)
jax.block_until_ready(f(x))
lat = []
for _ in range(30):
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    lat.append(time.perf_counter() - t0)
print(f"trivial-op roundtrip: p50 {np.percentile(lat,50)*1e3:.2f} ms, "
      f"min {min(lat)*1e3:.2f} ms")

# sustained pipelined dispatch of trivial op
t0 = time.perf_counter()
y = x
for _ in range(100):
    y = f(y)
jax.block_until_ready(y)
print(f"trivial-op sustained: {100/(time.perf_counter()-t0):.0f}/s")

# ---- 2. bench problem ----
from __graft_entry__ import _wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import (SqpSolverConfig, make_sqp_solver,
                                            make_staged_sqp_solver)
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory

cfg, model = _wb_setup()
ocp = WholeBodyOcp(model=model, cfg=cfg)
N = 28
par = "--parallel" in sys.argv
solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1,
                             parallel_riccati=par)
solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg))

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

t0 = time.perf_counter()
sol = jax.block_until_ready(solve(0.0, x0, traj, params, lam))
print(f"fused solve compile+first: {time.perf_counter()-t0:.1f} s "
      f"(parallel_riccati={par})")
traj1, lam1 = sol.traj, sol.lam

lat = []
for _ in range(20):
    t1 = time.perf_counter()
    sol = jax.block_until_ready(solve(0.0, x0, traj1, params, lam1))
    lat.append(time.perf_counter() - t1)
print(f"fused solve p50: {np.percentile(lat,50)*1e3:.2f} ms, min {min(lat)*1e3:.2f} ms")

# sustained
t0 = time.perf_counter()
tr, lm = traj1, lam1
for _ in range(50):
    sol = solve(0.0, x0, tr, params, lm)
    tr, lm = sol.traj, sol.lam
jax.block_until_ready(sol)
print(f"fused solve sustained: {50/(time.perf_counter()-t0):.1f}/s")

# ---- 3. staged per-phase ----
staged = make_staged_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), solver_cfg)
sol2, tms = staged(0.0, x0, traj1, params, lam1)   # compile
phases = {"lq": [], "projection": [], "riccati": [], "linesearch": []}
for _ in range(15):
    sol2, tms = staged(0.0, x0, traj1, params, lam1)
    for k in phases:
        phases[k].append(getattr(tms, k))
for k, v in phases.items():
    print(f"staged {k}: p50 {np.percentile(v,50)*1e3:.2f} ms, min {min(v)*1e3:.2f} ms")
