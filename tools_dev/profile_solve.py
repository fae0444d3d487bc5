"""Stage-by-stage timing of the WB SQP solve on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from __graft_entry__ import _wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory, make_lq_functions
from wb_humanoid_mpc_tpu.solver.projection import project_lq
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass

print("devices:", jax.devices())
cfg, model = _wb_setup()
ocp = WholeBodyOcp(model=model, cfg=cfg)
N = 28
scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1, reg=1e-4)

lq_approx, total_cost, defects_fn, eq_fn, *_cv = make_lq_functions(
    ocp, model.flow_map, scfg.dt, N, ocp.barrier_params())

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
times = 0.0 + scfg.dt * jnp.arange(N + 1)

f_lq = jax.jit(lambda tr: lq_approx(tr, times, params, lam, 1.0))
f_proj = jax.jit(lambda lq: project_lq(lq, lq.Cx, lq.Du, lq.g_res, scfg.proj_eps))
f_ric = jax.jit(lambda red: backward_pass(red, scfg.reg))
f_fwd = jax.jit(lambda red, sol: forward_pass(red, sol, jnp.zeros_like(x0)))

def phi_theta_all(tr, dxs, dus):
    alphas = jnp.asarray(scfg.alphas)
    def one(a):
        cand = Trajectory(xs=tr.xs + a * dxs, us=tr.us + a * dus)
        c, _ = total_cost(cand, times, params, lam, 0.0)
        d = defects_fn(cand, times)
        g = eq_fn(cand, times, params)
        return c, jnp.sqrt(jnp.sum(d**2) + jnp.sum(g**2))
    return jax.vmap(one)(alphas)
f_merit = jax.jit(phi_theta_all)

solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg))

def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50)) * 1e3
    print(f"{name:28s} p50 {p50:8.2f} ms")
    return out

lq = timeit("lq_approx (N=28)", f_lq, traj)
red, proj = timeit("project_lq", f_proj, lq)
sol = timeit("riccati backward", f_ric, red)
dxdz = timeit("riccati forward", f_fwd, red, sol)
timeit("linesearch phi/theta (10)", f_merit, traj, jnp.zeros_like(traj.xs), jnp.zeros_like(traj.us))
timeit("FULL solve (1 SQP iter)", solve, 0.0, x0, traj, params, lam)
f_triv = jax.jit(lambda x: x + 1.0)
timeit("trivial jit dispatch", f_triv, x0)
