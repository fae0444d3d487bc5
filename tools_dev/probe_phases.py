"""TPU timing of the REAL solve components, individually jitted."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig
from wb_humanoid_mpc_tpu.solver.transcription import (Trajectory,
                                                      make_lq_functions,
                                                      rk4_step)
from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls
from wb_humanoid_mpc_tpu.solver.riccati import (backward_pass, forward_pass,
                                                levenberg_damp)

def bench(f, *args, n=15, label=""):
    out = jax.block_until_ready(f(*args))
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        lat.append(time.perf_counter() - t0)
    print(f"{label}: p50 {np.percentile(lat,50)*1e3:.2f} ms  min {min(lat)*1e3:.2f} ms")
    return out

cfg, model = _wb_setup()
ocp = WholeBodyOcp(model=model, cfg=cfg)
N = 28
scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1)
lq_approx, total_cost, defects_fn, eq_fn, cost_violation, _cp = make_lq_functions(
    ocp, model.flow_map, scfg.dt, N, ocp.barrier_params(), sensitivity="node")

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
times = scfg.dt * jnp.arange(N + 1)

lq = bench(jax.jit(lambda *a: lq_approx(*a)), traj, times, params, lam, 1.0,
           label="LQ approximation (29-node fused linearization)")

f_proj = jax.jit(lambda lq: project_lq(lq, lq.Cx, lq.Du, lq.g_res, scfg.proj_eps))
reduced, proj = bench(f_proj, lq, label="projection (QR + pinv, 28 nodes)")

f_damp_ric = jax.jit(lambda red: backward_pass(levenberg_damp(red, scfg.reg),
                                               scfg.reg_num))
sol = bench(f_damp_ric, reduced, label="backward Riccati (seq scan, real data)")

f_fwd = jax.jit(lambda red, sol: forward_pass(red, sol, jnp.zeros_like(x0)))
bench(f_fwd, reduced, sol, label="forward pass")

# one plain node_terms sweep (cost_violation = 8x of these in the line search)
f_cv = jax.jit(lambda tr: cost_violation(tr, times, params))
bench(f_cv, traj, label="cost+violation sweep (29 node_terms evals)")

f_def = jax.jit(lambda tr: defects_fn(tr, times))
bench(f_def, traj, label="defects (29 RK4 rollouts)")

# the full 8-alpha line search body
alphas = jnp.asarray(scfg.alphas)
def ls(tr, dxs, dus):
    def try_alpha(a):
        cand = Trajectory(xs=tr.xs + a * dxs, us=tr.us + a * dus)
        c, g_sse, _ = cost_violation(cand, times, params)
        d = defects_fn(cand, times)
        return c, jnp.sqrt(g_sse + jnp.sum(d**2))
    return jax.vmap(try_alpha)(alphas)
bench(jax.jit(ls), traj, jnp.zeros_like(traj.xs), jnp.zeros_like(traj.us),
      label="line search (8 alphas x 29 nodes)")
