"""Count compiled-HLO kernels for the hot WB solve stages (TPU backend)."""
import os, sys, collections, re
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
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory, make_lq_functions, rk4_step

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

def stats(name, fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    txt = comp.as_text()
    ops = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = \S+ ([a-z0-9_-]+)\(", line)
        if m:
            ops[m.group(1)] += 1
    total = sum(ops.values())
    fus = ops.get("fusion", 0)
    print(f"{name:22s} total HLO ops {total:6d}  fusions {fus:5d}  "
          f"top: {ops.most_common(8)}")

stats("flow x28", jax.vmap(lambda x, u: model.flow_map(0.0, x, u)),
      traj.xs[:-1], traj.us)
stats("rk4 x28", jax.vmap(lambda x, u: rk4_step(model.flow_map, 0.0, x, u, scfg.dt)),
      traj.xs[:-1], traj.us)
stats("lq_approx", lambda tr: lq_approx(tr, times, params, lam, 1.0), traj)
stats("phi_theta(10 alphas)",
      lambda tr: jax.vmap(lambda a: (
          total_cost(Trajectory(tr.xs * a, tr.us * a), times, params, lam, 0.0),
          defects_fn(Trajectory(tr.xs * a, tr.us * a), times),
          eq_fn(Trajectory(tr.xs * a, tr.us * a), times, params)))(jnp.asarray(scfg.alphas)),
      traj)
solve = make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg)
stats("FULL solve", solve, 0.0, x0, traj, params, lam)
