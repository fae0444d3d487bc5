"""Probe: localize the sharded-vs-fused SQP divergence phase by phase (f64)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tests.test_sharded_sqp import _walking_problem
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig
from wb_humanoid_mpc_tpu.solver.transcription import make_lq_functions, Trajectory
from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass
from wb_humanoid_mpc_tpu.parallel.horizon import horizon_sharded_lq_solve

N, B = 28, 4
cfg, model, ocp, x0s, init, params, lam = _walking_problem(N, B)
scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1, sensitivity="node")

lq_approx, total_cost, defects_fn, eq_fn, cost_violation, _cp = make_lq_functions(
    ocp, model.flow_map, scfg.dt, N, ocp.barrier_params(), sensitivity="node")
times = scfg.dt * jnp.arange(N + 1)

# single instance b=0
b = 0
traj0 = Trajectory(xs=init.xs[b], us=init.us[b])
params0 = jax.tree.map(lambda a: a[b], params)
lam0 = lam[b]
lq = lq_approx(traj0, times, params0, lam0, 1.0)
reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, scfg.proj_eps)
dx0 = x0s[b] - traj0.xs[0]

from wb_humanoid_mpc_tpu.solver.riccati import levenberg_damp
damped = levenberg_damp(reduced, scfg.reg)

sol = backward_pass(damped, scfg.reg_num)
dxs_ref, dzs_ref = forward_pass(damped, sol, dx0)
dus_ref = recover_controls(proj, dxs_ref, dzs_ref)

mesh_h = Mesh(np.array(jax.devices()[:4]), ("h",))
dxs_sh, dzs_sh = jax.jit(
    lambda lq_, dx0_: horizon_sharded_lq_solve(lq_, dx0_, mesh_h, "h", scfg.reg_num)
)(damped, dx0)
dus_sh = recover_controls(proj, dxs_sh, dzs_sh)

print("LQ-level predamped (walking, reg=%.0e, reg_num=%.0e):" % (scfg.reg, scfg.reg_num))
print("  max|dxs diff| =", float(np.max(np.abs(np.asarray(dxs_sh) - np.asarray(dxs_ref)))))
print("  max|dus diff| =", float(np.max(np.abs(np.asarray(dus_sh) - np.asarray(dus_ref)))))
print("  max|dxs_ref| =", float(np.max(np.abs(np.asarray(dxs_ref)))))

# full sharded SQP vs vmapped fused solver (2 iterations)
from wb_humanoid_mpc_tpu.solver.sharded_sqp import make_sharded_sqp_solver
from wb_humanoid_mpc_tpu.solver.sqp import make_sqp_solver
scfg2 = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=2, sensitivity="node")
solve_ref = jax.jit(jax.vmap(
    make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg2),
    in_axes=(None, 0, 0, 0, 0)))
sol_ref = jax.block_until_ready(solve_ref(0.0, x0s, init, params, lam))
mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "h"))
solve_sh = make_sharded_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg2, mesh2)
sol_sh = jax.block_until_ready(solve_sh(0.0, x0s, init, params, lam))
print("full SQP sharded-vs-vmapped:")
print("  max|xs diff| =", float(np.max(np.abs(np.asarray(sol_sh.traj.xs) - np.asarray(sol_ref.traj.xs)))))
print("  alphas ref", np.asarray(sol_ref.step_size), "sh", np.asarray(sol_sh.step_size))
print("  g_norm ref", np.asarray(sol_ref.g_norm), "sh", np.asarray(sol_sh.g_norm))
