"""Per-iteration SQP diagnostics on the WB stance problem."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tests.g1_fixtures import wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory, make_lq_functions
from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass
from wb_humanoid_mpc_tpu.models import kinematics as kin

N = 10
mode = sys.argv[1] if len(sys.argv) > 1 else "exact"
cfg, robot, model = wb_setup()
ocp = WholeBodyOcp(model=model, cfg=cfg)
x0 = jnp.asarray(cfg.initial_state, dtype=jnp.float64)
q0 = model.layout.generalized_coordinates(x0)
fk = kin.forward_kinematics(model.robot, q0)
foot_z = float(kin.frame_transform(model.robot, fk, model.contact_frames[0])[1][2])
swing = SwingReference(
    contact_flags=np.ones((N + 1, 2)), z_pos=np.full((N + 1, 2), foot_z),
    z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
    proximity=np.ones((N + 1, 2)))
params = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2), model.layout.input_dim)
traj = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
lam = jnp.zeros((N, ocp.n_eq))

scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1, reg=1e-6, sensitivity=mode)
bp = ocp.barrier_params()
lq_approx, total_cost, defects_fn, eq_fn, *_cv = make_lq_functions(
    ocp, model.flow_map, scfg.dt, N, bp, sensitivity=mode)

times = 0.0 + scfg.dt * jnp.arange(N + 1)
rho_lq = min(scfg.rho, 1.0)


@jax.jit
def one_step(traj, lam):
    lq = lq_approx(traj, times, params, lam, rho_lq)
    dx0 = x0 - traj.xs[0]
    reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, scfg.proj_eps)
    sol = backward_pass(reduced, scfg.reg)
    dxs, dzs = forward_pass(reduced, sol, dx0)
    dus = recover_controls(proj, dxs, dzs)
    # linearized equality residual at full step
    g_lin = (lq.g_res + jnp.einsum("kij,kj->ki", lq.Cx, dxs[:-1])
             + jnp.einsum("kij,kj->ki", lq.Du, dus))
    return lq, dxs, dus, g_lin


@jax.jit
def merit_of(traj, lam):
    c, gmax = total_cost(traj, times, params, lam, scfg.rho)
    d = defects_fn(traj, times)
    return c + scfg.defect_weight * jnp.sum(jnp.abs(d)), gmax, jnp.max(jnp.abs(d))


fc = cfg.model_settings.foot_constraint
print("foot_constraint gains:", fc, flush=True)
g_init = np.array(eq_fn(traj, times, params))
print(f"g(init) per-row max over nodes: {np.abs(g_init).max(axis=0)}", flush=True)

t0 = time.time()
for it in range(8):
    lq, dxs, dus, g_lin = one_step(traj, lam)
    m0, g0, d0 = merit_of(traj, lam)
    row = f"it{it}: cost={float(lq.cost):9.3f} g={float(lq.g_norm):.3e} d={float(lq.defect_norm):.3e} |g_lin|={float(jnp.max(jnp.abs(g_lin))):.2e} |dx|={float(jnp.max(jnp.abs(dxs))):.2e} |du|={float(jnp.max(jnp.abs(dus))):.2e}"
    # line search trace
    best = None
    for a in (1.0, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05, 0.01):
        cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
        m, g, d = merit_of(cand, lam)
        row += f"\n    a={a:4}: merit={float(m):12.4f} (m0={float(m0):12.4f}) g={float(g):.3e} d={float(d):.3e}"
        if best is None and np.isfinite(float(m)) and float(m) < float(m0):
            best = a
    a = best if best is not None else 0.0
    print(row + f"\n  -> alpha={a}", flush=True)
    if a:
        traj = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
print(f"total {time.time()-t0:.1f}s")
