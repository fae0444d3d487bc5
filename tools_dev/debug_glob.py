"""Globalization experiments on the WB stance problem:
  argmin line search, damped feasibility (beta), second-order correction.
Usage: python debug_glob.py [beta] [soc0|soc1] [niter]
"""
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

beta = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
soc = (sys.argv[2] == "soc1") if len(sys.argv) > 2 else False
niter = int(sys.argv[3]) if len(sys.argv) > 3 else 6

N = 10
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

scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1, reg=1e-6)
bp = ocp.barrier_params()
lq_approx, total_cost, defects_fn, eq_fn, *_cv = make_lq_functions(
    ocp, model.flow_map, scfg.dt, N, bp, sensitivity="exact")

times = 0.0 + scfg.dt * jnp.arange(N + 1)
rho_lq = min(scfg.rho, 1.0)
ALPHAS = jnp.asarray((1.0, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05, 0.01))


@jax.jit
def one_step(traj, lam):
    lq = lq_approx(traj, times, params, lam, rho_lq)
    dx0 = x0 - traj.xs[0]
    reduced, proj = project_lq(lq, lq.Cx, lq.Du, beta * lq.g_res, scfg.proj_eps)
    sol = backward_pass(reduced, scfg.reg)
    dxs, dzs = forward_pass(reduced, sol, dx0)
    dus = recover_controls(proj, dxs, dzs)

    def merit_of(tr):
        c, gmax = total_cost(tr, times, params, lam, scfg.rho)
        d = defects_fn(tr, times)
        return c + scfg.defect_weight * jnp.sum(jnp.abs(d)), gmax, jnp.max(jnp.abs(d))

    m0, g0, d0 = merit_of(traj)

    def try_alpha(a):
        cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
        m, g, d = merit_of(cand)
        return m, g, d

    merits, gs, ds = jax.vmap(try_alpha)(ALPHAS)
    merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
    best = jnp.argmin(merits)
    alpha = jnp.where(merits[best] < m0, ALPHAS[best], 0.0)
    new = Trajectory(xs=traj.xs + alpha * dxs, us=traj.us + alpha * dus)

    if soc:
        # second-order correction on the accepted trial: re-linearized rhs is
        # just the nonlinear residual at the trial; reuse gains via a second
        # projected forward pass with the trial residual.
        stage_params = jax.tree.map(lambda a: a[:-1], params)
        g_trial = eq_fn(new, times, params)
        red2, proj2 = project_lq(lq, lq.Cx, lq.Du, g_trial, scfg.proj_eps)
        dxs2, dzs2 = forward_pass(red2, backward_pass(red2, scfg.reg), jnp.zeros_like(dx0))
        dus2 = recover_controls(proj2, dxs2, dzs2)
        cand = Trajectory(xs=new.xs + dxs2, us=new.us + dus2)
        m_soc, g_soc, d_soc = merit_of(cand)
        m_new, g_new, d_new = merit_of(new)
        take = m_soc < m_new
        new = jax.tree.map(lambda a, b: jnp.where(take, a, b), cand, new)

    m1, g1, d1 = merit_of(new)
    return new, m0, alpha, m1, g1, d1


t0 = time.time()
for it in range(niter):
    traj, m0, alpha, m1, g1, d1 = one_step(traj, lam)
    print(f"it{it}: alpha={float(alpha):4} merit {float(m0):11.3f} -> {float(m1):11.3f} "
          f"g={float(g1):.3e} d={float(d1):.3e}", flush=True)
print(f"beta={beta} soc={soc} total {time.time()-t0:.1f}s")
