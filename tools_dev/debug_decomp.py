"""Decompose SQP steps on the WB stance problem: per-block step magnitudes,
model-vs-actual merit at alpha=1, long-run convergence."""
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

reg = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6
niter = int(sys.argv[2]) if len(sys.argv) > 2 else 12

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

scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=1, reg=reg)
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
    reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, scfg.proj_eps)
    sol = backward_pass(reduced, scfg.reg)
    dxs, dzs = forward_pass(reduced, sol, dx0)
    dus = recover_controls(proj, dxs, dzs)

    def merit_parts(tr):
        c, gmax = total_cost(tr, times, params, lam, scfg.rho)
        c_pure, _ = total_cost(tr, times, params, lam * 0.0, 1e-12)
        d = defects_fn(tr, times)
        dterm = scfg.defect_weight * jnp.sum(jnp.abs(d))
        return c + dterm, c_pure, c - c_pure, dterm, gmax, jnp.max(jnp.abs(d))

    m0 = merit_parts(traj)

    def try_alpha(a):
        cand = Trajectory(xs=traj.xs + a * dxs, us=traj.us + a * dus)
        return merit_parts(cand)

    parts = jax.vmap(try_alpha)(ALPHAS)
    merits = jnp.where(jnp.isfinite(parts[0]), parts[0], jnp.inf)
    best = jnp.argmin(merits)
    alpha = jnp.where(merits[best] < m0[0], ALPHAS[best], 0.0)
    new = Trajectory(xs=traj.xs + alpha * dxs, us=traj.us + alpha * dus)
    return new, m0, parts, alpha, dxs, dus


nj = model.layout.n_joints
for it in range(niter):
    traj, m0, parts, alpha, dxs, dus = one_step(traj, lam)
    dxs, dus = np.array(dxs), np.array(dus)
    blocks = dict(
        d_qb=np.abs(dxs[:, 0:6]).max(), d_qj=np.abs(dxs[:, 6:6+nj]).max(),
        d_vb=np.abs(dxs[:, 6+nj:12+nj]).max(), d_vj=np.abs(dxs[:, 12+nj:]).max(),
        d_W=np.abs(dus[:, :12]).max(), d_qdd=np.abs(dus[:, 12:]).max(),
    )
    ai = int(np.argmin(np.where(np.isfinite(np.array(parts[0])), np.array(parts[0]), np.inf)))
    m1 = [float(p[ai]) for p in parts]
    a1 = [float(p[0]) for p in parts]  # merit at alpha=1 etc
    full = [float(p[0]) for p in parts]
    print(f"it{it}: a={float(alpha):4} merit {float(m0[0]):10.2f}->{m1[0]:10.2f} "
          f"[cost {float(m0[1]):8.2f}->{m1[1]:8.2f} pen {float(m0[2]):9.2f}->{m1[2]:9.2f} "
          f"dft {float(m0[3]):7.2f}->{m1[3]:7.2f}] g={m1[4]:.2e} "
          f"| a1: merit={full[0]:10.2f} pen={float(parts[2][0]):9.2f} "
          f"| steps {', '.join(f'{k}={v:.2f}' for k, v in blocks.items())}", flush=True)
