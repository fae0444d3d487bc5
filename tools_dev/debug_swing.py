"""Isolated convergence test: centroidal solve with a walk schedule in the
horizon (frozen refs), N=60, many iterations; per-iteration g/defect trace."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np, jax.numpy as jnp
from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params, weight_comp_input
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory, make_lq_functions
from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass

GAIT = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CREF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"
N = 60
mpc = build_centroidal_mpc(G1_URDF, G1_CENTROIDAL_TASK, CREF, GAIT, sqp_iterations=1)
mm, ocp, model = mpc.motion_manager, mpc.ocp, mpc.model
mm.reset()
# force a walk insertion so the horizon contains swing phases
mm.current_gait = "walk"
mm._update_gait_schedule(0.0, 1.2)
refs = mm.pre_solve(0.0, np.asarray(mpc.initial_state), np.array([0.15,0,0,0]), 0.02, np.zeros(6), 0.0)
print("contact flags over horizon (L):", refs.swing.contact_flags[:, 0].astype(int))
print("contact flags over horizon (R):", refs.swing.contact_flags[:, 1].astype(int))
print("z_pos L:", np.array2string(refs.swing.z_pos[:, 0], precision=3, max_line_width=250))
print("z_pos R:", np.array2string(refs.swing.z_pos[:, 1], precision=3, max_line_width=250))

params = make_centroidal_node_params(ocp, refs.swing, jnp.asarray(refs.x_ref))
x0 = jnp.asarray(mpc.initial_state)
u0 = weight_comp_input(model.robot.total_mass, model.robot.gravity, jnp.ones(2), 35)
us = np.tile(np.asarray(u0), (N, 1))
cf = np.asarray(refs.swing.contact_flags)[:N]
for i in range(2):
    us[cf[:, i] < 0.5, 6*i:6*i+6] = 0.0
traj = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.asarray(us))
lam = jnp.zeros((N, ocp.n_eq))
reg = float(os.environ.get("DBG_REG", "1e-2"))
bp = ocp.barrier_params()
lq_approx, total_cost, defects_fn, eq_fn, cost_violation, _cp = make_lq_functions(ocp, model.flow_map, 0.02, N, bp)
times = 0.02 * jnp.arange(N + 1)
ALPHAS = jnp.asarray((1.0, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05, 0.01))

@jax.jit
def one(traj, reg, rho_m):
    lq = lq_approx(traj, times, params, lam, 1.0)
    reduced, proj = project_lq(lq, lq.Cx, lq.Du, lq.g_res, 1e-8)
    sol = backward_pass(reduced, reg)
    dxs, dzs = forward_pass(reduced, sol, x0 - traj.xs[0])
    dus = recover_controls(proj, dxs, dzs)
    def perf(tr):
        c, g_sse, gmax = cost_violation(tr, times, params)
        d = defects_fn(tr, times)
        return c, jnp.sqrt(g_sse + jnp.sum(d**2)), gmax, jnp.max(jnp.abs(d))
    c0, v0, _, _ = perf(traj)
    cs, vs, _, _ = jax.vmap(lambda a: perf(Trajectory(xs=traj.xs + a*dxs, us=traj.us + a*dus)))(ALPHAS)
    fin = jnp.isfinite(cs) & jnp.isfinite(vs)
    ok = jnp.where(v0 > 1e-2, vs < (1-1e-6)*v0,
                   jnp.where(vs < 1e-6, cs < c0, (cs < c0) | (vs < (1-1e-6)*v0))) & fin
    a = ALPHAS[jnp.argmax(ok)] * jnp.any(ok)
    new = Trajectory(xs=traj.xs + a*dxs, us=traj.us + a*dus)
    c1, v1, g1, d1 = perf(new)
    return new, a, g1, d1, v1, c1

rho_m = float(os.environ.get("DBG_RHO", "1e3"))
t0 = time.time()
traj0 = traj
for it in range(10):
    traj, a, g1, d1, v1, c1 = one(traj, reg, rho_m)
    print(f"it{it}: a={float(a):4} cost={float(c1):10.2f} v={float(v1):.3e} g={float(g1):.3e} d={float(d1):.3e}", flush=True)
print(f"reg={reg} rho={rho_m} total {time.time()-t0:.0f}s")
# per-node |g| after convergence attempt: which nodes are stuck?
g = np.abs(np.asarray(eq_fn(traj, times, params)))
bad = np.argsort(g.max(axis=1))[-6:]
for k in sorted(bad):
    print(f"node {k}: |g| max {g[k].max():.3f} rows {np.argsort(g[k])[-3:][::-1]} cf {np.asarray(refs.swing.contact_flags)[k]}")
