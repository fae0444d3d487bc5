"""Probe: from a mid-sim state, is the solver's descending plan actually
cheaper than holding? Decompose both plans' costs."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp

from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory, make_lq_functions

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=15, dt_override=0.02, sqp_iterations=3)
mpc.runtime.reset()
log = run_dummy_sim(
    mpc.runtime, mpc.initial_state, duration=0.5,
    mrt_frequency=50.0, mpc_frequency=25.0,
    command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map)
x_end = log.states[-1]
t_end = log.times[-1] + 0.02
print("state z at probe:", x_end[8])

s = mpc.runtime.advance(t_end, x_end, np.zeros(4))
plan = mpc.runtime.policy
print("solver plan z:", np.round(plan.xs[:, 8], 5))
print("alpha", s.step_size, "g", s.g_norm, "d", s.defect_norm, "cost", s.cost)

ocp, model = mpc.ocp, mpc.model
N = mpc.n_nodes
refs = mpc.motion_manager.pre_solve(t_end, x_end, np.zeros(4), 0.02, np.zeros(6), 0.0)
params = make_centroidal_node_params(ocp, refs.swing, jnp.asarray(refs.x_ref))
lq_approx, total_cost, defects_fn, eq_fn, cost_violation, _cp = make_lq_functions(
    ocp, model.flow_map, mpc.dt, N, ocp.barrier_params(), sensitivity="node")
times = t_end + mpc.dt * jnp.arange(N + 1)

plan_traj = Trajectory(xs=jnp.asarray(plan.xs), us=jnp.asarray(plan.us))
hold_traj = Trajectory(xs=jnp.tile(jnp.asarray(x_end), (N + 1, 1)),
                       us=jnp.tile(jnp.asarray(params.u_ref[0]), (N, 1)))
# hold with h zeroed (x_end carries downward momentum; zero it for a true hold)
x_hold = np.asarray(x_end).copy(); x_hold[:6] = 0.0
hold0_traj = Trajectory(xs=jnp.tile(jnp.asarray(x_hold), (N + 1, 1)),
                        us=jnp.tile(jnp.asarray(params.u_ref[0]), (N, 1)))

for name, tr in (("solver plan", plan_traj), ("hold(x_end)", hold_traj),
                 ("hold(h=0)", hold0_traj)):
    c, g_sse, gmax = cost_violation(tr, times, params)
    d = defects_fn(tr, times)
    print(f"{name}: cost={float(c):9.4f} g_sse={float(g_sse):.3e} "
          f"gmax={float(gmax):.3e} defect_max={float(jnp.max(jnp.abs(d))):.3e} "
          f"defect_sse={float(jnp.sum(d**2)):.3e}")

# --- decompose by term family ---
from wb_humanoid_mpc_tpu.ocp.penalties import quadratic_barrier, relaxed_log_barrier
bp = ocp.barrier_params()

def decompose(tr):
    def one(t, x, u, p):
        terms = ocp.node_terms(t, x, u, p)
        return (0.5 * jnp.sum(terms.r**2),
                jnp.sum(terms.h_log_mask * relaxed_log_barrier(terms.h_log, bp.log_mu, bp.log_delta)),
                jnp.sum(quadratic_barrier(terms.h_quad, bp.quad_mu, bp.quad_delta)))
    sp = jax.tree.map(lambda a: a[:-1], params)
    r2, lg, qd = jax.vmap(one)(times[:-1], tr.xs[:-1], tr.us, sp)
    return float(jnp.sum(r2)), float(jnp.sum(lg)), float(jnp.sum(qd)), np.asarray(r2), np.asarray(lg)

for name, tr in (("solver plan", plan_traj), ("hold(h=0)", hold0_traj)):
    r2, lg, qd, r2n, lgn = decompose(tr)
    print(f"{name}: r2={r2:.4f} log={lg:.4f} quad={qd:.6f}")
    print("  r2/node: ", np.round(r2n, 4))
    print("  log/node:", np.round(lgn, 4))
