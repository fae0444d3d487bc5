"""Controlled SQP convergence test: stance state, walking schedule, many iterations."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=20, horizon=1.0, sqp_iterations=1, solver_overrides={"g_max": 1.0},
)
mm = mpc.motion_manager
rt = mpc.runtime

# force a walking schedule: insert walk template starting at t=0.2
mm.reset()
mm.current_gait = "walk"; mm.last_gait = "walk"
mm.gait_schedule.insert_mode_sequence_template(mm.gait_map["walk"], 0.2, 3.0)

x0 = np.asarray(mpc.initial_state)
refs = mm.pre_solve(0.0, x0, np.array([0.15, 0, 0, 0]), 0.02, np.zeros(6), 0.0)
print("flags L:", refs.swing.contact_flags[:, 0].astype(int))
print("flags R:", refs.swing.contact_flags[:, 1].astype(int))
params = rt.make_node_params(refs)

from wb_humanoid_mpc_tpu.solver.transcription import Trajectory
init = rt._warm_start(0.0, x0)
cf = np.asarray(refs.swing.contact_flags)[: rt.N]
us = np.array(init.us)
for i in range(2):
    us[cf[:, i] < 0.5, 6 * i: 6 * i + 6] = 0.0
traj = Trajectory(xs=init.xs, us=jnp.asarray(us))
lam = jnp.zeros((rt.N, rt.n_eq))

for it in range(20):
    sol = rt.solve_fn(0.0, jnp.asarray(x0), traj, params, lam)
    sol = jax.block_until_ready(sol)
    traj, lam = sol.traj, sol.lam
    print(f"it {it:2d}: cost {float(sol.cost):12.2f} g {float(sol.g_norm):9.5f} "
          f"defect {float(sol.defect_norm):9.5f} alpha {float(sol.step_size):5.2f}")

# which equality rows are violated?
import jax.numpy as jnp2
times = 0.0 + rt.dt * np.arange(rt.N + 1)
stage_params = jax.tree.map(lambda a: a[:-1], params)
gs = jax.vmap(lambda t, x, u, p: mpc.ocp.node_terms(t, x, u, p).g)(
    jnp.asarray(times[:-1]), sol.traj.xs[:-1], sol.traj.us, stage_params)
gs = np.asarray(gs)
print("n_eq =", gs.shape[1])
labels = (["L_st/wr_vx","L_st/wr_vy","L_st/wr_vz","L_st/wr_wx","L_st/wr_wy","L_st/wr_wz","L_normvel",
           "R_st/wr_vx","R_st/wr_vy","R_st/wr_vz","R_st/wr_wx","R_st/wr_wy","R_st/wr_wz","R_normvel"])
for j in range(gs.shape[1]):
    lab = labels[j] if j < len(labels) else f"mimic_{j-len(labels)}"
    worst = np.argmax(np.abs(gs[:, j]))
    print(f"row {j:2d} {lab:12s} max|g| {np.abs(gs[:,j]).max():8.4f} at node {worst}")
print("contact flags by node L,R:")
print(np.asarray(refs.swing.contact_flags[:rt.N]).T.astype(int))
