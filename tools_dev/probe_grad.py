"""Probe: which cost term pulls the robot down at the ideal hold state?

Decomposes d(node cost)/dx at (x0, u_ref) into term families and prints the
entries for base z, knee/hip-pitch/ankle-pitch joints.
"""
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
from wb_humanoid_mpc_tpu.ocp.penalties import quadratic_barrier, relaxed_log_barrier

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=15, dt_override=0.02, sqp_iterations=3)
ocp, mm = mpc.ocp, mpc.motion_manager
x0 = jnp.asarray(mpc.initial_state)
refs = mm.pre_solve(0.0, np.asarray(x0), np.zeros(4), 0.02, np.zeros(6), 0.0)
from wb_humanoid_mpc_tpu.ocp.params import make_centroidal_node_params
params = make_centroidal_node_params(ocp, refs.swing, jnp.asarray(refs.x_ref))
p0 = jax.tree.map(lambda a: a[0], params)
u0 = p0.u_ref
bp = ocp.barrier_params()

names = {
    "r2 (GN residuals)": lambda t: 0.5 * jnp.sum(t.r**2),
    "log barrier (cone+moment+collision)": lambda t: jnp.sum(
        t.h_log_mask * relaxed_log_barrier(t.h_log, bp.log_mu, bp.log_delta)),
    "quad barrier (joint limits)": lambda t: jnp.sum(
        quadratic_barrier(t.h_quad, bp.quad_mu, bp.quad_delta)),
}
jn = mpc.model.robot.joint_names
idx = {n: 12 + jn.index(n) for n in
       ("left_hip_pitch_joint", "left_knee_joint", "left_ankle_pitch_joint")}
idx["base_z"] = 8
idx["h_z"] = 2

for label, fn in names.items():
    g = jax.grad(lambda x: fn(ocp.node_terms(0.0, x, u0, p0)))(x0)
    print(label, {k: round(float(g[i]), 4) for k, i in idx.items()})

# breakdown of log-barrier rows: which rows are near-active?
t = ocp.node_terms(0.0, x0, u0, p0)
print("h_log rows:", np.round(np.asarray(t.h_log), 3))
print("h_log mask:", np.asarray(t.h_log_mask))
print("h_quad min (dist to joint limits):", float(np.min(np.asarray(t.h_quad))))
# gradient of full node cost wrt u (is u_ref a stationary input?)
from wb_humanoid_mpc_tpu.solver.transcription import node_cost_terms, _Terms
gu = jax.grad(lambda u: node_cost_terms(
    ocp.node_terms(0.0, x0, u, p0), bp, jnp.zeros_like(t.g), 1e-12))(u0)
print("grad_u fz rows:", round(float(gu[2]), 4), round(float(gu[8]), 4))
print("grad_u knee qd:", round(float(gu[12 + 3 + 12]), 4))
