"""Probe: does the converged stance OCP plan sag? Deep solve at t=0."""
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
from wb_humanoid_mpc_tpu.models import kinematics as kin

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
reg = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=15, dt_override=0.02, sqp_iterations=iters,
    solver_overrides={"reg": reg},
)
mpc.runtime.reset()
x0 = mpc.initial_state
s = mpc.runtime.advance(0.0, x0, np.zeros(4))
plan = mpc.runtime.policy
print(f"iters={iters} reg={reg} alpha={s.step_size} g={s.g_norm:.2e} d={s.defect_norm:.2e}")
print("plan z:", np.round(plan.xs[:, 8], 5))
print("plan h_lin_z (x[2]):", np.round(plan.xs[:, 2], 5))

# foot z over the plan
model = mpc.model
robot = model.robot
def foot_z(x):
    q = model.layout.generalized_coordinates(jnp.asarray(x))
    fk = kin.forward_kinematics(robot, q)
    return [float(kin.frame_transform(robot, fk, f)[1][2]) for f in model.contact_frames]
fz = np.array([foot_z(x) for x in plan.xs])
print("plan foot z L:", np.round(fz[:, 0], 5))
print("x_ref z (targets):")
refs = mpc.motion_manager.pre_solve(0.0, x0, np.zeros(4), 0.02, np.zeros(6), 0.0)
print("  x_ref[:,8] =", np.round(np.asarray(refs.x_ref)[:, 8], 5))
print("  swing z_pos[0] =", np.round(np.asarray(refs.swing.z_pos)[0], 5))
print("  initial foot z =", foot_z(x0))
print("  u_ref check: contact flags", np.asarray(refs.swing.contact_flags)[0])
