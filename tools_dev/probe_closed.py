"""Probe: closed-loop stance traces — base z, foot z, h_z, per step."""
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
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

reg = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-4
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=15, dt_override=0.02, sqp_iterations=iters,
    solver_overrides={"reg": reg},
)
mpc.runtime.reset()
log = run_dummy_sim(
    mpc.runtime, mpc.initial_state, duration=1.0,
    mrt_frequency=50.0, mpc_frequency=25.0,
    command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map)

model = mpc.model
robot = model.robot
def foot_z(x):
    q = model.layout.generalized_coordinates(jnp.asarray(x))
    fk = kin.forward_kinematics(robot, q)
    return [float(kin.frame_transform(robot, fk, f)[1][2]) for f in model.contact_frames]

for i in range(0, len(log.times), 5):
    x = log.states[i]
    fz = foot_z(x)
    knee = x[12 + 3]  # left knee joint angle (joint order: hip p/r/y, knee)
    print(f"t={log.times[i]:.2f} z={x[8]:.4f} h_z={x[2]:+.5f} footL={fz[0]:+.5f} "
          f"footR={fz[1]:+.5f} kneeL={knee:+.4f} hipL={x[12]:+.4f}")
x = log.states[-1]
print("joint drift (q - q0):", np.round(log.states[-1, 12:] - log.states[0, 12:], 4))
