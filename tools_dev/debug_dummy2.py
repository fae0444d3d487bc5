"""Centroidal vs whole-body dummy-sim stance comparison (3 s)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from tests.conftest import G1_CENTROIDAL_TASK, G1_WB_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc, build_wb_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
C_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"
W_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_wb_mpc/config/command/reference.info"

which = sys.argv[1]
if which == "cen":
    mpc = build_centroidal_mpc(G1_URDF, G1_CENTROIDAL_TASK, C_REF, GAIT_INFO,
                               n_nodes=15, dt_override=0.02, sqp_iterations=3)
    zi, rpi = 8, 10
else:
    mpc = build_wb_mpc(G1_URDF, G1_WB_TASK, W_REF, GAIT_INFO,
                       n_nodes=10, dt_override=0.035, sqp_iterations=3)
    zi, rpi = 2, 4
mpc.runtime.reset()
log = run_dummy_sim(mpc.runtime, mpc.initial_state, duration=3.0,
                    mrt_frequency=50.0, mpc_frequency=25.0,
                    command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map)
s = log.states
print(f"{which}: finite={np.isfinite(s).all()} z min {s[:,zi].min():.3f} final {s[-1,zi]:.3f}")
print(f"rollpitch max |{np.abs(s[:,rpi:rpi+2]).max():.3f}|  xy final ({s[-1,zi-2]:.3f},{s[-1,zi-1]:.3f})")
print("z every 0.2s:", np.array2string(s[::10, zi], precision=3, max_line_width=250))
gn = [st.g_norm for st in log.solve_stats]; al = [st.step_size for st in log.solve_stats]
print(f"g max {max(gn):.2e}, alpha min {min(al)}")
