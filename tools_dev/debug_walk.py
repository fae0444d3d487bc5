"""Diagnose the walk-forward fall: per-step log of base state, gait, solver health."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=25, dt_override=0.04, sqp_iterations=3,
)
mpc.runtime.reset()

gait_trace = []
orig_pre = mpc.motion_manager.pre_solve
def traced_pre(t0, x_obs, raw_cmd, dt_since, bv, th):
    r = orig_pre(t0, x_obs, raw_cmd, dt_since, bv, th)
    gait_trace.append((t0, mpc.motion_manager.current_gait))
    return r
mpc.motion_manager.pre_solve = traced_pre

log = run_dummy_sim(
    mpc.runtime, mpc.initial_state, duration=3.0,
    mrt_frequency=50.0, mpc_frequency=50.0,
    command_fn=lambda t: np.array([0.15, 0.0, 0.0, 0.0]) if t > 0.2 else np.zeros(4),
    flow=mpc.model.flow_map,
)

print("t      x      z      pitch  roll   vz     gait          cost    g_norm  defect  alpha")
for i in range(len(log.times)):
    t = log.times[i]
    s = log.states[i]
    st = log.solve_stats[i] if i < len(log.solve_stats) else None
    g = next((gname for (gt, gname) in reversed(gait_trace) if gt <= t + 1e-9), "?")
    cf = log.contact_flags[i]
    print(f"{t:5.2f} {s[6]:6.3f} {s[8]:6.3f} {s[10]:6.3f} {s[11]:6.3f} {s[2]:6.3f} {g:13s} "
          f"{st.cost if st else float('nan'):8.2f} {st.g_norm if st else float('nan'):7.4f} "
          f"{st.defect_norm if st else float('nan'):7.4f} {st.step_size if st else float('nan'):5.2f} "
          f"cf={cf}")
np.save("/tmp/walk_states.npy", log.states)
np.save("/tmp/walk_flags.npy", log.contact_flags)
