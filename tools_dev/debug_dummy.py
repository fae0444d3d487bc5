"""Diagnose the centroidal dummy-sim closed loop (stance + walk)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

which = sys.argv[1] if len(sys.argv) > 1 else "stance"
mpc = build_centroidal_mpc(G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
                           n_nodes=15, dt_override=0.02, sqp_iterations=3,
                           solver_overrides={"reg": float(os.environ.get("DBG_REG", "1e-2"))})
mpc.runtime.reset()
if which == "stance":
    log = run_dummy_sim(mpc.runtime, mpc.initial_state, duration=1.0,
                        mrt_frequency=50.0, mpc_frequency=25.0,
                        command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map)
else:
    log = run_dummy_sim(mpc.runtime, mpc.initial_state, duration=2.0,
                        mrt_frequency=50.0, mpc_frequency=50.0,
                        command_fn=lambda t: np.array([0.15, 0, 0, 0]) if t > 0.2 else np.zeros(4),
                        flow=mpc.model.flow_map)

s = log.states
print(f"finite={np.isfinite(s).all()}")
print(f"base x: {s[0,6]:.3f} -> {s[-1,6]:.3f}; y max |{np.abs(s[:,7]).max():.3f}|")
print(f"base z: min {s[:,8].min():.3f} max {s[:,8].max():.3f} final {s[-1,8]:.3f}")
print(f"rollpitch max |{np.abs(s[:,10:12]).max():.3f}|")
print(f"gait: {mpc.motion_manager.current_gait}")
print(f"single support frac: {(log.contact_flags.sum(axis=1)<2).mean():.3f}")
gn = [st.g_norm for st in log.solve_stats]
dn = [st.defect_norm for st in log.solve_stats]
al = [st.step_size for st in log.solve_stats]
ct = [st.cost for st in log.solve_stats]
print(f"g_norm: max {max(gn):.3e} last {gn[-1]:.3e}")
print(f"defect: max {max(dn):.3e}")
print(f"alpha:  min {min(al)} mean {np.mean(al):.2f}")
print(f"cost: first {ct[0]:.2f} last {ct[-1]:.2f} finite={np.isfinite(ct).all()}")
for i in range(0, len(gn), max(1, len(gn)//15)):
    print(f"  solve {i}: g={gn[i]:.2e} d={dn[i]:.2e} a={al[i]:.2f} cost={ct[i]:.1f}")
print("z trace:", np.array2string(s[::5, 8], precision=3, max_line_width=200))

# one more solve from the final state: does the plan recover height?
stats = mpc.runtime.advance(log.times[-1] + 0.02, log.states[-1], np.zeros(4))
pol = mpc.runtime.policy
print("final plan z:", np.array2string(pol.xs[:, 8], precision=3, max_line_width=200))
print("final plan h_z:", np.array2string(pol.xs[:, 2], precision=3, max_line_width=200))
print("final plan fz_l+fz_r:", np.array2string(pol.us[:, 2] + pol.us[:, 8], precision=1, max_line_width=200))
