"""A/B: dummy-sim stance sag under filter vs merit line search (CPU, f64)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

mode = sys.argv[1] if len(sys.argv) > 1 else "filter"
reg = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-2
mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=15, dt_override=0.02, sqp_iterations=3,
    solver_overrides={"line_search": mode, "reg": reg},
)
mpc.runtime.reset()
log = run_dummy_sim(
    mpc.runtime, mpc.initial_state, duration=1.0,
    mrt_frequency=50.0, mpc_frequency=25.0,
    command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map)
z = log.states[:, 8]
print(f"mode={mode} reg={reg}  z: start {z[0]:.4f} end {z[-1]:.4f} min {z.min():.4f}")
print("alphas:", [round(float(s.step_size), 3) for s in log.solve_stats])
print("g_norm:", [round(float(s.g_norm), 5) for s in log.solve_stats[:10]])
print("defect:", [round(float(s.defect_norm), 5) for s in log.solve_stats[:10]])
print("cost:  ", [round(float(s.cost), 3) for s in log.solve_stats[:10]])
