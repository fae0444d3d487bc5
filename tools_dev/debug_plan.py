"""Dump the planned horizon at the moment the robot starts sinking (t≈1.0)."""
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
from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

mpc = build_centroidal_mpc(
    G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
    n_nodes=20, horizon=1.0, sqp_iterations=3,
)
mpc.runtime.reset()
log = run_dummy_sim(
    mpc.runtime, mpc.initial_state, duration=1.02,
    mrt_frequency=50.0, mpc_frequency=50.0,
    command_fn=lambda t: np.array([0.15, 0.0, 0.0, 0.0]) if t > 0.2 else np.zeros(4),
    flow=mpc.model.flow_map,
)
pol = mpc.runtime.policy
print("policy t0 =", pol.t0)
xs, us, cf = pol.xs, pol.us, pol.contact_flags
# centroidal layout: x = [h(6), q_b(6), q_j(n)]; u = [W_l(6), W_r(6), qd_j]
print("k   t     hx      hz     base_x  base_z   Wl_z    Wr_z   cf")
N = us.shape[0]
# also recompute the x_ref used
for k in range(N + 1):
    t = pol.t0 + k * mpc.runtime.dt
    Wl = us[k, 2] if k < N else np.nan
    Wr = us[k, 8] if k < N else np.nan
    print(f"{k:2d} {t:5.2f} {xs[k,0]:7.3f} {xs[k,2]:7.3f} {xs[k,6]:7.3f} {xs[k,8]:7.3f} {Wl:7.1f} {Wr:7.1f} {cf[k]}")
m = mpc.model.robot.total_mass
print("total weight:", m * 9.81)

# inspect the live schedule and resampled flags
mm = mpc.motion_manager
ms = mm.gait_schedule._schedule
names = {0: "FLY", 1: "RF", 2: "LF", 3: "ST"}
print("schedule events:", [f"{names[int(m)]}@{e:.2f}" for m, e in zip(ms.mode_sequence[:-1], ms.event_times)], names[int(ms.mode_sequence[-1])])
refs = mm.pre_solve(1.0, log.states[-1], np.array([0.15,0,0,0]), 0.02, np.zeros(6), 0.0)
ms2 = refs.mode_schedule
print("solve-window schedule:", [f"{names[int(m)]}@{e:.2f}" for m, e in zip(ms2.mode_sequence[:-1], ms2.event_times)], names[int(ms2.mode_sequence[-1])])
print("sampled flags:", refs.swing.contact_flags.T)

pl = mm.swing_planner
print("planner event_times:", np.round(pl._event_times, 3))
print("len modes:", len(ms2.mode_sequence), "len events:", len(ms2.event_times))
print("full events:", np.round(ms2.event_times, 3))
print("full modes:", ms2.mode_sequence)
print("n phases per leg:", len(pl._phases[0]), len(pl._phases[1]))
print("phase flags left: ", [int(p.in_contact) for p in pl._phases[0]])
print("phase flags right:", [int(p.in_contact) for p in pl._phases[1]])
