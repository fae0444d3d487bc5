"""Repro: does the live gait schedule restart the template mid-cycle?"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from wb_humanoid_mpc_tpu.core.config import load_gait_map, load_reference_config
from wb_humanoid_mpc_tpu.refs.gait import default_gait_schedule

REF = "/root/reference"
GAIT_INFO = REF + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CREF = REF + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"

gait_map = load_gait_map(GAIT_INFO)
ref_cfg = load_reference_config(CREF)
t = gait_map["walk"]
print("walk template:", t.mode_sequence, t.switching_times)

gs = default_gait_schedule(
    ref_cfg.initial_mode_schedule_modes, ref_cfg.initial_mode_schedule_times,
    ref_cfg.default_template, phase_transition_stance_time=0.2)

# simulate: insert walk at t=0.6 (as the FSM would), then poll like pre_solve
horizon = 0.6
gs._template = gait_map["slow_walk"]
ms = gs.get_mode_schedule(0.0, 2 * horizon)
gs.insert_mode_sequence_template(gait_map["walk"], 0.6, 0.6 + 1.5 * horizon)
names = {0: "FLY", 1: "RF", 2: "LF", 3: "ST"}
for step in range(100):
    t0 = 0.6 + step * 0.02
    ms = gs.get_mode_schedule(t0 - horizon, t0 + 2 * horizon)
    if step % 10 == 0:
        seq = " ".join(f"{names[int(m)]}@{et:.2f}" for m, et in
                       zip(ms.mode_sequence[:-1], ms.event_times))
        print(f"t0={t0:.2f}: {seq} {names[int(ms.mode_sequence[-1])]}")
