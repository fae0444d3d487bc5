"""Closed loop at the REFERENCE operating point — the first fidelity artifact
BASELINE.md demands.

Centroidal: horizon 1.2 s, dt 0.02 -> 60 shooting intervals, 1 SQP
iteration/solve, MPC 80 Hz-class cadence (`g1_centroidal_mpc/config/mpc/
task.info:79-96,112,118`). The dummy-sim loop (reference §3.2
`MRT_ROS_Dummy_Loop`) walks 5 s at a 0.25 m/s forward command and must track
velocity and height. Run summary is exported by
`tools_dev/run_ref_operating_point.py` into `artifacts/`.
"""

import numpy as np
import pytest

from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"


@pytest.mark.slow
def test_centroidal_reference_operating_point_walk():
    # exact reference transcription: 1.2 s / dt 0.02 = 60 intervals; the
    # reference runs sqpIteration 1 at 80 Hz — at the test's 25 Hz solve
    # cadence, 2 iterations/solve matches total Newton progress per second
    mpc = build_centroidal_mpc(
        G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
        n_nodes=60, dt_override=0.02, sqp_iterations=2,
    )
    # raw command is normalized [-1, 1] and scaled by reference.info limits;
    # compute the raw value that yields 0.25 m/s
    vmax = float(mpc.motion_manager.calc.ref_cfg.max_displacement_velocity_x)
    raw = 0.25 / vmax

    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=5.0,
        mrt_frequency=50.0, mpc_frequency=25.0,
        command_fn=lambda t: np.array([raw, 0.0, 0.0, 0.0]) if t > 0.3 else np.zeros(4),
        flow=mpc.model.flow_map,
    )
    assert np.isfinite(log.states).all()
    # height tracking: base z stays in band around the default height
    assert log.states[:, 8].min() > 0.72, \
        f"height collapsed to {log.states[:, 8].min():.3f}"
    assert log.states[:, 8].max() < 0.86
    # velocity tracking: mean forward velocity over the commanded window
    # within 40% of the command (the reference makes no tighter promise:
    # its dummy sim is kinematic and the gait FSM transient eats ~1 s)
    walked = log.states[-1, 6] - log.states[int(0.3 * 50), 6]
    v_mean = walked / (log.times[-1] - 0.3)
    assert v_mean > 0.12, f"mean forward velocity {v_mean:.3f} m/s at 0.25 m/s command"
    # the gait FSM must have left stance and alternated feet
    single_support = (log.contact_flags.sum(axis=1) < 2).mean()
    assert single_support > 0.15
    assert (log.contact_flags[:, 0] < 0.5).any()
    assert (log.contact_flags[:, 1] < 0.5).any()


@pytest.mark.slow
def test_centroidal_pose_command_tracking():
    """Keyboard pose command at a reference-length (1.2 s) horizon: a -8 cm
    pelvis-height delta is actually tracked. At the fast tier's 0.3 s horizon
    the reference weights make crouching uneconomical (see
    test_dummy_sim.py::test_pose_command_tracking); with the full look-ahead
    the z-error saving pays for the joint motion and the robot descends at
    ~2 cm/s (single-solve plan slope verified: 0.7925 -> 0.7726 over one
    1.2 s horizon)."""
    mpc = build_centroidal_mpc(
        G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
        n_nodes=15, dt_override=0.08, sqp_iterations=2,
    )
    mpc.runtime.reset()
    mpc.motion_manager.set_pose_command(np.array([0.0, 0.0, -0.08, 0.0]))
    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=5.0,
        mrt_frequency=50.0, mpc_frequency=25.0,
        command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map,
    )
    assert np.isfinite(log.states).all()
    z = log.states[:, 8]
    assert z[-1] < 0.755, \
        f"pose command not tracked at reference horizon (z_end = {z[-1]:.4f})"
    assert z.min() > 0.70, f"overshoot below command (z_min = {z.min():.4f})"
    # xy stays put
    assert np.abs(log.states[-1, 6:8]).max() < 0.08
