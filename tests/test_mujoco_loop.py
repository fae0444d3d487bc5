"""Full-physics MuJoCo closed-loop tests (reference §3.3,
`CentroidalMpcRobotSim.cpp:45-165`): 2 kHz physics, 500 Hz MRT, async MPC.

These are the first automated tests of the real physics loop (rounds 2-3 had
none). Marked slow — each runs a multi-second sim with ~10^2 MPC solves.
"""

import numpy as np
import pytest

from tests.conftest import G1_CENTROIDAL_TASK, G1_MJCF, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.mpc.controller import CentroidalMrtController
from wb_humanoid_mpc_tpu.sim.closed_loop import run_mujoco_closed_loop
from wb_humanoid_mpc_tpu.sim.mujoco_sim import MujocoSimInterface

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"


@pytest.fixture(scope="module")
def mpc():
    return build_centroidal_mpc(
        G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
        n_nodes=15, dt_override=0.02, sqp_iterations=2,
    )


def _make_sim(mpc):
    joint_defaults = {
        name: float(v) for name, v in zip(
            mpc.model.robot.joint_names, mpc.initial_state[12:35])
    }
    return MujocoSimInterface(
        G1_MJCF, initial_joint_positions=joint_defaults,
        initial_base_pos=(0, 0, float(mpc.initial_state[8])))


@pytest.mark.slow
def test_mujoco_stance_hold(mpc):
    """G1 stance-holds >= 3 s under full physics with async MRT semantics
    (solve latency charged to the sim timeline); no auto-resets."""
    mpc.runtime.reset()
    sim = _make_sim(mpc)
    controller = CentroidalMrtController(mpc.model)
    log = run_mujoco_closed_loop(
        mpc, controller, sim, duration=3.0,
        mrt_frequency=500.0, mpc_frequency=50.0,
        command_fn=lambda t: np.zeros(4),
        solve_latency=0.012,   # ~ measured TPU p50 (BENCH)
    )
    assert log.n_resets == 0, "robot fell (auto-reset triggered)"
    assert log.base_heights.min() > 0.60, \
        f"stance sagged to {log.base_heights.min():.3f} m"
    assert np.abs(log.base_positions[-1, :2]).max() < 0.25
    for s in log.solve_stats:
        assert np.isfinite(s.cost)


@pytest.mark.slow
def test_mujoco_pipeline_smoke(mpc):
    """MrtPipeline (real solver thread) drives the physics loop: policies
    flow, the robot stays up for 1 s, and the thread shuts down cleanly."""
    mpc.runtime.reset()
    sim = _make_sim(mpc)
    controller = CentroidalMrtController(mpc.model)
    log = run_mujoco_closed_loop(
        mpc, controller, sim, duration=1.0,
        mrt_frequency=250.0, mpc_frequency=50.0,
        command_fn=lambda t: np.zeros(4),
        use_pipeline=True,
    )
    assert log.n_resets == 0
    assert log.base_heights.min() > 0.5
    assert len(log.solve_stats) > 0, "pipeline produced no solves"
