"""Closed-loop dummy-sim tests — the headless `make launch-g1-dummy-sim`
(reference SURVEY.md §3.2). Short horizons keep compile time down; the full
60-node configuration is exercised by bench.py."""

import numpy as np
import pytest

from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"


@pytest.fixture(scope="module")
def mpc():
    # dt pinned to the reference task-file value (task.info multiple_shooting
    # dt 0.02); 15 nodes -> 0.3 s receding horizon, short enough to keep test
    # compile time down while covering a half gait cycle.
    return build_centroidal_mpc(
        G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
        n_nodes=15, dt_override=0.02, sqp_iterations=3,
    )


def test_dummy_sim_stance(mpc):
    mpc.runtime.reset()
    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=1.0,
        mrt_frequency=50.0, mpc_frequency=25.0,
        command_fn=lambda t: np.zeros(4),
        flow=mpc.model.flow_map,
    )
    assert np.isfinite(log.states).all()
    # base height holds near target
    np.testing.assert_allclose(log.states[:, 8], 0.7925, atol=0.03)
    # base xy stays near origin
    assert np.abs(log.states[:, 6:8]).max() < 0.08
    # both feet stay in contact throughout (stance gait)
    assert (log.contact_flags > 0.5).all()
    # solver healthy
    for s in log.solve_stats:
        assert s.g_norm < 5e-2
        assert np.isfinite(s.cost)


def test_dummy_sim_walk_forward(mpc):
    """Velocity command forward: the robot must walk — base advances, gait FSM
    leaves stance, feet alternate."""
    mpc.runtime.reset()
    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=2.0,
        mrt_frequency=50.0, mpc_frequency=50.0,
        command_fn=lambda t: np.array([0.15, 0.0, 0.0, 0.0]) if t > 0.2 else np.zeros(4),
        flow=mpc.model.flow_map,
    )
    assert np.isfinite(log.states).all()
    # walked forward a meaningful distance
    assert log.states[-1, 6] > 0.1, f"only advanced {log.states[-1, 6]:.3f} m"
    # never fell (base height stays well above collapse)
    assert log.states[:, 8].min() > 0.3
    assert np.abs(log.states[:, 10:12]).max() < 1.6  # no tumble
    # gait switched away from stance and feet alternated
    assert mpc.motion_manager.current_gait != "stance"
    single_support = (log.contact_flags.sum(axis=1) < 2).mean()
    assert single_support > 0.15, "no single-support phases seen"
    left_swings = (log.contact_flags[:, 0] < 0.5).any()
    right_swings = (log.contact_flags[:, 1] < 0.5).any()
    assert left_swings and right_swings
