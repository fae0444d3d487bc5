import numpy as np

from tests.conftest import REFERENCE_ROOT
from wb_humanoid_mpc_tpu.core.config import SwingTrajectoryConfig, load_gait_library
from wb_humanoid_mpc_tpu.refs.gait import (
    FLY, LF, RF, STANCE,
    GaitSchedule, ModeSchedule, contact_flags_to_mode, default_gait_schedule,
    mode_to_contact_flags,
)
from wb_humanoid_mpc_tpu.refs.swing import (
    CubicSpline, SplineCpg, SwingTrajectoryPlanner, sample_swing_reference,
)

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"


def test_mode_flag_roundtrip():
    for m in range(4):
        assert contact_flags_to_mode(mode_to_contact_flags(m)) == m
    assert mode_to_contact_flags(LF).tolist() == [True, False]
    assert mode_to_contact_flags(RF).tolist() == [False, True]
    assert mode_to_contact_flags(STANCE).tolist() == [True, True]
    assert mode_to_contact_flags(FLY).tolist() == [False, False]


def test_gait_schedule_tiling():
    gaits = load_gait_library(GAIT_INFO)
    gs = default_gait_schedule([STANCE, STANCE], [0.5], gaits["stance"])
    gs.insert_mode_sequence_template(gaits["walk"], 1.0, 3.0)
    ms = gs.get_mode_schedule(0.0, 3.0)
    # walk cycle LF, STANCE, RF, STANCE with durations .6/.1/.6/.1 starting at 1.0
    assert ms.mode_at(0.2) == STANCE
    assert ms.mode_at(1.1) == LF
    assert ms.mode_at(1.65) == STANCE
    assert ms.mode_at(1.8) == RF
    assert ms.mode_at(2.35) == STANCE
    assert ms.mode_at(2.5) == LF  # second cycle
    # event times strictly increasing
    assert np.all(np.diff(ms.event_times) > 0)
    assert len(ms.mode_sequence) == len(ms.event_times) + 1


def test_gait_schedule_receding_window():
    gaits = load_gait_library(GAIT_INFO)
    gs = default_gait_schedule([STANCE, STANCE], [0.5], gaits["trot"])
    gs.insert_mode_sequence_template(gaits["trot"], 0.5, 2.0)
    ms1 = gs.get_mode_schedule(0.0, 2.0)
    ms2 = gs.get_mode_schedule(1.0, 3.0)
    # modes in the overlap [1.0, 2.0] must agree
    for t in np.linspace(1.01, 1.95, 10):
        assert ms1.mode_at(t) == ms2.mode_at(t), t


def test_cubic_spline_endpoints():
    sp = CubicSpline(0.2, 1.0, -0.5, 0.8, 2.0, 0.3)
    np.testing.assert_allclose(sp.position(0.2), 1.0, atol=1e-12)
    np.testing.assert_allclose(sp.position(0.8), 2.0, atol=1e-12)
    np.testing.assert_allclose(sp.velocity(0.2), -0.5, atol=1e-12)
    np.testing.assert_allclose(sp.velocity(0.8), 0.3, atol=1e-12)
    # velocity == d/dt position (finite diff)
    for t in [0.3, 0.5, 0.7]:
        fd = (sp.position(t + 1e-7) - sp.position(t - 1e-7)) / 2e-7
        np.testing.assert_allclose(sp.velocity(t), fd, rtol=1e-5)
        fd2 = (sp.velocity(t + 1e-7) - sp.velocity(t - 1e-7)) / 2e-7
        np.testing.assert_allclose(sp.acceleration(t), fd2, rtol=1e-4)


def test_spline_cpg_apex():
    cpg = SplineCpg(0.0, 0.0, 0.05, 0.08, 0.6, -0.001, 0.0)
    np.testing.assert_allclose(cpg.position(0.3), 0.08, atol=1e-12)
    np.testing.assert_allclose(cpg.velocity(0.3), 0.0, atol=1e-10)
    np.testing.assert_allclose(cpg.position(0.0), 0.0, atol=1e-12)
    np.testing.assert_allclose(cpg.position(0.6), -0.001, atol=1e-12)


def _walk_schedule():
    gaits = load_gait_library(GAIT_INFO)
    gs = default_gait_schedule([STANCE, STANCE], [0.3], gaits["walk"])
    gs.insert_mode_sequence_template(gaits["walk"], 0.3, 3.0)
    return gs.get_mode_schedule(0.0, 3.0)


def test_swing_planner_walk():
    cfg = SwingTrajectoryConfig()
    planner = SwingTrajectoryPlanner(cfg)
    ms = _walk_schedule()
    planner.update(ms, terrain_height=0.0)

    # during LF mode (left stance), right foot swings: apex at mid-swing
    # first LF phase is [0.3, 0.9]
    assert planner.contact_flag(0, 0.6)       # left in contact
    assert not planner.contact_flag(1, 0.6)   # right swinging
    mid = planner.z_position(1, 0.6)
    s = min(1.0, 0.6 / cfg.swing_time_scale)
    np.testing.assert_allclose(
        mid, min(0.0, cfg.touch_down_height_offset) + s * cfg.swing_height, atol=1e-10)
    # liftoff/touchdown boundary values
    np.testing.assert_allclose(planner.z_position(1, 0.3 + 1e-9), 0.0, atol=1e-6)
    np.testing.assert_allclose(planner.z_position(1, 0.9 - 1e-9),
                               cfg.touch_down_height_offset, atol=1e-6)
    # stance foot reference height is terrain
    np.testing.assert_allclose(planner.z_position(0, 0.6), 0.0, atol=1e-12)
    np.testing.assert_allclose(planner.impact_proximity(0, 0.6), 1.0)
    # proximity mid-swing equals configured midpoint value
    np.testing.assert_allclose(planner.impact_proximity(1, 0.6),
                               cfg.impact_proximity_factor_mid_point_value, atol=1e-10)


def test_sample_swing_reference_shapes():
    cfg = SwingTrajectoryConfig()
    planner = SwingTrajectoryPlanner(cfg)
    planner.update(_walk_schedule(), 0.0)
    times = np.linspace(0.0, 1.2, 61)
    ref = sample_swing_reference(planner, times)
    assert ref.contact_flags.shape == (61, 2)
    assert np.isfinite(ref.z_pos).all()
    assert np.isfinite(ref.z_vel).all()
    # both feet in contact at t=0 (stance)
    assert ref.contact_flags[0].tolist() == [1.0, 1.0]
