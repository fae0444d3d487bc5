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


def test_gait_override_mid_run(mpc):
    """Operator gait override (reference GaitKeyboardPublisher ->
    GaitScheduleUpdaterRos2): `request_gait("trot")` at zero velocity command
    must switch the schedule out of stance — single-support phases appear."""
    mpc.runtime.reset()
    fired = []

    def command_fn(t):
        if t >= 0.3 and not fired:
            mpc.motion_manager.request_gait("trot")
            fired.append(t)
        return np.zeros(4)

    gait_after = []

    def command_fn2(t):
        out = command_fn(t)
        if 0.3 <= t < 0.42 and fired:
            gait_after.append(mpc.motion_manager.current_gait)
        return out

    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=1.2,
        mrt_frequency=50.0, mpc_frequency=25.0,
        command_fn=command_fn2, flow=mpc.model.flow_map,
    )
    assert np.isfinite(log.states).all()
    # the override took effect at the next solve (the zero-velocity FSM may
    # legitimately step back down later — documented request_gait semantics)
    assert "trot" in gait_after, f"override never applied (saw {gait_after})"
    # the inserted template must actually reach the executed schedule
    assert (log.contact_flags.sum(axis=1) < 2).any(), \
        "no single-support phases after trot override"


def test_pose_command_tracking(mpc):
    """Keyboard pose command (reference CentroidalMpcKeyboardPoseCommandNode):
    a -8 cm pelvis-height delta produces a 2-knot target the closed loop
    tracks. (Base x/y deltas are no-ops BY DESIGN: the G1 config weights
    p_base_x/y at 0 in Q and Q_final — `task.info` Q rows 6-7 — so only the
    height/orientation components of a pose command are actionable, exactly
    as in the reference.)"""
    mpc.runtime.reset()
    mpc.motion_manager.set_pose_command(np.array([0.0, 0.0, -0.08, 0.0]))
    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=1.5,
        mrt_frequency=50.0, mpc_frequency=25.0,
        command_fn=lambda t: np.zeros(4), flow=mpc.model.flow_map,
    )
    assert np.isfinite(log.states).all()
    # The pose target reaches the solver (x_ref z = 0.7125 every solve), but
    # at this fixture's miniature 0.3 s horizon the reference's own weights
    # make crouching uneconomical: the z-error saving Q_z*e^2 accrued over
    # 0.3 s cannot pay the R(qd_j)+Q(q_j) cost of bending the knees, so the
    # converged optimum descends at only ~4 mm/s (verified by cost
    # decomposition: crouching plan costs +0.53 in R rows vs -0.08 in z
    # rows). This is horizon economics, not a solver defect — at the
    # reference 1.2 s horizon the same weights descend ~5x faster (full
    # tracking asserted in test_reference_operating_point.py::
    # test_centroidal_pose_command_tracking). Here: descent must be in
    # progress, monotone, with a converged solver.
    z = log.states[:, 8]
    assert z[-1] < z[0] - 0.004, \
        f"no descent toward pose command (z {z[0]:.4f} -> {z[-1]:.4f})"
    # monotone-ish: no rebound above the hold band
    assert z.max() < z[0] + 0.004
    for s in log.solve_stats[-5:]:
        assert float(s.step_size) > 0.0
    # base xy stays put (no xy weight, no xy command)
    assert np.abs(log.states[-1, 6:8]).max() < 0.08


def test_gains_service_live_update(mpc):
    """GainsReceiver analogue: a Q update applied between solves changes the
    next solve's cost landscape (reference `GainsReceiver.cpp:44`)."""
    from wb_humanoid_mpc_tpu.mpc.gains import GainUpdate

    mpc.runtime.reset()
    s1 = mpc.runtime.advance(0.0, mpc.initial_state, np.zeros(4))
    old_solve = mpc.runtime.solve_fn
    q_orig = np.array(mpc.cfg.Q, copy=True)
    try:
        q_new = q_orig.copy()
        q_new[8] *= 100.0  # re-price base-height tracking
        mpc.gains.apply(GainUpdate(term="Q", values=q_new))
        assert mpc.runtime.solve_fn is not old_solve, "solver was not rebuilt"
        s2 = mpc.runtime.advance(0.04, mpc.initial_state, np.zeros(4))
        assert np.isfinite(s2.cost)
        assert s2.g_norm < 5e-2
    finally:
        mpc.gains.apply(GainUpdate(term="Q", values=q_orig))
        mpc.runtime.reset()


def test_mrt_pipeline_smoke(mpc):
    """Threaded solver pipeline (reference solverWorker jthread +
    MPC_MRT_Interface): observations in, policies out through the seqlock
    buffers, read-only PolicyObserver attached, clean thread shutdown."""
    import time

    from wb_humanoid_mpc_tpu.mpc.async_runtime import MrtPipeline, PolicyObserver

    mpc.runtime.reset()
    pipe = MrtPipeline(mpc.runtime, nx=mpc.initial_state.shape[0])
    obs = PolicyObserver(pipe)
    assert pipe.get_policy() is None and obs.get_policy() is None
    pipe.start()
    try:
        x = np.asarray(mpc.initial_state, dtype=float)
        deadline = time.monotonic() + 120.0
        t_sim = 0.0
        while pipe.solve_count < 3 and time.monotonic() < deadline:
            pipe.push_observation(t_sim, x, np.zeros(4))
            time.sleep(0.05)
            t_sim += 0.05
        assert pipe.solve_count >= 3, "solver thread produced no policies"
        assert not pipe.failed
        pol = pipe.get_policy()
        assert pol is not None
        x_eval, u_eval, flags = pol.evaluate(pol.t0 + 0.01)
        assert np.isfinite(x_eval).all() and np.isfinite(u_eval).all()
        # observer sees the same policy plane, read-only
        pol_obs = obs.get_policy()
        assert pol_obs is not None
        np.testing.assert_allclose(pol_obs.xs, pol.xs)
    finally:
        pipe.stop()
    assert pipe._thread is None


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
