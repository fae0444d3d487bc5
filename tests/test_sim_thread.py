"""Sim/render/control thread architecture tests (reference
`MujocoSimInterface.cpp:393+` sim thread, `MujocoRenderer` GLFW thread,
`CentroidalMpcRobotSim.cpp:45-165` three-thread process shape) and the
RViz-scene analogue (`HumanoidVisualizer.cpp:109-114`)."""

import os
import time

import numpy as np
import pytest

from tests.conftest import G1_CENTROIDAL_TASK, G1_MJCF, G1_URDF, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.core.config import load_task_config
from wb_humanoid_mpc_tpu.models.centroidal_model import CentroidalModel
from wb_humanoid_mpc_tpu.models.layout import CentroidalLayout
from wb_humanoid_mpc_tpu.models.robot.factory import build_robot_model, mpc_joint_names
from wb_humanoid_mpc_tpu.mpc.controller import JointAction
from wb_humanoid_mpc_tpu.sim.mujoco_sim import MujocoSimInterface
from wb_humanoid_mpc_tpu.sim.sim_thread import (
    MujocoRenderer,
    MujocoSimThread,
    run_threaded_robot_sim,
)

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"


def _wait_until(cond, timeout=20.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.002)
    return False


def test_sim_thread_gate_and_metrics():
    """Physics thread advances sim time up to the pacing gate, publishes
    states through the seqlock buffer, and tracks the reference sim metrics
    (fps / drift / realtime factor, `MujocoSimInterface.cpp:338-352`)."""
    sim = MujocoSimInterface(G1_MJCF)
    th = MujocoSimThread(sim, realtime=False)
    th.allowed_sim_time = 0.1
    th.start()
    try:
        assert _wait_until(lambda: th.read_state().time >= 0.1 - sim.dt)
        time.sleep(0.05)  # thread should now idle at the gate
        t_gated = th.read_state().time
        assert t_gated <= 0.1 + 2 * sim.dt, "pacing gate overrun"
        assert th.metrics.ticks >= 190
        assert th.metrics.sim_fps > 0.0
        assert th.metrics.realtime_factor != 0.0
        # open the gate further: the thread resumes
        th.allowed_sim_time = 0.15
        assert _wait_until(lambda: th.read_state().time >= 0.15 - sim.dt)
    finally:
        th.stop()


def test_sim_thread_action_flow():
    """A JointAction written on the control side reaches the physics tick:
    PD torques pull the commanded joint toward q_des."""
    sim = MujocoSimInterface(G1_MJCF)
    th = MujocoSimThread(sim, realtime=False)
    n = sim.n_joints
    q_des = np.zeros(n)
    j = sim.joint_names.index("left_knee_joint")
    q_des[j] = 0.4
    th.write_action(JointAction(
        q_des=q_des, qd_des=np.zeros(n), kp=np.full(n, 200.0),
        kd=np.full(n, 5.0), ff_effort=np.zeros(n)))
    th.allowed_sim_time = 0.15
    th.start()
    try:
        assert _wait_until(lambda: th.read_state().time >= 0.15 - sim.dt)
        st = th.read_state()
        assert st.joint_positions[j] > 0.05, \
            "commanded knee angle did not move toward q_des"
        assert isinstance(st.contact_flags[0], bool)
    finally:
        th.stop()


def test_renderer_thread_lifecycle():
    """Render thread runs alongside the physics thread; headless it degrades
    to qpos snapshots (frames stay empty without GL) but the full thread
    lifecycle — start, snapshot at fps, stop — is exercised."""
    sim = MujocoSimInterface(G1_MJCF)
    th = MujocoSimThread(sim, realtime=False)
    th.allowed_sim_time = 0.5
    renderer = MujocoRenderer(th, fps=60.0)
    th.start()
    renderer.start()
    try:
        assert _wait_until(lambda: len(renderer.snapshots) >= 3, timeout=10.0)
    finally:
        renderer.stop()
        th.stop()
    snap = renderer.snapshots[0]
    assert snap.shape == (7 + sim.n_joints,)
    if renderer.gl_available:
        assert len(renderer.frames) > 0


@pytest.fixture(scope="module")
def centroidal_model():
    probe = load_task_config(G1_CENTROIDAL_TASK, "centroidal", 1, 1)
    joints = mpc_joint_names(G1_URDF, probe.model_settings.fixed_joint_names)
    layout = CentroidalLayout(n_joints=len(joints))
    cfg = load_task_config(G1_CENTROIDAL_TASK, "centroidal",
                           layout.state_dim, layout.input_dim)
    robot = build_robot_model(G1_URDF, cfg)
    return CentroidalModel(
        robot=robot, layout=layout,
        contact_frames=tuple(cfg.model_settings.contact_names))


def test_render_scene(tmp_path, centroidal_model):
    """Current/terminal/target robots + optimized base path + foot polygons +
    corner forces + CoP render into one scene image."""
    from wb_humanoid_mpc_tpu.mpc.runtime import Policy
    from wb_humanoid_mpc_tpu.viz.visualizer import render_scene

    m = centroidal_model
    nx, nu = m.layout.state_dim, m.layout.input_dim
    x = np.zeros(nx)
    x[8] = 0.793
    x_target = x.copy()
    x_target[6] = 0.3
    xs = np.tile(x, (11, 1))
    xs[:, 6] = np.linspace(0.0, 0.3, 11)
    u = np.zeros(nu)
    total_w = float(np.sum(m.robot.mass)) * m.robot.gravity
    u[2] = u[8] = total_w / 2.0
    u[3] = 2.0  # small moment -> CoP offset
    policy = Policy(t0=0.0, dt=0.1, xs=xs, us=np.tile(u, (10, 1)),
                    contact_flags=np.ones((11, 2)))
    out = render_scene(m, x, policy=policy, x_target=x_target, u_current=u,
                      out_path=str(tmp_path / "scene.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 10_000


def test_contacts_cop():
    from wb_humanoid_mpc_tpu.viz.visualizer import contacts_cop

    p = np.array([[0.0, 0.1, 0.0], [0.0, -0.1, 0.0]])
    w = np.zeros((2, 6))
    w[:, 2] = 100.0
    cop = contacts_cop(p, w)
    np.testing.assert_allclose(cop, [0.0, 0.0, 0.0], atol=1e-12)
    w[0, 3] = 10.0  # tx on left foot -> CoP shifts +y
    cop = contacts_cop(p, w)
    assert cop[1] > 0.0
    assert contacts_cop(p, np.zeros((2, 6))) is None


@pytest.mark.slow
def test_threaded_robot_sim():
    """Three-thread robot sim: physics thread + MrtPipeline solver thread +
    control loop, faster-than-realtime with the pacing gate. The robot
    stance-holds for 1 s of sim time with no auto-resets."""
    from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
    from wb_humanoid_mpc_tpu.mpc.controller import CentroidalMrtController

    mpc = build_centroidal_mpc(
        G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
        n_nodes=15, dt_override=0.02, sqp_iterations=2)
    joint_defaults = {
        name: float(v) for name, v in zip(
            mpc.model.robot.joint_names, mpc.initial_state[12:35])}
    sim = MujocoSimInterface(
        G1_MJCF, initial_joint_positions=joint_defaults,
        initial_base_pos=(0, 0, float(mpc.initial_state[8])))
    controller = CentroidalMrtController(mpc.model)
    log, metrics, _ = run_threaded_robot_sim(
        mpc, controller, sim, duration=1.0,
        mrt_frequency=250.0, command_fn=lambda t: np.zeros(4),
        realtime=False)
    assert log.n_resets == 0, "robot fell in threaded sim"
    assert log.base_heights.min() > 0.5
    assert len(log.solve_stats) > 0, "solver thread produced no policies"
    assert metrics.ticks > 0
