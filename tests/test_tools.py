import io
import os

import numpy as np

from wb_humanoid_mpc_tpu.tools.benchmarks import BenchmarksPublisher, FPSTracker
from wb_humanoid_mpc_tpu.tools.commands import (
    CommandBus,
    KeyboardCommandSource,
    WalkingVelocityCommand,
)
from wb_humanoid_mpc_tpu.tools.observation_logger import ObservationLogger
from wb_humanoid_mpc_tpu.viz.visualizer import contact_corner_forces


def test_observation_logger_roundtrip(tmp_path):
    log = ObservationLogger()
    for i in range(5):
        log.log(i * 0.01, np.arange(3) + i, np.arange(2) * i, mode=3)
    path = str(tmp_path / "obs.csv")
    log.dump_csv(path)
    header, data = ObservationLogger.load_csv(path)
    assert header[0] == "time"
    assert data.shape == (5, 2 + 3 + 2)
    np.testing.assert_allclose(data[:, 0], np.arange(5) * 0.01)


def test_command_bus_and_keyboard():
    bus = CommandBus()
    kb = KeyboardCommandSource(bus, stream=io.StringIO())
    kb.handle_line("vel 0.5 -0.2 0.1")
    np.testing.assert_allclose(bus.get_velocity(), [0.5, -0.2, 0.0, 0.1])
    kb.handle_line("gait trot")
    assert bus.pop_gait_request() == "trot"
    assert bus.pop_gait_request() is None
    kb.handle_line("stop")
    np.testing.assert_allclose(bus.get_velocity(), [0, 0, 0, 0])
    # clamping
    bus.set_velocity(WalkingVelocityCommand(5.0, -5.0, 0.2, 2.0))
    np.testing.assert_allclose(bus.get_velocity(), [1.0, -1.0, 0.2, 1.0])


def test_benchmarks_publisher():
    import dataclasses

    @dataclasses.dataclass
    class S:
        solve_time: float
        reference_time: float
        cost: float
        g_norm: float
        defect_norm: float
        step_size: float

    pub = BenchmarksPublisher()
    seen = []
    pub.subscribe(lambda b: seen.append(b))
    for i in range(10):
        pub.publish(S(0.01 + 0.001 * i, 0.001, 1.0, 1e-4, 1e-5, 1.0))
    s = pub.summary()
    assert s["n_solves"] == 10
    assert 50 < s["solve_rate_hz"] < 120
    assert len(seen) == 10


def test_fps_tracker():
    tr = FPSTracker()
    t = 0.0
    for _ in range(20):
        t += 0.02
        fps = tr.tick(t)
    assert abs(fps - 50.0) < 5.0


def test_contact_corner_forces_reconstruct_wrench():
    corners = np.array([
        [-0.09, -0.03, 0.0], [0.09, -0.03, 0.0], [0.09, 0.03, 0.0], [-0.09, 0.03, 0.0]])
    wrench = np.array([1.0, 2.0, 100.0, 0.5, -0.8, 0.1])
    forces = contact_corner_forces(wrench, corners)
    # reconstruct wrench from corner forces
    f_sum = forces.sum(0)
    tau_sum = np.cross(corners, forces).sum(0)
    np.testing.assert_allclose(f_sum, wrench[:3], atol=1e-9)
    np.testing.assert_allclose(tau_sum, wrench[3:], atol=1e-9)


def test_gains_service():
    from wb_humanoid_mpc_tpu.mpc.gains import GainUpdate, GainsService
    from tests.g1_fixtures import centroidal_setup

    cfg, _, _ = centroidal_setup()
    import copy

    cfg = copy.deepcopy(cfg)
    rebuilt = []
    svc = GainsService(cfg, rebuild_solver=lambda: rebuilt.append(1))
    newQ = cfg.Q * 2.0
    svc.apply(GainUpdate(term="Q", values=newQ))
    np.testing.assert_allclose(cfg.Q, newQ)
    svc.apply(GainUpdate(term="joint_limits", mu=500.0))
    assert cfg.joint_limits_barrier.mu == 500.0
    assert len(rebuilt) == 2
