import numpy as np

from tests.conftest import G1_CENTROIDAL_TASK, G1_WB_TASK, REFERENCE_ROOT
from wb_humanoid_mpc_tpu.core.config import (
    load_gait_library,
    load_reference_config,
    load_task_config,
)

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"


def test_centroidal_task_config():
    cfg = load_task_config(G1_CENTROIDAL_TASK, "centroidal", 35, 35)
    assert cfg.centroidal_model_type == 0
    assert cfg.model_settings.robot_name == "g1"
    assert cfg.model_settings.fixed_joint_names == [
        "left_wrist_roll_joint", "left_wrist_pitch_joint", "left_wrist_yaw_joint",
        "right_wrist_roll_joint", "right_wrist_pitch_joint", "right_wrist_yaw_joint"]
    assert cfg.model_settings.contact_names == ["foot_l_contact", "foot_r_contact"]
    assert cfg.model_settings.contact_parent_joint_names == [
        "left_ankle_roll_joint", "right_ankle_roll_joint"]
    assert cfg.model_settings.foot_constraint.orientation_error_gain == 20.0
    assert cfg.sqp.dt == 0.02
    assert cfg.sqp.sqp_iteration == 1
    assert cfg.mpc.time_horizon == 1.2
    assert cfg.mpc.mpc_desired_frequency == 80
    # Q diag spot checks (task.info Q block)
    np.testing.assert_allclose(cfg.Q[0], 8.0)
    np.testing.assert_allclose(cfg.Q[8], 15.0)
    np.testing.assert_allclose(cfg.Q[14], 4.0)
    # R has 1e-3 scaling applied
    np.testing.assert_allclose(cfg.R[0], 0.05e-3)
    np.testing.assert_allclose(cfg.R[24], 2000.0e-3)
    np.testing.assert_allclose(cfg.Q_final[0], 25.0)
    assert cfg.terminal_cost_scaling == 3.0
    # initial state
    np.testing.assert_allclose(cfg.initial_state[8], 0.7925)
    np.testing.assert_allclose(cfg.initial_state[12], -0.05)
    # contacts
    np.testing.assert_allclose(cfg.contacts.contact_frame_translation, [0.035, 0.0, -0.035])
    assert cfg.contacts.friction_coefficient == 0.4
    assert cfg.contacts.friction_cone_barrier.mu == 0.2
    assert cfg.contacts.contact_moment_barrier.delta == 0.03
    assert cfg.joint_limits_barrier.mu == 1200.0
    assert cfg.collision.foot_radius == 0.065
    assert cfg.collision.barrier.mu == 30000
    # task-space costs
    assert "torso" in cfg.task_space_costs
    assert cfg.task_space_costs["torso"].link_name == "mid360_link"
    np.testing.assert_allclose(cfg.task_space_costs["torso"].weights[3], 100.0)
    np.testing.assert_allclose(cfg.task_space_foot_cost_weights[3], 1000.0)
    # leg torque costs with 1e-4 scaling
    lt = cfg.leg_torque_costs["left_leg_torque_cost"]
    assert lt.active_joint_names[0] == "left_hip_pitch_joint"
    np.testing.assert_allclose(lt.weights[3], 8.0e-4)


def test_wb_task_config():
    cfg = load_task_config(G1_WB_TASK, "wb", 58, 35)
    assert cfg.sqp.dt == 0.035
    assert cfg.mpc.time_horizon == 1.1
    assert cfg.mpc.mpc_desired_frequency == 60
    np.testing.assert_allclose(cfg.Q[2], 10.0)
    np.testing.assert_allclose(cfg.Q[29], 3.0)
    np.testing.assert_allclose(cfg.Q[35], 0.001)
    np.testing.assert_allclose(cfg.R[12], 0.005e-3)
    np.testing.assert_allclose(cfg.initial_state[2], 0.8)
    assert cfg.terminal_cost_scaling == 4.0
    assert cfg.model_settings.foot_constraint.position_error_gain_z == 100.0
    assert not cfg.task_space_costs  # wb task has none
    assert cfg.collision.foot_radius == 0.05


def test_gait_library():
    gaits = load_gait_library(GAIT_INFO)
    assert len(gaits) == 15
    walk = gaits["walk"]
    np.testing.assert_allclose(walk.switching_times, [0.0, 0.6, 0.7, 1.3, 1.4])
    # LF=2 (left stance / right swing), STANCE=3
    np.testing.assert_array_equal(walk.mode_sequence, [2, 3, 1, 3])
    assert gaits["stance"].mode_sequence.tolist() == [3]
    assert gaits["run"].mode_sequence.tolist() == [2, 0, 1, 0]


def test_reference_config():
    ref = load_reference_config(CENTROIDAL_REF, 23)
    assert ref.max_displacement_velocity_x == 2.4
    assert ref.default_base_height == 0.7925
    np.testing.assert_allclose(ref.default_joint_state[3], 0.1)  # left knee
    assert ref.default_template.mode_sequence.tolist() == [3]
    np.testing.assert_allclose(ref.default_template.switching_times, [0.0, 0.5])
    assert ref.initial_mode_schedule_modes.tolist() == [3, 3]
