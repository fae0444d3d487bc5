import numpy as np
import pytest

from wb_humanoid_mpc_tpu.models.robot.urdf import full_joint_list, load_robot_model

G1_MPC_JOINTS = [
    "left_hip_pitch_joint", "left_hip_roll_joint", "left_hip_yaw_joint",
    "left_knee_joint", "left_ankle_pitch_joint", "left_ankle_roll_joint",
    "right_hip_pitch_joint", "right_hip_roll_joint", "right_hip_yaw_joint",
    "right_knee_joint", "right_ankle_pitch_joint", "right_ankle_roll_joint",
    "waist_yaw_joint", "waist_roll_joint", "waist_pitch_joint",
    "left_shoulder_pitch_joint", "left_shoulder_roll_joint",
    "left_shoulder_yaw_joint", "left_elbow_joint",
    "right_shoulder_pitch_joint", "right_shoulder_roll_joint",
    "right_shoulder_yaw_joint", "right_elbow_joint",
]

FIXED = [
    "left_wrist_roll_joint", "left_wrist_pitch_joint", "left_wrist_yaw_joint",
    "right_wrist_roll_joint", "right_wrist_pitch_joint", "right_wrist_yaw_joint",
]


def test_full_joint_list_order(g1_urdf_path):
    """MPC joint order = full URDF DFS order minus fixed joints — must match
    the reference's initialState listing (task.info:124-158)."""
    full = full_joint_list(g1_urdf_path)
    assert len(full) == 29
    mpc = [j for j in full if j not in FIXED]
    assert mpc == G1_MPC_JOINTS


def test_g1_model_basic(g1_urdf_path):
    model = load_robot_model(g1_urdf_path, G1_MPC_JOINTS, name="g1")
    assert model.n_joints == 23
    assert model.nq == 29
    assert model.n_bodies == 24
    # G1 total mass ~ 35 kg
    assert 30.0 < model.total_mass < 40.0
    # lumping kept total mass identical to the full model
    full = load_robot_model(g1_urdf_path)
    np.testing.assert_allclose(model.total_mass, full.total_mass, rtol=1e-12)
    # ancestor mask sanity: left ankle roll body depends on all left-leg joints
    b = model.joint_index("left_ankle_roll_joint") + 1
    for jn in G1_MPC_JOINTS[:6]:
        assert model.ancestor_mask[b, 6 + model.joint_index(jn)]
    assert not model.ancestor_mask[b, 6 + model.joint_index("right_knee_joint")]
    assert model.ancestor_mask[b, :6].all()


def test_joint_limits_loaded(g1_urdf_path):
    model = load_robot_model(g1_urdf_path, G1_MPC_JOINTS)
    j = model.joint_index("left_knee_joint")
    np.testing.assert_allclose(model.joint_lower[j], -0.087267)
    np.testing.assert_allclose(model.joint_upper[j], 2.8798)
    np.testing.assert_allclose(model.joint_effort_limit[j], 139.0)


def test_contact_frame_injection(g1_urdf_path):
    model = load_robot_model(g1_urdf_path, G1_MPC_JOINTS)
    # reference contact frame: parent left_ankle_roll_joint + (0.035, 0, -0.035)
    model.add_frame("foot_l_contact", "left_ankle_roll_joint", [0.035, 0.0, -0.035])
    f = model.frames["foot_l_contact"]
    assert f.body == model.joint_index("left_ankle_roll_joint") + 1
    np.testing.assert_allclose(f.p, [0.035, 0.0, -0.035])
