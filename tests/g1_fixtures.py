"""Shared G1 model fixtures — the analogue of the reference's
`CentroidalTestingModelInterface` (reference
`humanoid_centroidal_mpc_test/include/.../CentroidalTestingModelInterface.h:43-67`):
builds the real G1 models from the real reference config files."""

from __future__ import annotations

import functools

from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, G1_WB_TASK
from wb_humanoid_mpc_tpu.core.config import load_task_config
from wb_humanoid_mpc_tpu.models.centroidal_model import CentroidalModel
from wb_humanoid_mpc_tpu.models.layout import CentroidalLayout, WBLayout
from wb_humanoid_mpc_tpu.models.robot.factory import build_robot_model, mpc_joint_names
from wb_humanoid_mpc_tpu.models.wb_model import WholeBodyModel


@functools.lru_cache(maxsize=None)
def centroidal_setup():
    fixed = ["left_wrist_roll_joint", "left_wrist_pitch_joint", "left_wrist_yaw_joint",
             "right_wrist_roll_joint", "right_wrist_pitch_joint", "right_wrist_yaw_joint"]
    n = len(mpc_joint_names(G1_URDF, fixed))
    layout = CentroidalLayout(n_joints=n)
    cfg = load_task_config(G1_CENTROIDAL_TASK, "centroidal", layout.state_dim, layout.input_dim)
    robot = build_robot_model(G1_URDF, cfg)
    model = CentroidalModel(robot=robot, layout=layout,
                            contact_frames=tuple(cfg.model_settings.contact_names))
    return cfg, robot, model


@functools.lru_cache(maxsize=None)
def wb_setup():
    fixed = ["left_wrist_roll_joint", "left_wrist_pitch_joint", "left_wrist_yaw_joint",
             "right_wrist_roll_joint", "right_wrist_pitch_joint", "right_wrist_yaw_joint"]
    n = len(mpc_joint_names(G1_URDF, fixed))
    layout = WBLayout(n_joints=n)
    cfg = load_task_config(G1_WB_TASK, "wb", layout.state_dim, layout.input_dim)
    robot = build_robot_model(G1_URDF, cfg)
    model = WholeBodyModel(robot=robot, layout=layout,
                           contact_frames=tuple(cfg.model_settings.contact_names))
    return cfg, robot, model
