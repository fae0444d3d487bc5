"""Test fixtures. CPU backend + 8 virtual devices are enforced by the root
conftest.py (re-exec shim); x64 is enabled here for numerical oracles."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
G1_URDF = os.path.join(
    REFERENCE_ROOT, "robot_models/unitree_g1/g1_description/urdf/g1_29dof.urdf"
)
G1_MJCF = os.path.join(
    REFERENCE_ROOT, "robot_models/unitree_g1/g1_description/urdf/g1_29dof.xml"
)
G1_CENTROIDAL_TASK = os.path.join(
    REFERENCE_ROOT, "robot_models/unitree_g1/g1_centroidal_mpc/config/mpc/task.info"
)
G1_WB_TASK = os.path.join(
    REFERENCE_ROOT, "robot_models/unitree_g1/g1_wb_mpc/config/mpc/task.info"
)


@pytest.fixture(scope="session")
def g1_urdf_path():
    return G1_URDF
