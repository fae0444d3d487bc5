"""MuJoCo simulation interface (the `robot_runtime` equivalent).

Re-provides the reference's `MujocoSimInterface`
(`MujocoSimInterface.{h,cpp}`: dt=0.5 ms physics, per-step PD+ff torque
application, `RobotState` extraction with local-frame base velocities, contact
flags, auto-reset when base z < 0.2 m — `MujocoSimInterface.cpp:313-388`).
Physics advances via `apply_action_and_step`: synchronously from
`sim/closed_loop.py`, or on the dedicated 2 kHz physics thread in
`sim/sim_thread.py` (`MujocoSimThread`, the reference's sim-thread
architecture). Loads the reference's MJCF G1 model directly. Contact flags are read from the MuJoCo contact table
(improves on the reference's hard-coded-true placeholder,
`MujocoSimInterface.cpp:313-318`).
"""

from __future__ import annotations

import dataclasses

import mujoco
import numpy as np

from wb_humanoid_mpc_tpu.mpc.controller import JointAction


@dataclasses.dataclass
class RobotState:
    """(reference `robot_model/RobotState.h:30-76`)"""
    time: float
    base_position: np.ndarray       # world
    base_quat_wxyz: np.ndarray      # local -> world
    base_lin_vel_local: np.ndarray
    base_ang_vel_local: np.ndarray
    joint_positions: np.ndarray     # full model order
    joint_velocities: np.ndarray
    contact_flags: list[bool]


class MujocoSimInterface:
    RESET_HEIGHT = 0.2  # reference MujocoSimInterface.cpp:372-388

    def __init__(self, mjcf_path: str, dt: float = 5e-4,
                 initial_base_pos=(0.0, 0.0, 0.793),
                 initial_joint_positions: dict[str, float] | None = None):
        self.model = mujoco.MjModel.from_xml_path(mjcf_path)
        self.model.opt.timestep = dt
        self.data = mujoco.MjData(self.model)
        self.dt = dt

        self.joint_names = [
            mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_JOINT, i)
            for i in range(self.model.njnt)
            if self.model.jnt_type[i] == mujoco.mjtJoint.mjJNT_HINGE
        ]
        self.n_joints = len(self.joint_names)
        # actuator i -> joint index in our list
        self._act_joint_idx = []
        for i in range(self.model.nu):
            jid = self.model.actuator_trnid[i, 0]
            name = mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_JOINT, jid)
            self._act_joint_idx.append(self.joint_names.index(name))
        # body ids of the ankle-roll (foot) links for contact-flag extraction
        self._foot_body_ids = []
        for side in ("left", "right"):
            bid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY,
                                    f"{side}_ankle_roll_link")
            self._foot_body_ids.append(bid)
        self._init_base_pos = np.asarray(initial_base_pos, dtype=float)
        self._init_qj = np.zeros(self.n_joints)
        if initial_joint_positions:
            for k, v in initial_joint_positions.items():
                self._init_qj[self.joint_names.index(k)] = v
        self.n_resets = 0
        self.reset()

    # ---- lifecycle ----
    def reset(self) -> None:
        mujoco.mj_resetData(self.model, self.data)
        self.data.qpos[:3] = self._init_base_pos
        self.data.qpos[3:7] = [1.0, 0.0, 0.0, 0.0]
        self.data.qpos[7:] = self._init_qj
        mujoco.mj_forward(self.model, self.data)

    # ---- stepping ----
    def apply_action_and_step(self, action_full: JointAction, n_steps: int = 1) -> None:
        """PD+ff torque per actuator, then step physics
        (reference `MujocoSimInterface.cpp:357-370`)."""
        for _ in range(n_steps):
            qj = self.data.qpos[7:]
            qdj = self.data.qvel[6:]
            tau = action_full.total_torque(qj, qdj)
            for i, j in enumerate(self._act_joint_idx):
                self.data.ctrl[i] = tau[j]
            mujoco.mj_step(self.model, self.data)
            if self.data.qpos[2] < self.RESET_HEIGHT:
                self.n_resets += 1
                self.reset()
                break

    # ---- state extraction ----
    def get_state(self) -> RobotState:
        d = self.data
        quat = d.qpos[3:7].copy()
        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, quat)
        R = R.reshape(3, 3)
        v_world = d.qvel[0:3].copy()
        omega_local = d.qvel[3:6].copy()  # mujoco free joint: angular vel is body-local
        v_local = R.T @ v_world
        contact_flags = self._foot_contacts()
        return RobotState(
            time=float(d.time),
            base_position=d.qpos[0:3].copy(),
            base_quat_wxyz=quat,
            base_lin_vel_local=v_local,
            base_ang_vel_local=omega_local,
            joint_positions=d.qpos[7:].copy(),
            joint_velocities=d.qvel[6:].copy(),
            contact_flags=contact_flags,
        )

    def _foot_contacts(self) -> list[bool]:
        """Per-foot contact flags from the MuJoCo contact table (the reference
        hard-codes these true, `MujocoSimInterface.cpp:313-318`; reading the
        actual contacts makes contact-aware observation possible)."""
        flags = [False, False]
        for c in range(self.data.ncon):
            con = self.data.contact[c]
            for g in (con.geom1, con.geom2):
                b = int(self.model.geom_bodyid[g])
                for i, fb in enumerate(self._foot_body_ids):
                    if b == fb:
                        flags[i] = True
        return flags
