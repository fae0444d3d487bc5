"""State/input layout oracles for both MPC formulations.

The TPU-native replacement of `MpcRobotModelBase<SCALAR>` virtual dispatch
(reference `MpcRobotModelBase.h:53-196`) and its concrete subclasses
(reference `CentroidalMpcRobotModel.h:52-101`, `WBAccelMpcRobotModel.h:45-95`):
plain index arithmetic over fixed-size jnp vectors; all methods are jit/vmap
safe and work on batched arrays (leading axes broadcast).

Layouts (n = number of MPC joints, G1: n = 23):

Centroidal (reference `CentroidalMpcRobotModel.h:52-74`):
    state  x = [h_com(6, normalized momentum), q_base(6), q_joints(n)]   (6+6+n)
    input  u = [W_l(6), W_r(6), qd_joints(n)]                            (12+n)

Whole-body (reference `WBAccelMpcRobotModel.h:45-70`):
    state  x = [q_base(6), q_joints(n), v_base(6), v_joints(n)]          (12+2n)
    input  u = [W_l(6), W_r(6), qdd_joints(n)]                           (12+n)

q_base = [p_xyz(3), theta_zyx(3)], v_base = [world linear vel, euler rates].
Wrenches are world-frame [force(3), torque(3)] per contact.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

N_CONTACTS = 2
WRENCH_DIM = 6


@dataclasses.dataclass(frozen=True)
class Layout:
    """Base layout contract: dims + slices shared by both formulations."""

    n_joints: int

    # --- dims ---
    @property
    def input_dim(self) -> int:
        return N_CONTACTS * WRENCH_DIM + self.n_joints

    @property
    def state_dim(self) -> int:
        raise NotImplementedError

    # --- input accessors (shared layout) ---
    def contact_wrench(self, u, contact: int):
        return u[..., 6 * contact: 6 * contact + 6]

    def contact_force(self, u, contact: int):
        return u[..., 6 * contact: 6 * contact + 3]

    def contact_torque(self, u, contact: int):
        return u[..., 6 * contact + 3: 6 * contact + 6]

    def contact_wrenches(self, u):
        """[..., N_CONTACTS, 6]"""
        return u[..., : 6 * N_CONTACTS].reshape(*u.shape[:-1], N_CONTACTS, 6)

    def joint_input(self, u):
        """Joint velocities (centroidal) / accelerations (wb)."""
        return u[..., 6 * N_CONTACTS:]

    def with_contact_force(self, u, contact: int, force):
        return u.at[..., 6 * contact: 6 * contact + 3].set(force)

    def with_joint_input(self, u, val):
        return u.at[..., 6 * N_CONTACTS:].set(val)


@dataclasses.dataclass(frozen=True)
class CentroidalLayout(Layout):
    """x = [h(6), q_base(6), q_j(n)]"""

    @property
    def state_dim(self) -> int:
        return 12 + self.n_joints

    def momentum(self, x):
        return x[..., 0:6]

    def base_pose(self, x):
        return x[..., 6:12]

    def base_position(self, x):
        return x[..., 6:9]

    def base_euler_zyx(self, x):
        return x[..., 9:12]

    def joint_angles(self, x):
        return x[..., 12:]

    def generalized_coordinates(self, x):
        """q = [p, theta, q_j] for the rigid-body engine."""
        return x[..., 6:]

    def with_momentum(self, x, h):
        return x.at[..., 0:6].set(h)

    def with_base_pose(self, x, pose):
        return x.at[..., 6:12].set(pose)

    def with_joint_angles(self, x, qj):
        return x.at[..., 12:].set(qj)

    def assemble(self, h, base_pose, qj):
        return jnp.concatenate([h, base_pose, qj], axis=-1)


@dataclasses.dataclass(frozen=True)
class WBLayout(Layout):
    """x = [q_base(6), q_j(n), v_base(6), v_j(n)]"""

    @property
    def state_dim(self) -> int:
        return 12 + 2 * self.n_joints

    @property
    def nq(self) -> int:
        return 6 + self.n_joints

    def base_pose(self, x):
        return x[..., 0:6]

    def base_position(self, x):
        return x[..., 0:3]

    def base_euler_zyx(self, x):
        return x[..., 3:6]

    def joint_angles(self, x):
        return x[..., 6: 6 + self.n_joints]

    def base_velocity(self, x):
        n = self.n_joints
        return x[..., 6 + n: 12 + n]

    def joint_velocities(self, x):
        n = self.n_joints
        return x[..., 12 + n:]

    def generalized_coordinates(self, x):
        return x[..., : 6 + self.n_joints]

    def generalized_velocities(self, x):
        return x[..., 6 + self.n_joints:]

    def with_base_pose(self, x, pose):
        return x.at[..., 0:6].set(pose)

    def with_joint_angles(self, x, qj):
        return x.at[..., 6: 6 + self.n_joints].set(qj)

    def assemble(self, q, v):
        return jnp.concatenate([q, v], axis=-1)
