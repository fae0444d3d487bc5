"""NodeParams builders: turn host-side references (gait, swing, targets) into
the per-node parameter arrays consumed by the jitted OCP.

This is the boundary between the branchy host control plane (reference
manager / swing planner, SURVEY.md §3.1 `modifyReferences`) and the static
TPU data plane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.ocp.centroidal_ocp import CentroidalOcp, NodeParams
from wb_humanoid_mpc_tpu.refs.swing import SwingReference


def weight_comp_input(total_mass: float, gravity: float, contact_flags, input_dim: int):
    """Nominal input: gravity-compensating stance forces
    (reference `DynamicsHelperFunctions.h:178-193`)."""
    contact_flags = jnp.asarray(contact_flags, dtype=jnp.float64
                                if jax.config.jax_enable_x64 else jnp.float32)
    n_stance = jnp.maximum(contact_flags.sum(-1, keepdims=True), 1.0)
    fz = total_mass * gravity / n_stance * contact_flags  # [.., 2]
    u = jnp.zeros(contact_flags.shape[:-1] + (input_dim,))
    u = u.at[..., 2].set(fz[..., 0])
    u = u.at[..., 8].set(fz[..., 1])
    return u


def make_centroidal_node_params(
    ocp: CentroidalOcp,
    swing: SwingReference,
    x_ref: jnp.ndarray,          # [N+1, nx] target states
) -> NodeParams:
    """Build per-node params for all N+1 nodes (terminal node included;
    stage terms only use the first N)."""
    model = ocp.model
    lay = model.layout
    robot = model.robot
    n1 = x_ref.shape[0]

    contact = jnp.asarray(swing.contact_flags)
    u_ref = weight_comp_input(robot.total_mass, robot.gravity, contact, lay.input_dim)

    # task-space link references evaluated at the target state
    # (reference EndEffectorKinematicsQuadraticCost::getParameters)
    ts_links = [ts.link_name for ts in ocp.cfg.task_space_costs.values()]

    def link_refs(x, u):
        q = lay.generalized_coordinates(x)
        v = model.generalized_velocity(x, lay.joint_input(u))
        fk = kin.forward_kinematics(robot, q)
        rows = []
        for ln in ts_links:
            R_l, p_l = kin.frame_transform(robot, fk, ln)
            tw = kin.frame_jacobian(robot, fk, ln) @ v
            rows.append(jnp.concatenate([p_l, R_l.reshape(-1), tw[:3], tw[3:]]))
        if not rows:
            return jnp.zeros((0, 18))
        return jnp.stack(rows)

    torso_ref = jax.vmap(link_refs)(x_ref, u_ref)

    return NodeParams(
        contact=contact,
        z_pos=jnp.asarray(swing.z_pos),
        z_vel=jnp.asarray(swing.z_vel),
        proximity=jnp.asarray(swing.proximity),
        x_ref=jnp.asarray(x_ref),
        u_ref=u_ref,
        torso_ref=torso_ref,
    )
