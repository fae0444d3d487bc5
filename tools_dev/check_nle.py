"""Verify Newton-Euler nle against the Lagrangian-AD identity (x64, CPU)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from __graft_entry__ import _wb_setup
from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models.kinematics import forward_kinematics, all_body_jacobians

cfg, model = _wb_setup()
robot = model.robot
rng = np.random.default_rng(0)

def nle_lagrangian(robot, q, v):
    Mv = lambda q_: dyn.mass_matrix(robot, q_) @ v
    _, dMv = jax.jvp(Mv, (q,), (v,))
    gradT = jax.grad(lambda q_: dyn.kinetic_energy(robot, q_, v))(q)
    gradV = jax.grad(lambda q_: dyn.potential_energy(robot, q_))(q)
    return dMv - gradT + gradV

maxerr = 0.0
for i in range(5):
    q = jnp.asarray(np.concatenate([rng.standard_normal(3),
                                    0.4 * rng.standard_normal(3),
                                    0.5 * rng.standard_normal(robot.nq - 6)]))
    v = jnp.asarray(rng.standard_normal(robot.nq))
    a = nle_lagrangian(robot, q, v)
    b = dyn.nonlinear_effects(robot, q, v)
    err = float(jnp.max(jnp.abs(a - b)) / (1.0 + jnp.max(jnp.abs(a))))
    maxerr = max(maxerr, err)
    print(f"case {i}: rel err {err:.3e}")
print("max rel err:", maxerr)
assert maxerr < 1e-10, "Newton-Euler nle mismatch"

# also check fused FK+vel pass returns identical FK
from wb_humanoid_mpc_tpu.models.kinematics import forward_kinematics_vel
q = jnp.asarray(np.concatenate([rng.standard_normal(3), 0.3*rng.standard_normal(3),
                                0.5*rng.standard_normal(robot.nq-6)]))
v = jnp.asarray(rng.standard_normal(robot.nq))
fk1 = forward_kinematics(robot, q)
fk2, vb = forward_kinematics_vel(robot, q, v)
for name in ("R", "p", "joint_axis_w", "joint_origin_w", "E_base"):
    np.testing.assert_allclose(np.asarray(getattr(fk1, name)),
                               np.asarray(getattr(fk2, name)), atol=1e-12)
# velocity check: v_o/omega must equal J v
J = all_body_jacobians(robot, fk1)
tw = jnp.einsum("brn,n->br", J, v)
np.testing.assert_allclose(np.asarray(vb.v_o), np.asarray(tw[:, :3]), atol=1e-10)
np.testing.assert_allclose(np.asarray(vb.omega), np.asarray(tw[:, 3:]), atol=1e-10)
# bias check: a = d/dt(J v) with qdd=0 -> finite-diff J(q+eps*v) v
eps = 1e-7
fkp = forward_kinematics(robot, q + eps * v)
Jp = all_body_jacobians(robot, fkp)
twp = jnp.einsum("brn,n->br", Jp, v)
bias_fd = (twp - tw) / eps
g = np.zeros(3); g[2] = robot.gravity
np.testing.assert_allclose(np.asarray(vb.a_o - jnp.asarray(g)),
                           np.asarray(bias_fd[:, :3]), atol=1e-5)
np.testing.assert_allclose(np.asarray(vb.domega), np.asarray(bias_fd[:, 3:]), atol=1e-5)
print("FK/vel/bias identities OK")
