"""Record the dp x h virtual-mesh point into SCALING_r04.json.

Runs the horizon+batch sharded SQP solver (`solver/sharded_sqp.py`) on the
8-virtual-device CPU mesh laid out by `parallel/multihost.make_mpc_mesh`
(emulated 2 hosts x 4 devices), times repeated warm solves, and appends the
point — flagged as a topology/shape validation point, NOT a performance
number (virtual CPU devices share two physical cores)."""
import os, sys, json, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input, make_wb_node_params
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp
from wb_humanoid_mpc_tpu.parallel.multihost import make_mpc_mesh, mesh_report
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sharded_sqp import make_sharded_sqp_solver
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory

cfg, model = _wb_setup()
ocp = WholeBodyOcp(model=model, cfg=cfg)
N = 28
solver_cfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=2)
mesh = make_mpc_mesh(devices_per_host=4)   # emulated 2 hosts x 4 chips
B = 2 * mesh.shape["dp"]

flags = np.ones((N + 1, 2))
phase = (np.arange(N + 1) // 7) % 4
flags[phase == 1, 0] = 0.0
flags[phase == 3, 1] = 0.0
zs = 0.04 * np.sin(np.pi * ((np.arange(N + 1) % 7) / 7.0))[:, None] * (flags < 0.5)
swing = SwingReference(contact_flags=flags, z_pos=zs,
                       z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
                       proximity=np.where(flags > 0.5, 1.0, 0.3))
x0 = jnp.asarray(cfg.initial_state)
params1 = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
params = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), params1)
u0 = weight_comp_input(model.robot.total_mass, model.robot.gravity,
                       jnp.ones(2), model.layout.input_dim)
rng = np.random.default_rng(0)
x0s = jnp.tile(x0, (B, 1)) + jnp.asarray(rng.standard_normal((B, x0.shape[0])) * 0.003)
init = Trajectory(xs=jnp.tile(x0, (B, N + 1, 1)), us=jnp.tile(u0, (B, N, 1)))
lam = jnp.zeros((B, N, ocp.n_eq))

solve = make_sharded_sqp_solver(ocp, model.flow_map, ocp.barrier_params(),
                                solver_cfg, mesh)
sol = jax.block_until_ready(solve(0.0, x0s, init, params, lam))
traj, lam_w = sol.traj, sol.lam
n_rounds = 5
t0 = time.perf_counter()
for _ in range(n_rounds):
    sol = solve(0.0, x0s, traj, params, lam_w)
    traj, lam_w = sol.traj, sol.lam
jax.block_until_ready(sol)
dt = (time.perf_counter() - t0) / n_rounds

point = {
    "kind": "virtual dp x h mesh point (topology/shape validation, CPU — "
            "NOT a TPU performance number)",
    "mesh": mesh_report(mesh),
    "batch": B,
    "n_nodes": N,
    "sqp_iterations": 2,
    "schedule": "walking (DS/LS/DS/RS)",
    "round_time_s": dt,
    "instances_per_s": B / dt,
    "finite": bool(np.isfinite(np.asarray(sol.cost)).all()),
}
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "SCALING_r04.json")
data = json.load(open(path))
data["virtual_mesh_point"] = point
json.dump(data, open(path, "w"), indent=2)
print(json.dumps(point, indent=2))
