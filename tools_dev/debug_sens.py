"""Compare sensitivity modes on the WB stance problem (regression hunt)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tests.g1_fixtures import wb_setup
from wb_humanoid_mpc_tpu.ocp.params import weight_comp_input
from wb_humanoid_mpc_tpu.ocp.wb_ocp import WholeBodyOcp, make_wb_node_params
from wb_humanoid_mpc_tpu.refs.swing import SwingReference
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver
from wb_humanoid_mpc_tpu.solver.transcription import Trajectory
from wb_humanoid_mpc_tpu.models import kinematics as kin

N = 10
cfg, robot, model = wb_setup()
ocp = WholeBodyOcp(model=model, cfg=cfg)
x0 = jnp.asarray(cfg.initial_state, dtype=jnp.float64)
q0 = model.layout.generalized_coordinates(x0)
fk = kin.forward_kinematics(model.robot, q0)
foot_z = float(kin.frame_transform(model.robot, fk, model.contact_frames[0])[1][2])
swing = SwingReference(
    contact_flags=np.ones((N + 1, 2)), z_pos=np.full((N + 1, 2), foot_z),
    z_vel=np.zeros((N + 1, 2)), z_acc=np.zeros((N + 1, 2)),
    proximity=np.ones((N + 1, 2)))
params = make_wb_node_params(ocp, swing, jnp.tile(x0, (N + 1, 1)))
u0 = weight_comp_input(robot.total_mass, robot.gravity, jnp.ones(2), model.layout.input_dim)
init = Trajectory(xs=jnp.tile(x0, (N + 1, 1)), us=jnp.tile(u0, (N, 1)))
lam = jnp.zeros((N, ocp.n_eq))

for mode in sys.argv[1:] or ["node", "exact"]:
    scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=3, reg=1e-6,
                           sensitivity=mode)
    solve = jax.jit(make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg))
    t0 = time.time()
    sol = jax.block_until_ready(solve(0.0, x0, init, params, lam))
    print(f"mode={mode}: compile+run {time.time()-t0:.1f}s  cost={float(sol.cost):.4f} "
          f"defect={float(sol.defect_norm):.2e} g={float(sol.g_norm):.2e} "
          f"alpha={float(sol.step_size)}", flush=True)
