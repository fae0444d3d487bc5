"""float32 test tier: every solver path in the PRODUCTION numerics regime.

The suite's x64 default (tests/conftest.py) validates a regime the TPU never
runs: the driver entry, bench, and hardware all use float32. Rounds 2 and 3
shipped red driver gates that only manifested in f32. Each test here runs
with x64 disabled (`jax.enable_x64(False)`), mirroring the driver's
environment:

  - walking-schedule whole-body SQP (the dryrun problem shape),
  - sharded-vs-vmapped equivalence at the dryrun tolerance (1e-4),
  - a short centroidal dummy-sim stance hold.

(`test_wb_sqp.py::test_wb_sqp_float32_stable` covers the stance SQP.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tests.conftest import G1_CENTROIDAL_TASK, G1_URDF, REFERENCE_ROOT
from tests.test_sharded_sqp import _walking_problem
from wb_humanoid_mpc_tpu.solver.sharded_sqp import make_sharded_sqp_solver
from wb_humanoid_mpc_tpu.solver.sqp import SqpSolverConfig, make_sqp_solver

GAIT_INFO = REFERENCE_ROOT + "/humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"
CENTROIDAL_REF = REFERENCE_ROOT + "/robot_models/unitree_g1/g1_centroidal_mpc/config/command/reference.info"


def _to_f32(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype") and a.dtype.kind == "f" else a,
        tree)


def test_walking_sqp_f32():
    """Walking-schedule WB solve in f32: finite, step accepted, violation
    reduced from the cold start."""
    N = 28
    with jax.enable_x64(False):
        cfg, model, ocp, x0s, init, params, lam = _walking_problem(N, 1)
        x0, init, params, lam = _to_f32((x0s[0], jax.tree.map(lambda a: a[0], init),
                                         jax.tree.map(lambda a: a[0], params), lam[0]))
        scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=2,
                               sensitivity="node")
        solve = jax.jit(make_sqp_solver(ocp, model.flow_map,
                                        ocp.barrier_params(), scfg))
        sol = jax.block_until_ready(solve(0.0, x0, init, params, lam))
    assert np.isfinite(np.asarray(sol.traj.xs)).all()
    assert np.isfinite(float(sol.cost))
    assert float(sol.step_size) > 0.0, "no step accepted on the walking problem"
    assert float(sol.g_norm) < 0.5


def test_walking_sqp_pallas_riccati_f32():
    """The TPU production path (fused Pallas Riccati kernel,
    ops/riccati.py) vs the lax.scan pair, on the real walking-schedule
    whole-body problem in f32 — the exact code the bench runs on-chip."""
    N = 28
    with jax.enable_x64(False):
        cfg, model, ocp, x0s, init, params, lam = _walking_problem(N, 1)
        x0, init, params, lam = _to_f32((x0s[0], jax.tree.map(lambda a: a[0], init),
                                         jax.tree.map(lambda a: a[0], params), lam[0]))
        sols = {}
        for backend in ("scan", "interpret"):
            scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=2,
                                   sensitivity="node", rollout_backend=backend)
            solve = jax.jit(make_sqp_solver(ocp, model.flow_map,
                                            ocp.barrier_params(), scfg))
            sols[backend] = jax.block_until_ready(
                solve(0.0, x0, init, params, lam))
    xs_s = np.asarray(sols["scan"].traj.xs)
    xs_p = np.asarray(sols["interpret"].traj.xs)
    assert np.isfinite(xs_p).all()
    assert float(sols["interpret"].step_size) > 0.0
    np.testing.assert_allclose(xs_p, xs_s, atol=5e-3 * max(1.0, np.abs(xs_s).max()))


@pytest.mark.slow
def test_sharded_sqp_matches_vmapped_f32():
    """The driver's multichip gate, verbatim numerics: f32, walking schedule,
    2 SQP iterations, 2x4 dp x h mesh, tolerance 1e-4."""
    N, B = 28, 4
    with jax.enable_x64(False):
        cfg, model, ocp, x0s, init, params, lam = _walking_problem(N, B)
        x0s, init, params, lam = _to_f32((x0s, init, params, lam))
        scfg = SqpSolverConfig(n_nodes=N, dt=cfg.sqp.dt, sqp_iterations=2,
                               sensitivity="node")
        solve_ref = jax.jit(jax.vmap(
            make_sqp_solver(ocp, model.flow_map, ocp.barrier_params(), scfg),
            in_axes=(None, 0, 0, 0, 0)))
        sol_ref = jax.block_until_ready(solve_ref(0.0, x0s, init, params, lam))

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "h"))
        solve_sh = make_sharded_sqp_solver(ocp, model.flow_map,
                                           ocp.barrier_params(), scfg, mesh)
        sol_sh = jax.block_until_ready(solve_sh(0.0, x0s, init, params, lam))

    assert np.isfinite(np.asarray(sol_sh.cost)).all()
    err = np.max(np.abs(np.asarray(sol_sh.traj.xs) - np.asarray(sol_ref.traj.xs)))
    assert err < 1e-4, f"sharded != vmapped in f32 (max |dx| = {err:.2e})"


@pytest.mark.slow
def test_dummy_sim_stance_f32():
    """Short stance hold of the closed loop in production numerics."""
    from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc
    from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim

    with jax.enable_x64(False):
        mpc = build_centroidal_mpc(
            G1_URDF, G1_CENTROIDAL_TASK, CENTROIDAL_REF, GAIT_INFO,
            n_nodes=15, dt_override=0.02, sqp_iterations=3)
        log = run_dummy_sim(
            mpc.runtime, mpc.initial_state, duration=0.5,
            mrt_frequency=50.0, mpc_frequency=25.0,
            command_fn=lambda t: np.zeros(4),
            flow=mpc.model.flow_map)
    assert np.isfinite(log.states).all()
    np.testing.assert_allclose(log.states[:, 8], 0.7925, atol=0.03)
    assert (log.contact_flags > 0.5).all()
