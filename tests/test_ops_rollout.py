"""Pallas LQ-rollout kernel (`ops/rollout.py`) equivalence tests.

The kernel runs in interpret mode here (CPU backend); on TPU the same
kernel body lowers through Mosaic. Equivalence target: the `lax.scan`
forward pass it replaces (`solver/riccati.py::forward_pass`)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wb_humanoid_mpc_tpu.ops.rollout import forward_rollout, pallas_forward_rollout
from wb_humanoid_mpc_tpu.solver.riccati import forward_pass


def _stage_data(rng, N=28, nx=58, nu=35, dtype=np.float32):
    A = np.tile(np.eye(nx, dtype=dtype)[None], (N, 1, 1)) \
        + rng.normal(size=(N, nx, nx)).astype(dtype) * 0.005
    B = rng.normal(size=(N, nx, nu)).astype(dtype) * 0.02
    d = rng.normal(size=(N, nx)).astype(dtype) * 0.01
    K = rng.normal(size=(N, nu, nx)).astype(dtype) * 0.05
    k = rng.normal(size=(N, nu)).astype(dtype) * 0.01
    dx0 = rng.normal(size=(nx,)).astype(dtype)
    lq = types.SimpleNamespace(A=jnp.asarray(A), B=jnp.asarray(B),
                               d=jnp.asarray(d))
    sol = types.SimpleNamespace(K=jnp.asarray(K), k=jnp.asarray(k))
    return lq, sol, jnp.asarray(dx0)


@pytest.mark.parametrize("shape", [(28, 58, 35), (15, 35, 35), (7, 12, 5)])
def test_kernel_matches_scan(shape):
    N, nx, nu = shape
    lq, sol, dx0 = _stage_data(np.random.default_rng(0), N, nx, nu)
    dxs_s, dus_s = forward_pass(lq, sol, dx0)
    dxs_p, dus_p = pallas_forward_rollout(
        lq.A, lq.B, lq.d, sol.K, sol.k, dx0, interpret=True)
    scale = float(jnp.abs(dxs_s).max())
    np.testing.assert_allclose(dxs_p, dxs_s, atol=1e-5 * scale)
    np.testing.assert_allclose(dus_p, dus_s, atol=1e-5 * scale)


def test_kernel_vmap_batches():
    """vmap over the kernel (batched solver instances) matches per-element."""
    lq0, sol0, dx00 = _stage_data(np.random.default_rng(1), 10, 20, 8)
    lq1, sol1, dx01 = _stage_data(np.random.default_rng(2), 10, 20, 8)
    batch = lambda a, b: jnp.stack([a, b])  # noqa: E731
    f = jax.vmap(lambda A, B, d, K, k, x0: pallas_forward_rollout(
        A, B, d, K, k, x0, interpret=True))
    dxs_b, dus_b = f(batch(lq0.A, lq1.A), batch(lq0.B, lq1.B),
                     batch(lq0.d, lq1.d), batch(sol0.K, sol1.K),
                     batch(sol0.k, sol1.k), batch(dx00, dx01))
    for i, (lq, sol, dx0) in enumerate([(lq0, sol0, dx00), (lq1, sol1, dx01)]):
        dxs_s, dus_s = forward_pass(lq, sol, dx0)
        np.testing.assert_allclose(dxs_b[i], dxs_s, atol=1e-5)
        np.testing.assert_allclose(dus_b[i], dus_s, atol=1e-5)


def test_dispatch_auto_on_cpu_is_scan():
    """backend='auto' must fall back to the scan path off-TPU (the driver's
    multichip dryrun runs the full solver on a CPU mesh)."""
    lq, sol, dx0 = _stage_data(np.random.default_rng(3), 6, 10, 4)
    assert jax.default_backend() == "cpu"
    dxs_a, dus_a = forward_rollout(lq, sol, dx0, backend="auto")
    dxs_s, dus_s = forward_pass(lq, sol, dx0)
    np.testing.assert_allclose(np.asarray(dxs_a), np.asarray(dxs_s), atol=0)
    np.testing.assert_allclose(np.asarray(dus_a), np.asarray(dus_s), atol=0)


def test_kernel_f64_interpret():
    """Interpret mode is dtype-polymorphic (x64 oracle tier)."""
    lq, sol, dx0 = _stage_data(np.random.default_rng(4), 8, 14, 6,
                               dtype=np.float64)
    dxs_s, dus_s = forward_pass(lq, sol, dx0)
    dxs_p, dus_p = pallas_forward_rollout(
        lq.A, lq.B, lq.d, sol.K, sol.k, dx0, interpret=True)
    np.testing.assert_allclose(dxs_p, dxs_s, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(dus_p, dus_s, rtol=1e-12, atol=1e-12)
