"""Fused Riccati Pallas kernel (`ops/riccati.py`) equivalence tests.

The kernel runs in interpret mode here (CPU backend); on TPU the same body
lowers through Mosaic. Equivalence target: the `lax.scan` pair it replaces
(`solver/riccati.py::backward_pass` + `forward_pass`), including the
in-kernel Gauss–Jordan inverse vs the reference Cholesky solve."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wb_humanoid_mpc_tpu.ops.riccati import pallas_riccati_rollout, riccati_rollout
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass


def _lq_data(rng, N=28, nx=58, nu=11, dtype=np.float32, quu_span=1.0):
    """Random well-posed LQ stage data (SPD Quu/Qxx, near-identity A)."""
    A = np.tile(np.eye(nx, dtype=dtype)[None], (N, 1, 1)) \
        + rng.normal(size=(N, nx, nx)).astype(dtype) * 0.01
    B = rng.normal(size=(N, nx, nu)).astype(dtype) * 0.05
    d = rng.normal(size=(N, nx)).astype(dtype) * 0.01
    Wx = rng.normal(size=(N, nx, nx)).astype(dtype) * 0.1
    Qxx = Wx @ np.swapaxes(Wx, -1, -2) + 0.5 * np.eye(nx, dtype=dtype)
    Wu = rng.normal(size=(N, nu, nu)).astype(dtype) * 0.1
    # quu_span > 1 spreads the Quu diagonal across magnitudes to exercise
    # the relative regularization branch
    su = (quu_span ** rng.uniform(-1, 1, size=(N, 1, 1))).astype(dtype)
    Quu = (Wu @ np.swapaxes(Wu, -1, -2) + 0.5 * np.eye(nu, dtype=dtype)) * su
    Qux = rng.normal(size=(N, nu, nx)).astype(dtype) * 0.05
    qx = rng.normal(size=(N, nx)).astype(dtype) * 0.1
    qu = rng.normal(size=(N, nu)).astype(dtype) * 0.1
    QN = Wx[0].T @ Wx[0] + np.eye(nx, dtype=dtype)
    qN = rng.normal(size=(nx,)).astype(dtype) * 0.1
    dx0 = rng.normal(size=(nx,)).astype(dtype) * 0.1
    lq = types.SimpleNamespace(
        A=jnp.asarray(A), B=jnp.asarray(B), d=jnp.asarray(d),
        Qxx=jnp.asarray(Qxx), Quu=jnp.asarray(Quu), Qux=jnp.asarray(Qux),
        qx=jnp.asarray(qx), qu=jnp.asarray(qu),
        QN=jnp.asarray(QN), qN=jnp.asarray(qN))
    return lq, jnp.asarray(dx0)


def _scan_pair(lq, dx0, reg):
    sol = backward_pass(lq, reg)
    dxs, dus = forward_pass(lq, sol, dx0)
    return sol, dxs, dus


@pytest.mark.parametrize("shape", [(28, 58, 11), (15, 35, 12), (7, 12, 5)])
def test_kernel_matches_scan_pair(shape):
    N, nx, nu = shape
    lq, dx0 = _lq_data(np.random.default_rng(0), N, nx, nu)
    sol, dxs_s, dus_s = _scan_pair(lq, dx0, 1e-8)
    K_p, k_p, dxs_p, dus_p = pallas_riccati_rollout(
        lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu,
        lq.QN, lq.qN, dx0, reg=1e-8, interpret=True)
    np.testing.assert_allclose(K_p, sol.K, rtol=0, atol=2e-4)
    np.testing.assert_allclose(k_p, sol.k, rtol=0, atol=2e-4)
    scale = float(jnp.abs(dxs_s).max())
    np.testing.assert_allclose(dxs_p, dxs_s, atol=2e-4 * max(scale, 1.0))
    np.testing.assert_allclose(dus_p, dus_s, atol=2e-4 * max(scale, 1.0))


def test_kernel_f64_interpret_tight():
    """In x64 the Gauss–Jordan inverse must agree with the Cholesky solve to
    near machine precision — pins down algorithmic (not roundoff) drift."""
    lq, dx0 = _lq_data(np.random.default_rng(1), 10, 20, 8, dtype=np.float64)
    sol, dxs_s, dus_s = _scan_pair(lq, dx0, 1e-8)
    K_p, k_p, dxs_p, dus_p = pallas_riccati_rollout(
        lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu,
        lq.QN, lq.qN, dx0, reg=1e-8, interpret=True)
    np.testing.assert_allclose(K_p, sol.K, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(dxs_p, dxs_s, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(dus_p, dus_s, rtol=1e-9, atol=1e-10)


def test_relative_regularization_branch():
    """Quu diagonals spanning ~4 orders of magnitude: the in-kernel
    max(diag) relative damping must match backward_pass's rule exactly."""
    lq, dx0 = _lq_data(np.random.default_rng(2), 8, 14, 6,
                       dtype=np.float64, quu_span=100.0)
    sol, dxs_s, dus_s = _scan_pair(lq, dx0, 1e-6)
    _, _, dxs_p, dus_p = pallas_riccati_rollout(
        lq.A, lq.B, lq.d, lq.Qxx, lq.Quu, lq.Qux, lq.qx, lq.qu,
        lq.QN, lq.qN, dx0, reg=1e-6, interpret=True)
    np.testing.assert_allclose(dxs_p, dxs_s, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(dus_p, dus_s, rtol=1e-8, atol=1e-9)


def test_dispatch_auto_on_cpu_is_scan():
    """backend='auto' must fall back to the scan pair off-TPU (the driver's
    multichip dryrun runs the full solver on a CPU mesh)."""
    lq, dx0 = _lq_data(np.random.default_rng(3), 6, 10, 4)
    assert jax.default_backend() == "cpu"
    dxs_a, dus_a = riccati_rollout(lq, dx0, reg=1e-8, backend="auto")
    _, dxs_s, dus_s = _scan_pair(lq, dx0, 1e-8)
    np.testing.assert_allclose(np.asarray(dxs_a), np.asarray(dxs_s), atol=0)
    np.testing.assert_allclose(np.asarray(dus_a), np.asarray(dus_s), atol=0)


def test_kernel_vmap_batches():
    """vmap over the fused kernel (batched solver instances)."""
    lq0, dx00 = _lq_data(np.random.default_rng(4), 6, 12, 5)
    lq1, dx01 = _lq_data(np.random.default_rng(5), 6, 12, 5)
    stack = lambda a, b: jnp.stack([a, b])  # noqa: E731
    f = jax.vmap(lambda *ops: pallas_riccati_rollout(*ops, reg=1e-8,
                                                     interpret=True))
    _, _, dxs_b, dus_b = f(
        stack(lq0.A, lq1.A), stack(lq0.B, lq1.B), stack(lq0.d, lq1.d),
        stack(lq0.Qxx, lq1.Qxx), stack(lq0.Quu, lq1.Quu),
        stack(lq0.Qux, lq1.Qux), stack(lq0.qx, lq1.qx),
        stack(lq0.qu, lq1.qu), stack(lq0.QN, lq1.QN),
        stack(lq0.qN, lq1.qN), stack(dx00, dx01))
    for i, (lq, dx0) in enumerate([(lq0, dx00), (lq1, dx01)]):
        _, dxs_s, dus_s = _scan_pair(lq, dx0, 1e-8)
        np.testing.assert_allclose(dxs_b[i], dxs_s, atol=2e-4)
        np.testing.assert_allclose(dus_b[i], dus_s, atol=2e-4)
