"""Riccati solvers: sequential scan vs associative-scan parallel version, and
both against a dense QP solve of the same LQ problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wb_humanoid_mpc_tpu.solver.priccati import parallel_backward_pass, parallel_forward_pass
from wb_humanoid_mpc_tpu.solver.riccati import backward_pass, forward_pass
from wb_humanoid_mpc_tpu.solver.transcription import LQApprox


def random_lq(rng, N=12, nx=6, nu=3):
    A = jnp.asarray(rng.standard_normal((N, nx, nx)) * 0.3 + np.eye(nx))
    B = jnp.asarray(rng.standard_normal((N, nx, nu)) * 0.4)
    d = jnp.asarray(rng.standard_normal((N, nx)) * 0.1)
    Qh = rng.standard_normal((N, nx, nx)) * 0.3
    Qxx = jnp.asarray(Qh @ Qh.transpose(0, 2, 1) + np.eye(nx)[None] * 1.0)
    Rh = rng.standard_normal((N, nu, nu)) * 0.3
    Quu = jnp.asarray(Rh @ Rh.transpose(0, 2, 1) + np.eye(nu)[None] * 1.0)
    Qux = jnp.asarray(rng.standard_normal((N, nu, nx)) * 0.1)
    qx = jnp.asarray(rng.standard_normal((N, nx)))
    qu = jnp.asarray(rng.standard_normal((N, nu)))
    QNh = rng.standard_normal((nx, nx))
    QN = jnp.asarray(QNh @ QNh.T + np.eye(nx))
    qN = jnp.asarray(rng.standard_normal(nx))
    return LQApprox(A=A, B=B, d=d, Qxx=Qxx, Quu=Quu, Qux=Qux, qx=qx, qu=qu,
                    QN=QN, qN=qN, cost=jnp.zeros(()), g_norm=jnp.zeros(()),
                    defect_norm=jnp.zeros(()))


def dense_solve(lq, dx0):
    """Solve the same equality-constrained QP densely (ground truth)."""
    N, nx = lq.A.shape[0], lq.A.shape[1]
    nu = lq.B.shape[2]
    nz = (N + 1) * nx + N * nu

    def xi(k):
        return slice(k * nx, (k + 1) * nx)

    def ui(k):
        return slice((N + 1) * nx + k * nu, (N + 1) * nx + (k + 1) * nu)

    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        H[xi(k), xi(k)] += np.asarray(lq.Qxx[k])
        H[ui(k), ui(k)] += np.asarray(lq.Quu[k])
        H[ui(k), xi(k)] += np.asarray(lq.Qux[k])
        H[xi(k), ui(k)] += np.asarray(lq.Qux[k]).T
        g[xi(k)] += np.asarray(lq.qx[k])
        g[ui(k)] += np.asarray(lq.qu[k])
    H[xi(N), xi(N)] += np.asarray(lq.QN)
    g[xi(N)] += np.asarray(lq.qN)

    # constraints: dx_0 = dx0 ; dx_{k+1} = A dx_k + B du_k + d
    nc = (N + 1) * nx
    C = np.zeros((nc, nz))
    b = np.zeros(nc)
    C[0:nx, xi(0)] = np.eye(nx)
    b[0:nx] = np.asarray(dx0)
    for k in range(N):
        r = slice((k + 1) * nx, (k + 2) * nx)
        C[r, xi(k + 1)] = -np.eye(nx)
        C[r, xi(k)] = np.asarray(lq.A[k])
        C[r, ui(k)] = np.asarray(lq.B[k])
        b[r] = -np.asarray(lq.d[k])

    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([-g, b])
    sol = np.linalg.solve(KKT, rhs)
    dxs = sol[: (N + 1) * nx].reshape(N + 1, nx)
    dus = sol[(N + 1) * nx: nz].reshape(N, nu)
    return dxs, dus


@pytest.mark.parametrize("seed", [0, 1])
def test_sequential_riccati_matches_dense(seed):
    rng = np.random.default_rng(seed)
    lq = random_lq(rng)
    dx0 = jnp.asarray(rng.standard_normal(6) * 0.5)
    sol = backward_pass(lq, reg=0.0)
    dxs, dus = forward_pass(lq, sol, dx0)
    dxs_d, dus_d = dense_solve(lq, dx0)
    np.testing.assert_allclose(np.asarray(dxs), dxs_d, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dus), dus_d, atol=1e-8)


@pytest.mark.parametrize("seed", [0, 3])
def test_parallel_riccati_matches_sequential(seed):
    rng = np.random.default_rng(seed)
    lq = random_lq(rng, N=17)
    dx0 = jnp.asarray(rng.standard_normal(6) * 0.5)

    sol_seq = backward_pass(lq, reg=0.0)
    sol_par = parallel_backward_pass(lq, reg=0.0)
    np.testing.assert_allclose(np.asarray(sol_par.P), np.asarray(sol_seq.P), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_par.p), np.asarray(sol_seq.p), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_par.K), np.asarray(sol_seq.K), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_par.k), np.asarray(sol_seq.k), atol=1e-7)

    dxs_s, dus_s = forward_pass(lq, sol_seq, dx0)
    dxs_p, dus_p = parallel_forward_pass(lq, sol_par, dx0)
    np.testing.assert_allclose(np.asarray(dxs_p), np.asarray(dxs_s), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dus_p), np.asarray(dus_s), atol=1e-7)


def dense_solve_eq(lq, Cx, Du, g, dx0):
    """Dense KKT including per-node equality constraints g + Cx dx + Du du = 0."""
    N, nx = lq.A.shape[0], lq.A.shape[1]
    nu = lq.B.shape[2]
    nc = Du.shape[1]
    nz = (N + 1) * nx + N * nu

    def xi(k):
        return slice(k * nx, (k + 1) * nx)

    def ui(k):
        return slice((N + 1) * nx + k * nu, (N + 1) * nx + (k + 1) * nu)

    H = np.zeros((nz, nz))
    gvec = np.zeros(nz)
    for k in range(N):
        H[xi(k), xi(k)] += np.asarray(lq.Qxx[k])
        H[ui(k), ui(k)] += np.asarray(lq.Quu[k])
        H[ui(k), xi(k)] += np.asarray(lq.Qux[k])
        H[xi(k), ui(k)] += np.asarray(lq.Qux[k]).T
        gvec[xi(k)] += np.asarray(lq.qx[k])
        gvec[ui(k)] += np.asarray(lq.qu[k])
    H[xi(N), xi(N)] += np.asarray(lq.QN)
    gvec[xi(N)] += np.asarray(lq.qN)

    n_dyn = (N + 1) * nx
    n_eqc = N * nc
    C = np.zeros((n_dyn + n_eqc, nz))
    b = np.zeros(n_dyn + n_eqc)
    C[0:nx, xi(0)] = np.eye(nx)
    b[0:nx] = np.asarray(dx0)
    for k in range(N):
        r = slice((k + 1) * nx, (k + 2) * nx)
        C[r, xi(k + 1)] = -np.eye(nx)
        C[r, xi(k)] = np.asarray(lq.A[k])
        C[r, ui(k)] = np.asarray(lq.B[k])
        b[r] = -np.asarray(lq.d[k])
        rc = slice(n_dyn + k * nc, n_dyn + (k + 1) * nc)
        C[rc, xi(k)] = np.asarray(Cx[k])
        C[rc, ui(k)] = np.asarray(Du[k])
        b[rc] = -np.asarray(g[k])

    KKT = np.block([[H, C.T], [C, np.zeros((C.shape[0], C.shape[0]))]])
    rhs = np.concatenate([-gvec, b])
    sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
    dxs = sol[: (N + 1) * nx].reshape(N + 1, nx)
    dus = sol[(N + 1) * nx: nz].reshape(N, nu)
    return dxs, dus


def test_projection_matches_dense_equality_qp():
    """Null-space projected Riccati == dense equality-constrained QP (full-rank
    constraints; dx0 = 0 so the x0-dependent particular solutions agree)."""
    from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls

    rng = np.random.default_rng(7)
    N, nx, nu, nc = 10, 6, 4, 2
    lq = random_lq(rng, N=N, nx=nx, nu=nu)
    Cx = jnp.asarray(rng.standard_normal((N, nc, nx)) * 0.3)
    Du = jnp.asarray(rng.standard_normal((N, nc, nu)))
    g = jnp.asarray(rng.standard_normal((N, nc)) * 0.1)
    dx0 = jnp.zeros(nx)

    reduced, proj = project_lq(lq, Cx, Du, g, eps=1e-12)
    sol = backward_pass(reduced, reg=0.0)
    dxs, dzs = forward_pass(reduced, sol, dx0)
    dus = recover_controls(proj, dxs, dzs)

    dxs_d, dus_d = dense_solve_eq(lq, Cx, Du, g, dx0)
    np.testing.assert_allclose(np.asarray(dxs), dxs_d, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dus), dus_d, atol=1e-6)
    # constraints satisfied
    res = np.einsum("kij,kj->ki", np.asarray(Cx), np.asarray(dxs)[:-1]) + \
        np.einsum("kij,kj->ki", np.asarray(Du), np.asarray(dus)) + np.asarray(g)
    np.testing.assert_allclose(res, 0.0, atol=1e-8)


def test_projection_masked_rows():
    """Zero (masked) constraint rows must not corrupt the solve."""
    from wb_humanoid_mpc_tpu.solver.projection import project_lq, recover_controls

    rng = np.random.default_rng(8)
    N, nx, nu, nc = 6, 5, 4, 2
    lq = random_lq(rng, N=N, nx=nx, nu=nu)
    Cx = np.asarray(rng.standard_normal((N, nc, nx)) * 0.3)
    Du = np.asarray(rng.standard_normal((N, nc, nu)))
    g = np.asarray(rng.standard_normal((N, nc)) * 0.1)
    # mask the second row on half the nodes
    for k in range(0, N, 2):
        Cx[k, 1] = 0.0
        Du[k, 1] = 0.0
        g[k, 1] = 0.0
    reduced, proj = project_lq(lq, jnp.asarray(Cx), jnp.asarray(Du), jnp.asarray(g))
    sol = backward_pass(reduced, reg=0.0)
    dxs, dzs = forward_pass(reduced, sol, jnp.zeros(nx))
    dus = recover_controls(proj, dxs, dzs)
    assert np.isfinite(np.asarray(dxs)).all()
    assert np.isfinite(np.asarray(dus)).all()
    # active rows satisfied
    res = np.einsum("kij,kj->ki", Cx, np.asarray(dxs)[:-1]) + \
        np.einsum("kij,kj->ki", Du, np.asarray(dus)) + g
    np.testing.assert_allclose(res, 0.0, atol=1e-6)
