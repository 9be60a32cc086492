"""MINRES / Richardson / Chebyshev KSP types (parity:
``/root/reference/Solver/utils.py:96-128`` KSPType breadth)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.solver.linear import KSPType, chebyshev, minres, richardson, solve


def _sym_indefinite(n=120, seed=0):
    """Symmetric indefinite saddle-like matrix [[A, B^T], [B, 0]]."""
    rng = np.random.default_rng(seed)
    m = n // 3
    A = rng.standard_normal((n - m, n - m))
    A = A @ A.T + (n - m) * np.eye(n - m)
    B = rng.standard_normal((m, n - m))
    K = np.block([[A, B.T], [B, np.zeros((m, m))]])
    return K


def _spd(n=200, seed=1):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=0.05, random_state=np.random.RandomState(seed))
    A = A @ A.T + 5 * sp.identity(n)
    return A.toarray()


def test_minres_symmetric_indefinite():
    K = _sym_indefinite()
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(K.shape[0])
    b = jnp.asarray(K @ x_true)
    Kj = jnp.asarray(K)
    res = minres(lambda v: Kj @ v, b, tol=1e-10, maxiter=500)
    assert bool(res.converged), float(res.residual)
    # true-residual check (x-error is condition-number amplified)
    rel = np.linalg.norm(K @ np.asarray(res.x) - np.asarray(b)) / np.linalg.norm(b)
    assert rel < 1e-8, rel


def test_minres_preconditioned():
    A = _spd()
    d = jnp.asarray(1.0 / np.diag(A))
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    res_pc = minres(lambda v: Aj @ v, b, tol=1e-11, maxiter=400, M=lambda r: d * r)
    assert bool(res_pc.converged)
    np.testing.assert_allclose(np.asarray(res_pc.x), x_true, rtol=1e-8, atol=1e-8)


def test_richardson_jacobi():
    A = _spd()
    d = jnp.asarray(1.0 / np.diag(A))
    rng = np.random.default_rng(4)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    s = 1.0 / np.sqrt(np.diag(A))
    lmax = np.linalg.eigvalsh(s[:, None] * A * s[None, :]).max()
    res = richardson(lambda v: Aj @ v, b, omega=float(1.5 / lmax), tol=1e-10,
                     maxiter=5000, M=lambda r: d * r)
    assert bool(res.converged), float(res.residual)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-7)


def test_chebyshev_with_bounds():
    A = _spd()
    w = np.linalg.eigvalsh(A)
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    res = chebyshev(lambda v: Aj @ v, b, lmin=float(w[0]), lmax=float(w[-1]),
                    tol=1e-10, maxiter=2000)
    assert bool(res.converged), float(res.residual)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-7)
    # Chebyshev beats Richardson at equal spectral information
    res_r = richardson(lambda v: Aj @ v, b, omega=float(2 / (w[0] + w[-1])),
                       tol=1e-10, maxiter=2000)
    assert int(res.iterations) < int(res_r.iterations)


def test_solve_dispatch_new_types():
    A = _spd(80, seed=6)
    rng = np.random.default_rng(7)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    d = jnp.asarray(1.0 / np.diag(A))
    for kind in (KSPType.MINRES, KSPType.RICHARDSON, "minres", "richardson"):
        res = solve(lambda v: Aj @ v, b, ksp_type=kind, tol=1e-9,
                    maxiter=5000, M=lambda r: d * r)
        assert bool(res.converged), (kind, float(res.residual))
