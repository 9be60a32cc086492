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


def _nonsym(n=150, seed=7):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=0.06, random_state=np.random.RandomState(seed)).toarray()
    A = A + n * np.eye(n)  # diagonally dominant nonsymmetric
    return A


def test_bicg_and_lsqr_nonsymmetric():
    A = _nonsym()
    rng = np.random.default_rng(8)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    mv = lambda v: Aj @ v
    rmv = lambda v: Aj.T @ v
    for kind in ("bicg", "lsqr"):
        res = solve(mv, b, ksp_type=kind, rmatvec=rmv, tol=1e-11, maxiter=800)
        assert bool(res.converged), (kind, float(res.residual))
        np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-7,
                                   err_msg=kind)


def test_cgs_gcr_lgmres_nonsymmetric():
    A = _nonsym(seed=9)
    d = jnp.asarray(1.0 / np.diag(A))
    rng = np.random.default_rng(10)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    mv = lambda v: Aj @ v
    for kind in ("cgs", "gcr", "lgmres"):
        res = solve(mv, b, ksp_type=kind, tol=1e-11, maxiter=900,
                    restart=25, M=lambda r: d * r)
        rel = np.linalg.norm(A @ np.asarray(res.x) - np.asarray(b)) / np.linalg.norm(
            np.asarray(b))
        assert rel < 1e-9, (kind, rel)


def test_lgmres_multi_cycle_augmented():
    """Short restarts force several cycles, so the augmentation seeds
    (previous cycles' error approximations) are actually exercised."""
    n = 400
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.concatenate([np.linspace(1.0, 2.0, n - 4), [40, 60, 80, 100.0]])
    A = Q @ np.diag(vals) @ Q.T + 0.05 * rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    from lsafw_tpu.solver.linear import lgmres

    res_l = lgmres(lambda v: Aj @ v, b, tol=1e-10, restart=8, maxiter=400)
    assert bool(res_l.converged), float(res_l.residual)
    assert int(res_l.iterations) > 2 * 8  # >2 cycles -> seeds were live
    rel = np.linalg.norm(A @ np.asarray(res_l.x) - np.asarray(b)) / np.linalg.norm(
        np.asarray(b))
    assert rel < 1e-9, rel


def test_qcg_trust_region():
    A = _spd(seed=12)
    rng = np.random.default_rng(13)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    mv = lambda v: Aj @ v
    # unconstrained: behaves as CG
    res = solve(mv, b, ksp_type="qcg", tol=1e-11, maxiter=600)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-7)
    # tight ball: the returned iterate sits on the boundary
    rad = 0.25 * float(np.linalg.norm(x_true))
    res_tr = solve(mv, b, ksp_type="qcg", tol=1e-11, maxiter=600, radius=rad)
    np.testing.assert_allclose(float(jnp.linalg.norm(res_tr.x)), rad, rtol=1e-6)


def test_chebyshev_dispatch_bounds():
    A = _spd(seed=14)
    w = np.linalg.eigvalsh(A)
    rng = np.random.default_rng(15)
    x_true = rng.standard_normal(A.shape[0])
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    res = solve(lambda v: Aj @ v, b, ksp_type="chebyshev",
                lmin=float(w[0]), lmax=float(w[-1]), tol=1e-10, maxiter=2000)
    assert bool(res.converged), float(res.residual)
    import pytest

    with pytest.raises(ValueError):
        solve(lambda v: Aj @ v, b, ksp_type="chebyshev")
