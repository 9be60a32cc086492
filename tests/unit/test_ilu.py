"""Chow-Patel ILU(0) and SSOR preconditioners (parity: PETSc
ILU/ICC/SOR roles, ``/root/reference/Solver/utils.py:66-94``)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.ilu import ILU0Plan, ilu0, ilu0_factor_values, ssor
from lsafw_tpu.solver.linear import cg, gmres


def _reference_ilu0(A: np.ndarray, pattern: np.ndarray):
    """Textbook sequential IKJ ILU(0) on a dense copy (small n only)."""
    n = A.shape[0]
    F = A.copy()
    for i in range(1, n):
        for k in range(i):
            if not pattern[i, k]:
                continue
            F[i, k] = F[i, k] / F[k, k]
            for j in range(k + 1, n):
                if pattern[i, j]:
                    F[i, j] -= F[i, k] * F[k, j]
    return F


def _diag_dominant(n, seed, density=0.15):
    rng = np.random.RandomState(seed)
    A = sp.random(n, n, density=density, random_state=rng).toarray()
    A[np.arange(n), np.arange(n)] = np.abs(A).sum(axis=1) + 1.0
    return A


def test_ilu0_matches_sequential_factor():
    n = 40
    A = _diag_dominant(n, 0)
    S = sp.csr_matrix(A)
    ref = _reference_ilu0(A, (A != 0))

    plan = ILU0Plan.build(S)
    vals = ilu0_factor_values(
        plan, jnp.asarray(S.sorted_indices().data), sweeps=40)
    got = sp.csr_matrix((np.asarray(vals), S.sorted_indices().indices,
                         S.sorted_indices().indptr), shape=S.shape).toarray()
    mask = A != 0
    np.testing.assert_allclose(got[mask], ref[mask], rtol=1e-10, atol=1e-12)


def test_ilu0_product_matches_on_pattern():
    """The ILU(0) defining property: (L U)_ij == a_ij on the pattern."""
    n = 120
    A = _diag_dominant(n, 1, density=0.08)
    S = sp.csr_matrix(A).sorted_indices()
    plan = ILU0Plan.build(S)
    vals = np.asarray(ilu0_factor_values(plan, jnp.asarray(S.data), sweeps=40))
    F = sp.csr_matrix((vals, S.indices, S.indptr), shape=S.shape).toarray()
    L = np.tril(F, -1) + np.eye(n)
    U = np.triu(F)
    P = L @ U
    mask = A != 0
    np.testing.assert_allclose(P[mask], A[mask], rtol=1e-9, atol=1e-11)


def test_ilu0_preconditions_gmres():
    n = 600
    rng = np.random.RandomState(3)
    # nonsymmetric convection-diffusion-like band matrix
    main = 4.0 * np.ones(n)
    lo = -1.0 - 0.4 * rng.rand(n - 1)
    hi = -1.0 + 0.4 * rng.rand(n - 1)
    lo2 = -0.5 * np.ones(n - 10)
    A = sp.diags([main, lo, hi, lo2, lo2[::-1]], [0, -1, 1, -10, 10]).tocsr()
    Ac = CSRMatrix.from_scipy(A)
    x_true = rng.randn(n)
    from lsafw_tpu.ops.sparse import spmv

    b = spmv(Ac, jnp.asarray(x_true))
    mv = lambda v: spmv(Ac, v)

    res_plain = gmres(mv, b, tol=1e-11, restart=20, maxiter=400)
    res_ilu = gmres(mv, b, tol=1e-11, restart=20, maxiter=400, M=ilu0(Ac))
    assert bool(res_ilu.converged)
    assert int(res_ilu.iterations) < int(res_plain.iterations)
    np.testing.assert_allclose(np.asarray(res_ilu.x), x_true, rtol=1e-7, atol=1e-7)


def test_ilu0_zero_diag_regularized():
    """Saddle-like zero diagonal entries degrade to unit pivots instead
    of producing NaNs."""
    # explicit structural zero on the diagonal (as saddle-point
    # assemblies store it; plain sp.csr_matrix(dense) would prune it)
    S = sp.csr_matrix(
        (np.array([2.0, 1, 1, 1, 0, 1, 1, 1, 3]),
         np.array([0, 1, 2, 0, 1, 2, 0, 1, 2]),
         np.array([0, 3, 6, 9])),
        shape=(3, 3))
    plan = ILU0Plan.build(S)
    vals = np.asarray(ilu0_factor_values(plan, jnp.asarray(S.data), sweeps=20))
    assert np.all(np.isfinite(vals))


def test_ssor_preconditions_cg():
    n = 900
    # 1D Laplacian: SSOR's classic win over Jacobi
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, -1, 1]).tocsr()
    Ac = CSRMatrix.from_scipy(A)
    rng = np.random.RandomState(5)
    x_true = rng.randn(n)
    from lsafw_tpu.ops.sparse import spmv

    b = spmv(Ac, jnp.asarray(x_true))
    mv = lambda v: spmv(Ac, v)
    res_plain = cg(mv, b, tol=1e-10, maxiter=3000)
    res_ssor = cg(mv, b, tol=1e-10, maxiter=3000, M=ssor(Ac, omega=1.5, sweeps=8))
    assert bool(res_ssor.converged)
    assert int(res_ssor.iterations) < int(res_plain.iterations)
    rel = float(jnp.linalg.norm(mv(res_ssor.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-8, rel


def test_ilu0_rejects_missing_diagonal():
    S = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))
    with pytest.raises(ValueError):
        ILU0Plan.build(S)


def test_make_preconditioner_menu():
    from lsafw_tpu.solver.precond import make_preconditioner

    n = 80
    A = _diag_dominant(n, 6, density=0.1)
    Ac = CSRMatrix.from_scipy(sp.csr_matrix(A))
    rng = np.random.RandomState(7)
    x_true = rng.randn(n)
    from lsafw_tpu.ops.sparse import spmv

    b = spmv(Ac, jnp.asarray(x_true))
    for kind in ("ilu", "icc", "sor"):
        M = make_preconditioner(Ac, kind)
        res = gmres(lambda v: spmv(Ac, v), b, tol=1e-11, restart=25,
                    maxiter=500, M=M)
        assert bool(res.converged), kind


def test_pc_menu_aliases():
    """ASM (zero-overlap = block-Jacobi), CHOLESKY/REDUNDANT (direct LU
    role) and SHELL (user callable) resolve and precondition."""
    from lsafw_tpu.solver.precond import make_preconditioner

    n = 60
    A = _diag_dominant(n, 9, density=0.12)
    Ac = CSRMatrix.from_scipy(sp.csr_matrix(A))
    rng = np.random.RandomState(10)
    x_true = rng.randn(n)
    from lsafw_tpu.ops.sparse import spmv

    b = spmv(Ac, jnp.asarray(x_true))
    mv = lambda v: spmv(Ac, v)
    for kind in ("asm", "cholesky", "redundant"):
        M = make_preconditioner(Ac, kind)
        res = gmres(mv, b, tol=1e-11, restart=20, maxiter=300, M=M)
        assert bool(res.converged), kind
    d = jnp.asarray(1.0 / np.diag(A))
    M = make_preconditioner(Ac, "shell", apply=lambda r: d * r)
    res = gmres(mv, b, tol=1e-11, restart=20, maxiter=300, M=M)
    assert bool(res.converged)
    import pytest

    with pytest.raises(ValueError):
        make_preconditioner(Ac, "shell")
