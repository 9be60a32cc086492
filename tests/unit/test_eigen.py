"""Eigensolver unit tests (model: reference tests/unit/Solver/test_eigen.py:
analytically-known small matrices, shift-invert behavior, singular-M)."""

import numpy as np
import pytest
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.eigen import (
    EigenSolver,
    EigensolverConfig,
    EpsProblemType,
    EpsWhich,
    STType,
    eigen_residuals,
    krylov_schur,
)


def _csr(dense):
    return CSRMatrix.from_scipy(sp.csr_matrix(np.asarray(dense, dtype=np.float64)))


def test_diagonal_matrix_largest():
    """(model: reference test_eigen.py:35-39 diagonal case)"""
    d = np.arange(1.0, 21.0)
    A = _csr(np.diag(d))
    es = EigenSolver(A, None, EigensolverConfig(num_eig=3, atol=1e-10, ncv=12))
    es.set_which_eigenpairs(EpsWhich.LARGEST_MAGNITUDE)
    pairs = es.solve()
    got = sorted([p[0].real for p in pairs], reverse=True)
    assert np.allclose(got, [20.0, 19.0, 18.0], atol=1e-8)
    res = eigen_residuals(A, None, pairs)
    assert (res < 1e-7).all()


def test_complex_pair_2x2():
    """Rotation-like block has complex pair 1 +/- 2i
    (model: reference test_eigen.py:142-172)."""
    A = _csr([[1.0, 2.0], [-2.0, 1.0]])
    es = EigenSolver(A, None, EigensolverConfig(num_eig=2, atol=1e-10, ncv=None or 2))
    # ncv must exceed nev; use direct krylov_schur with full space
    from lsafw_tpu.ops.sparse import spmv_pair

    res = krylov_schur(
        lambda v: spmv_pair(A, v[0], v[1]), 2, nev=1, ncv=None, tol=1e-12
    )
    lam = res.eigenvalues[0]
    assert np.isclose(abs(lam.real), 1.0, atol=1e-8)
    assert np.isclose(abs(lam.imag), 2.0, atol=1e-8)


def test_generalized_spd_vs_numpy():
    """(model: reference test_eigen.py:242-252 random SPD vs eigvalsh)"""
    rng = np.random.default_rng(3)
    n = 40
    Q = rng.standard_normal((n, n))
    Aa = Q @ Q.T + n * np.eye(n)
    Mm = np.diag(rng.uniform(1.0, 2.0, n))
    A, M = _csr(Aa), _csr(Mm)
    import scipy.linalg as sla

    ref = np.sort(sla.eigh(Aa, Mm, eigvals_only=True))
    es = EigenSolver(A, M, EigensolverConfig(num_eig=4, problem_type=EpsProblemType.GHEP, atol=1e-10, ncv=20))
    es.set_st_type(STType.SINVERT)
    es.set_target(ref[0] - 0.1)
    pairs = es.solve()
    got = np.sort([p[0].real for p in pairs])
    assert np.allclose(got, ref[:4], rtol=1e-8)
    assert (eigen_residuals(A, M, pairs) < 1e-6).all()


def test_shift_invert_near_target():
    """(model: reference test_eigen.py:255-269)"""
    d = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    A = _csr(np.diag(d))
    M = _csr(np.eye(8))
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-10, ncv=6))
    es.set_st_type(STType.SINVERT)
    es.set_target(4.2)
    pairs = es.solve()
    vals = sorted(p[0].real for p in pairs)
    assert np.allclose(vals, [4.0, 5.0], atol=1e-8)


def test_sinvert_requires_target():
    A = _csr(np.eye(4))
    es = EigenSolver(A, None, EigensolverConfig(num_eig=1, ncv=3))
    es.set_st_type(STType.SINVERT)
    with pytest.raises(ValueError):
        es.solve()


def test_shape_validation():
    A = _csr(np.eye(4))
    M = _csr(np.eye(5))
    with pytest.raises(ValueError):
        EigenSolver(A, M)


def test_hermitian_warning(caplog):
    """(model: reference test_eigen.py:188-199 log-capture warnings)"""
    import logging

    A = _csr([[1.0, 2.0], [0.0, 1.0]])
    with caplog.at_level(logging.WARNING, logger="lsafw_tpu"):
        EigenSolver(A, None, check_hermitian=True)
    assert any("not numerically symmetric" in r.message for r in caplog.records)


def test_singular_mass_shift_invert():
    """Singular M (saddle-point analog): shift-invert still isolates the
    finite spectrum (model: reference test_eigen.py:272-281, but the
    TPU design makes singular M well-posed instead of an error)."""
    Aa = np.diag([1.0, 2.0, 3.0, 4.0])
    Mm = np.diag([1.0, 1.0, 1.0, 0.0])  # last row: infinite eigenvalue
    A, M = _csr(Aa), _csr(Mm)
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-10, ncv=3))
    es.set_st_type(STType.SINVERT)
    es.set_target(0.9)
    pairs = es.solve()
    vals = sorted(p[0].real for p in pairs)
    assert np.allclose(vals, [1.0, 2.0], atol=1e-8)


def test_membrane_small():
    """Coarse membrane EVP against the analytic spectrum."""
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import analytic_eigenvalues, assemble_membrane_evp

    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 8, 16)
    K, M, _ = assemble_membrane_evp(mesh)
    es = EigenSolver(K, M, EigensolverConfig(num_eig=5, atol=1e-10, ncv=30))
    es.set_st_type(STType.SINVERT)
    es.set_target(2.0)
    pairs = es.solve()
    got = np.sort([p[0].real for p in pairs])
    exact = analytic_eigenvalues(2.0, 4.0, 5)
    rel = np.abs(got - exact) / exact
    assert rel.max() < 2e-3, rel


def test_cayley_transform_matches_sinvert():
    """CAYLEY (parity: iSTType.CAYLEY, Solver/utils.py:139) shares the
    shift-invert factorization; eigenvalues near the target must match
    plain SINVERT including the back-transform."""
    rng = np.random.default_rng(9)
    d = np.array([1.0, 2.5, 3.0, 4.0, 5.5, 6.0, 7.0, 9.0])
    Mm = np.diag(rng.uniform(1.0, 2.0, 8))
    A = _csr(np.diag(d) @ Mm)  # generalized: A x = lam M x with lam = d
    M = _csr(Mm)
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-10, ncv=6))
    es.set_st_type(STType.CAYLEY)
    es.set_target(4.2)
    pairs = es.solve()
    vals = sorted(p[0].real for p in pairs)
    assert np.allclose(vals, [4.0, 5.5], atol=1e-8)
    assert (eigen_residuals(A, M, pairs) < 1e-6).all()


def test_cayley_explicit_antishift():
    d = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    A = _csr(np.diag(d))
    M = _csr(np.eye(8))
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-10, ncv=6))
    es.set_st_type(STType.CAYLEY)
    es.set_target(4.2)
    es.set_cayley_antishift(1.3)
    pairs = es.solve()
    vals = sorted(p[0].real for p in pairs)
    assert np.allclose(vals, [4.0, 5.0], atol=1e-8)


def test_precond_st_matches_sinvert():
    """STPRECOND role: inexact preconditioned shift-invert (parity:
    iSTType.PRECOND, Solver/utils.py:141)."""
    d = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    A = _csr(np.diag(d))
    M = _csr(np.eye(8))
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-9, ncv=6))
    es.set_st_type(STType.PRECOND)
    es.set_target(4.2)
    pairs = es.solve()
    vals = sorted(p[0].real for p in pairs)
    assert np.allclose(vals, [4.0, 5.0], atol=1e-7)


def test_filter_st_smallest_eigenvalues():
    """STFILTER role: Chebyshev-filtered Krylov-Schur finds the lowest
    eigenvalues of a Hermitian operator with NO factorization (parity:
    iSTType.FILTER, Solver/utils.py:143)."""
    import scipy.sparse as ssp

    n = 120
    # 1D Dirichlet Laplacian: lam_k = 2 - 2 cos(k pi / (n+1))
    L = ssp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1])
    A = CSRMatrix.from_scipy(ssp.csr_matrix(L))
    ref = 2.0 - 2.0 * np.cos(np.arange(1, 4) * np.pi / (n + 1))
    es = EigenSolver(A, None, EigensolverConfig(num_eig=3, atol=1e-10, ncv=20))
    es.set_st_type(STType.FILTER)
    es.set_target(float(ref[-1] * 2.0))  # cutoff above the wanted window
    es.set_which_eigenpairs(EpsWhich.SMALLEST_REAL)
    es.set_filter_degree(60)
    pairs = es.solve()
    got = np.sort([p[0].real for p in pairs])
    assert np.allclose(got, ref, rtol=1e-6), (got, ref)


def test_fused_expand_policy(monkeypatch):
    """Fusion policy: always on CPU / small problems; on TPU above 100k
    only when the SI refinement rides the chunked-scan BCSR operators
    (bounded temporaries — the root cause of the old size gate); env
    override wins over everything."""
    from types import SimpleNamespace

    import lsafw_tpu.solver.eigen as eig
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp

    monkeypatch.setattr(eig.jax, "default_backend", lambda: "cpu")
    assert eig._use_fused_expand(10_000_000, None)

    monkeypatch.setattr(eig.jax, "default_backend", lambda: "tpu")
    assert eig._use_fused_expand(50_000, None)
    # legacy (element-op / None) refinement matvec: per-step path
    assert not eig._use_fused_expand(200_000, None)
    assert not eig._use_fused_expand(200_000, SimpleNamespace(Cop=object()))
    # sharded CSR operators carry no Cop attribute at all
    assert not eig._use_fused_expand(200_000, SimpleNamespace())
    # BCSR-backed banded SI: fused
    bcsr_op = SimpleNamespace(Cop=BCSRShiftedOp.__new__(BCSRShiftedOp))
    assert eig._use_fused_expand(200_000, bcsr_op)

    monkeypatch.setenv("LSAFW_FUSED_EXPAND", "0")
    assert not eig._use_fused_expand(10, bcsr_op)
    monkeypatch.setenv("LSAFW_FUSED_EXPAND", "1")
    assert eig._use_fused_expand(10_000_000, None)


def test_shell_spectral_transform():
    """STSHELL: a hand-rolled shift-invert supplied as the shell apply
    reproduces the built-in SINVERT result (parity: iSTType SHELL,
    Solver/utils.py:131-149)."""
    import jax.numpy as jnp
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(6)
    n = 60
    D = np.sort(rng.uniform(1.0, 10.0, n))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Adense = Q @ np.diag(D) @ Q.T
    A = _csr(Adense)
    sigma = 4.03
    lu = spla.splu(sp.csc_matrix(
        (Adense - sigma * np.eye(n)).astype(np.complex128)))

    def apply_shell(v):
        z = lu.solve(np.asarray(v[0]) + 1j * np.asarray(v[1]))
        return jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy())

    es = EigenSolver(A, None, EigensolverConfig(num_eig=2, atol=1e-10, ncv=20))
    es.set_st_shell(apply_shell, back_transform=lambda t: sigma + 1.0 / t)
    pairs = es.solve()
    got = np.sort([p[0].real for p in pairs])
    ref = np.sort(D[np.argsort(np.abs(D - sigma))[:2]])
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_fused_expand_oom_fallback(monkeypatch):
    """A RESOURCE_EXHAUSTED fused expand degrades to the per-step path
    mid-solve (the self-healing replacement of the old >100k size gate)
    and still converges to the right eigenvalues."""
    import jax

    import lsafw_tpu.solver.eigen as eig

    rng = np.random.default_rng(12)
    n = 40
    D = np.diag(np.arange(1.0, n + 1))
    A = _csr(D)

    calls = {"n": 0}

    def exploding_fused(ncv, traced_apply, dtype):
        def expand(op, Vr, Vi, Hr, Hi, k):
            calls["n"] += 1
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: Ran out of memory in memory space hbm")

        return expand

    monkeypatch.setattr(eig, "_make_fused_expand", exploding_fused)
    monkeypatch.setattr(eig, "_use_fused_expand", lambda *a, **k: True)

    # a device-op path that would take the fused branch: reuse the
    # plain spmv as both eager and traced applies
    from lsafw_tpu.ops.sparse import spmv_pair

    op = ()  # any pytree works as the device op here
    res = eig.krylov_schur(
        lambda v: spmv_pair(A, v[0], v[1]), n,
        nev=3, ncv=12, which=eig.EpsWhich.LARGEST_MAGNITUDE, tol=1e-10,
        max_restarts=60,
        device_op=op, traced_apply=lambda o, v: spmv_pair(A, v[0], v[1]),
    )
    assert calls["n"] == 1  # fused tried once, then permanently off
    got = np.sort([z.real for z in res.eigenvalues[:3]])
    np.testing.assert_allclose(got, [n - 2, n - 1, n], atol=1e-8)


def test_nested_eigenpair_inexact_refinement():
    """nested_eigenpair converges an interpolation-grade guess to
    solver grade with DELIBERATELY inexact (1e-2) correction solves —
    the 500k+ eigen path where no exact fine factor exists."""
    import numpy as np

    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.solver.eigen import (
        EigenSolver, EigensolverConfig, STType, ShiftInvertOperator,
        nested_eigenpair,
    )

    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 12, 12)
    K, M, mask = assemble_membrane_evp(mesh)
    es = EigenSolver(K, M, EigensolverConfig(num_eig=1, atol=1e-10, ncv=12))
    es.set_st_type(STType.SINVERT)
    es.set_target(19.0)
    es.set_st_pc_type("banded")
    lam, x = es.solve()[0]

    sio = ShiftInvertOperator(K, M, complex(lam) + 0.4, method="banded")
    rng = np.random.default_rng(0)
    v0 = x + 0.05 * (rng.standard_normal(x.shape) +
                     1j * rng.standard_normal(x.shape))
    th, v, rel, it = nested_eigenpair(
        sio.device_op, v0, complex(lam) + 0.3,
        tol=1e-10, inner_tol=1e-2, inner_its=40, max_outer=25,
        bc_mask=mask)
    assert abs(th - lam) / abs(lam) < 1e-9, (th, lam)
    Ks, Ms = K.to_scipy(), M.to_scipy()
    r = Ks @ v - th * (Ms @ v)
    true_rel = np.linalg.norm(r) / np.linalg.norm(Ks @ v)
    assert true_rel < 1e-9, true_rel
    assert it <= 20, it


def test_two_grid_si_pc_beats_truncated_band():
    """TwoGridSIPC (truncated fine band + coarse exact SI correction)
    converges the nested refinement where the truncated band alone
    stalls — the 500k+ device eigen design."""
    import numpy as np

    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp
    from lsafw_tpu.solver.baseflow import point_interpolation_matrix
    from lsafw_tpu.solver.band import factor_auto, plan_for_csr
    from lsafw_tpu.solver.eigen import (
        BandedSIOp, EigenSolver, EigensolverConfig, STType,
        ShiftInvertOperator, TwoGridSIPC, ell_of_csr, nested_eigenpair,
    )
    from lsafw_tpu.fem.spaces import make_scalar_space
    from lsafw_tpu.meshing.tags import mark_boundary_facets

    def build(nx):
        mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), nx, nx)
        K, M, mask = assemble_membrane_evp(mesh)
        space = make_scalar_space(mesh, "p2")
        return mesh, K, M, mask, space

    _, K_c, M_c, mask_c, space_c = build(10)
    _, K_f, M_f, mask_f, space_f = build(26)
    sigma = 19.0 + 0.3j

    # coarse: exact-band SI op
    sio_c = ShiftInvertOperator(K_c, M_c, sigma, method="banded",
                                skip_calibration=True)
    # coarse eigenpair as the guess
    es = EigenSolver(K_c, M_c, EigensolverConfig(num_eig=1, atol=1e-10,
                                                 ncv=12))
    es.set_st_type(STType.SINVERT)
    es.set_target(19.0)
    es.set_st_pc_type("banded")
    lam_c, x_c = es.solve()[0]

    P = point_interpolation_matrix(space_c.node_coords, space_f.node_coords)
    v0 = P @ x_c

    # fine: HARD-truncated band (the 500k regime in miniature)
    Cf = (K_f.to_scipy().astype(np.complex128)
          - sigma * M_f.to_scipy()).tocsr()
    from lsafw_tpu.ops.sparse import CSRMatrix

    Cf_re = CSRMatrix(K_f.pattern, K_f.data - sigma.real * M_f.data)
    plan_f = plan_for_csr(Cf_re, max_bytes=600_000, nb=16, chunk=8)
    assert plan_f.B * plan_f.nb < 100  # genuinely truncated
    import jax.numpy as jnp

    blu_f, _ = factor_auto(plan_f, Cf_re.data,
                           (-sigma.imag) * M_f.data,
                           diag_slots=K_f.pattern.diag_slots)
    Cop_f = BCSRShiftedOp.from_csr(K_f, M_f, sigma, br=16, bc=16)

    Pd, Pc = ell_of_csr(P)
    pc2 = TwoGridSIPC(sio_c.device_op, blu_f, Pd, Pc, nc=P.shape[1],
                      coarse_tol=1e-8, coarse_its=25)
    op2 = BandedSIOp(K_f, M_f, pc2,
                     jnp.asarray(sigma.real), jnp.asarray(sigma.imag),
                     Cop_f, None)
    th, v, rel, it = nested_eigenpair(
        op2, v0, lam_c, tol=1e-9, inner_tol=1e-4, inner_its=60,
        max_outer=15, bc_mask=mask_f)
    Ks, Ms = K_f.to_scipy(), M_f.to_scipy()
    r = Ks @ v - th * (Ms @ v)
    true_rel = np.linalg.norm(r) / np.linalg.norm(Ks @ v)
    assert true_rel < 1e-8, (true_rel, th)

    # control: the truncated band ALONE as the PC stalls short of tol
    op1 = BandedSIOp(K_f, M_f, blu_f,
                     jnp.asarray(sigma.real), jnp.asarray(sigma.imag),
                     Cop_f, None)
    th1, v1, rel1, it1 = nested_eigenpair(
        op1, P @ x_c, lam_c, tol=1e-9, inner_tol=1e-4, inner_its=60,
        max_outer=15, bc_mask=mask_f)
    r1 = Ks @ v1 - th1 * (Ms @ v1)
    rel1_true = np.linalg.norm(r1) / np.linalg.norm(Ks @ v1)
    assert true_rel < 1e-2 * max(rel1_true, 1e-30) or rel1_true < 1e-8


def test_two_grid_jacobi_smoother_hi_only_matvec():
    """The 500k+ MEMORY mode of the two-grid nested eigen path in
    miniature: DiagSIPC (regularized complex Jacobi) replaces the
    truncated fine band, correction matvecs ride hi-only (f32) BCSR
    blocks, and the once-per-outer residual rides a separate f64
    ELL resid_op (scripts/dev_500k.py DEV500_TG default)."""
    import numpy as np
    import jax.numpy as jnp

    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp
    from lsafw_tpu.solver.baseflow import point_interpolation_matrix
    from lsafw_tpu.solver.eigen import (
        BandedSIOp, DiagSIPC, EigenSolver, EigensolverConfig, STType,
        ShiftInvertOperator, TwoGridSIPC, ell_of_csr, nested_eigenpair,
    )
    from lsafw_tpu.fem.spaces import make_scalar_space

    def build(nx):
        mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), nx, nx)
        K, M, mask = assemble_membrane_evp(mesh)
        space = make_scalar_space(mesh, "p2")
        return K, M, mask, space

    K_c, M_c, mask_c, space_c = build(10)
    K_f, M_f, mask_f, space_f = build(26)
    sigma = 19.0 + 0.3j

    sio_c = ShiftInvertOperator(K_c, M_c, sigma, method="banded",
                                skip_calibration=True)
    es = EigenSolver(K_c, M_c, EigensolverConfig(num_eig=1, atol=1e-10,
                                                 ncv=12))
    es.set_st_type(STType.SINVERT)
    es.set_target(19.0)
    es.set_st_pc_type("banded")
    lam_c, x_c = es.solve()[0]
    P = point_interpolation_matrix(space_c.node_coords, space_f.node_coords)
    v0 = P @ x_c
    Pd, Pc = ell_of_csr(P)

    jac = DiagSIPC.from_pair(K_f, M_f, sigma)
    Cop32 = BCSRShiftedOp.from_csr(K_f, M_f, sigma, br=16, bc=16,
                                   lo_channels=False)
    pc2 = TwoGridSIPC(sio_c.device_op, jac, Pd, Pc, nc=P.shape[1],
                      coarse_tol=1e-8, coarse_its=25)
    sr, si = jnp.asarray(sigma.real), jnp.asarray(sigma.imag)
    op2 = BandedSIOp(K_f, M_f, pc2, sr, si, Cop32, None)
    rop2 = BandedSIOp(K_f, M_f, pc2, sr, si, None, None)
    th, v, rel, it = nested_eigenpair(
        op2, v0, lam_c, tol=1e-9, inner_tol=1e-4, inner_its=60,
        max_outer=15, bc_mask=mask_f, resid_op=rop2)
    Ks, Ms = K_f.to_scipy(), M_f.to_scipy()
    r = Ks @ v - th * (Ms @ v)
    true_rel = np.linalg.norm(r) / np.linalg.norm(Ks @ v)
    assert true_rel < 1e-8, (true_rel, th)

    # MULTIPLICATIVE composition (the production 500k mode): the fine
    # Jacobi smooths the post-coarse residual through the PC-held C
    # apply; the operator's C apply is shared from blu.Cop (no second
    # multi-GB leaf) and retargeted by _with_sigma inside the PC.
    pc_m = TwoGridSIPC(sio_c.device_op, jac, Pd, Pc, Cop=Cop32,
                       nc=P.shape[1], coarse_tol=1e-8, coarse_its=25,
                       smooth_steps=2, omega=0.7)
    op_m = BandedSIOp(K_f, M_f, pc_m, sr, si, None, None)
    rop_m = BandedSIOp(K_f, M_f, None, sr, si, None, None)
    th_m, v_m, rel_m, it_m = nested_eigenpair(
        op_m, v0, lam_c, tol=1e-9, inner_tol=1e-4, inner_its=60,
        max_outer=15, bc_mask=mask_f, resid_op=rop_m)
    r_m = Ks @ v_m - th_m * (Ms @ v_m)
    true_rel_m = np.linalg.norm(r_m) / np.linalg.norm(Ks @ v_m)
    assert true_rel_m < 1e-8, (true_rel_m, th_m)
    assert abs(th_m - th) < 1e-7, (th_m, th)


def test_galerkin_pair_shared_union_pattern():
    """galerkin_pair returns P^T A P and P^T M P on ONE shared pattern
    (with forced diagonal) — the coarse operator of the production
    two-grid shift-invert (scripts/dev_500k.py DEV500_TG)."""
    import numpy as np

    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.fem.spaces import make_scalar_space
    from lsafw_tpu.solver.baseflow import point_interpolation_matrix
    from lsafw_tpu.solver.eigen import galerkin_pair

    mesh_c = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 6, 6)
    mesh_f = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 14, 14)
    K_f, M_f, _ = assemble_membrane_evp(mesh_f)
    sc = make_scalar_space(mesh_c, "p2")
    sf = make_scalar_space(mesh_f, "p2")
    P = point_interpolation_matrix(sc.node_coords, sf.node_coords)

    A_g, M_g = galerkin_pair(P, K_f, M_f)
    assert A_g.pattern is M_g.pattern
    # every diagonal entry is present (band planning requires it)
    ds = A_g.pattern.diag_slots
    assert ds.shape[0] == A_g.shape[0]
    # values match the scipy triple products
    ref_A = (P.T @ (K_f.to_scipy() @ P)).toarray()
    ref_M = (P.T @ (M_f.to_scipy() @ P)).toarray()
    assert np.allclose(A_g.to_scipy().toarray(), ref_A, atol=1e-12)
    assert np.allclose(M_g.to_scipy().toarray(), ref_M, atol=1e-12)
