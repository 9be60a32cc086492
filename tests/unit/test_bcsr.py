"""BCSR SpMV correctness: layout, permutation, f64 accuracy, pair apply."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from lsafw_tpu.ops.bcsr import BCSRPlan, BCSROperator, BCSRPairOperator


def fem_like_matrix(n=900, seed=0):
    """Random SPD-ish matrix with FEM-like local connectivity."""
    rng = np.random.default_rng(seed)
    g = int(np.sqrt(n))
    rows, cols = [], []
    for i in range(n):
        x, y = i % g, i // g
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                j = (x + dx) % g + g * ((y + dy) % g)
                rows.append(i)
                cols.append(j)
    vals = rng.standard_normal(len(rows)) * (1 + rng.random(len(rows)))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def _as_csrmatrix(A):
    from lsafw_tpu.ops.sparse import CSRMatrix

    return CSRMatrix.from_scipy(A)


@pytest.mark.parametrize("br,bc", [(8, 128), (8, 32), (4, 64)])
def test_bcsr_matvec_matches_scipy(br, bc):
    A = fem_like_matrix(900)
    op = BCSROperator.from_csr(_as_csrmatrix(A), br=br, bc=bc)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.shape[0])
    y_ref = A @ x
    y = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12 * np.abs(y_ref).max())
    y32 = np.asarray(op.matvec32(jnp.asarray(x)))
    np.testing.assert_allclose(y32, y_ref, rtol=2e-5, atol=2e-5 * np.abs(y_ref).max())


def test_bcsr_permuted_space_roundtrip():
    A = fem_like_matrix(400, seed=2)
    Am = _as_csrmatrix(A)
    from lsafw_tpu.ops.bcsr import plan_for_pattern

    plan = plan_for_pattern(Am, br=8, bc=32)
    op = BCSROperator.from_csr(Am, plan)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(A.shape[0])
    # permuted-space apply == P^T A P on permuted vector
    xp = x[plan.perm]
    yp = np.asarray(op.matvec_permuted(jnp.asarray(xp)))
    y_ref = (A @ x)[plan.perm]
    np.testing.assert_allclose(yp, y_ref, rtol=1e-12, atol=1e-12)


def test_bcsr_pair_apply():
    A = fem_like_matrix(400, seed=4)
    Am = _as_csrmatrix(A)
    rng = np.random.default_rng(5)
    Ai_data = jnp.asarray(rng.standard_normal(A.nnz))
    op = BCSRPairOperator.from_csr_pair(Am, Ai_data, br=8, bc=32)
    x = rng.standard_normal(A.shape[0]) + 1j * rng.standard_normal(A.shape[0])
    C = A + 1j * sp.csr_matrix((np.asarray(Ai_data), A.indices, A.indptr), shape=A.shape)
    y_ref = C @ x
    yr, yi = op.matvec_pair(jnp.asarray(x.real), jnp.asarray(x.imag))
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), y_ref,
                               rtol=1e-12, atol=1e-12)


def test_bcsr_shares_band_rcm():
    """The plan must reuse the band RCM so refinement loops can stay in
    permuted coordinates across the band solve and the BCSR matvec."""
    A = fem_like_matrix(400, seed=6)
    Am = _as_csrmatrix(A)
    from lsafw_tpu.ops.bcsr import plan_for_pattern
    from lsafw_tpu.solver.band import rcm_permutation

    plan = plan_for_pattern(Am, br=8, bc=32)
    np.testing.assert_array_equal(plan.perm, rcm_permutation(A))


def test_bcsr_shifted_op():
    """BCSRShiftedOp: C apply and mass view vs scipy, sigma traced."""
    import jax
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp

    A = fem_like_matrix(400, seed=8)
    rng = np.random.default_rng(9)
    Md = sp.csr_matrix((rng.random(A.nnz) + 0.5, A.indices, A.indptr), shape=A.shape)
    Am, Mm = _as_csrmatrix(A), None
    from lsafw_tpu.ops.sparse import CSRMatrix

    Mm = CSRMatrix(Am.pattern, jnp.asarray(Md.data))
    sigma = 1.7 - 0.4j
    op = BCSRShiftedOp.from_csr(Am, Mm, sigma, br=8, bc=32)
    z = rng.standard_normal(A.shape[0]) + 1j * rng.standard_normal(A.shape[0])
    C = A - sigma * Md
    yr, yi = op.matvec_pair(jnp.asarray(z.real), jnp.asarray(z.imag))
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), C @ z,
                               rtol=1e-12, atol=1e-12)
    mr, mi = op.mass_pair(jnp.asarray(z.real), jnp.asarray(z.imag))
    np.testing.assert_allclose(np.asarray(mr) + 1j * np.asarray(mi), Md @ z,
                               rtol=1e-12, atol=1e-12)
    # sigma is a pytree leaf: one jitted apply serves every shift
    import dataclasses

    @jax.jit
    def apply(o, xr, xi):
        return o.matvec_pair(xr, xi)

    op2 = dataclasses.replace(op, sig_re=jnp.asarray(3.1), sig_im=jnp.asarray(0.2))
    yr2, yi2 = apply(op2, jnp.asarray(z.real), jnp.asarray(z.imag))
    C2 = A - (3.1 + 0.2j) * Md
    np.testing.assert_allclose(np.asarray(yr2) + 1j * np.asarray(yi2), C2 @ z,
                               rtol=1e-12, atol=1e-12)


def test_si_apply_m_dispatch():
    """_si_apply_M routing (advisor round-3): with Mop=None it must take
    Cop.mass_pair when Cop is a BCSRShiftedOp (shared-storage M apply),
    and fall back to spmv_pair(M) for Cop types without mass_pair."""
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp
    from lsafw_tpu.ops.sparse import CSRMatrix
    from lsafw_tpu.solver.eigen import BandedSIOp, _si_apply_M

    A = fem_like_matrix(400, seed=12)
    rng = np.random.default_rng(13)
    Md = sp.csr_matrix((rng.random(A.nnz) + 0.5, A.indices, A.indptr),
                       shape=A.shape)
    Am = _as_csrmatrix(A)
    Mm = CSRMatrix(Am.pattern, jnp.asarray(Md.data))
    sigma = 0.3 + 0.9j
    cop = BCSRShiftedOp.from_csr(Am, Mm, sigma, br=8, bc=32)
    z = rng.standard_normal(A.shape[0]) + 1j * rng.standard_normal(A.shape[0])
    xr, xi = jnp.asarray(z.real), jnp.asarray(z.imag)

    sr = jnp.asarray(sigma.real)
    si = jnp.asarray(sigma.imag)
    # Mop=None + BCSRShiftedOp Cop -> mass_pair over shared storage.
    # M is deliberately WRONG (2x) so the assertion proves the route.
    M2 = CSRMatrix(Am.pattern, jnp.asarray(2.0 * Md.data))
    op_bcsr = BandedSIOp(A=Am, M=M2, blu=None, sig_re=sr, sig_im=si,
                         Cop=cop, Mop=None)
    mr, mi = _si_apply_M(op_bcsr, xr, xi)
    np.testing.assert_allclose(np.asarray(mr) + 1j * np.asarray(mi), Md @ z,
                               rtol=1e-12, atol=1e-12)

    # Cop without mass_pair (a plain pair operator) -> spmv_pair(op.M)
    c_re = CSRMatrix(Am.pattern, Am.data - sigma.real * Mm.data)
    pair_cop = BCSRPairOperator.from_csr_pair(c_re, -sigma.imag * Mm.data,
                                              br=8, bc=32)
    assert not hasattr(pair_cop, "mass_pair")
    op_plain = BandedSIOp(A=Am, M=Mm, blu=None, sig_re=sr, sig_im=si,
                          Cop=pair_cop, Mop=None)
    mr2, mi2 = _si_apply_M(op_plain, xr, xi)
    np.testing.assert_allclose(np.asarray(mr2) + 1j * np.asarray(mi2), Md @ z,
                               rtol=1e-12, atol=1e-12)


def test_wide_plan_matches_narrow(monkeypatch):
    """int64 plan keys (NBR*NCB past the int32 ceiling — 1M-DOF
    patterns at small bc) must produce the identical plan."""
    import scipy.sparse as sp

    from lsafw_tpu.ops import bcsr as bcsr_mod

    rng = np.random.default_rng(0)
    n = 600
    A = sp.random(n, n, density=0.02, format="csr", random_state=7)
    A = A + sp.identity(n, format="csr")
    p1 = bcsr_mod.BCSRPlan.build(A, br=8, bc=16)
    monkeypatch.setattr(bcsr_mod, "_WIDE_THRESHOLD", 1)
    p2 = bcsr_mod.BCSRPlan.build(A, br=8, bc=16)
    assert p2.KB == p1.KB and p2.stored == p1.stored
    np.testing.assert_array_equal(np.asarray(p2.pos), np.asarray(p1.pos))
    np.testing.assert_array_equal(np.asarray(p2.colblk), np.asarray(p1.colblk))


def test_shifted_op_hi_only_channels():
    """lo_channels=False halves storage and keeps ~f32-grade applies
    (the 500k+ nested-correction memory mode)."""
    import scipy.sparse as sp

    from lsafw_tpu.ops.bcsr import BCSRShiftedOp, plan_for_pattern
    from lsafw_tpu.ops.sparse import CSRMatrix

    rng = np.random.default_rng(1)
    n = 400
    S = sp.random(n, n, density=0.03, format="csr", random_state=3)
    S = (S + sp.identity(n)).tocsr()
    S.sort_indices()
    A = CSRMatrix.from_scipy(S)
    Mdata = rng.standard_normal(S.nnz)
    M = CSRMatrix(A.pattern, jnp.asarray(Mdata))
    Ms = sp.csr_matrix((Mdata, S.indices, S.indptr), shape=(n, n))
    sigma = 0.3 + 0.7j
    plan = plan_for_pattern(A, br=8, bc=16)
    op = BCSRShiftedOp.from_csr(A, M, sigma, plan, lo_channels=False)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    yr, yi = op.matvec_pair(jnp.asarray(x.real), jnp.asarray(x.imag))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    y_ref = (S - sigma * Ms) @ x
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel < 1e-5, rel  # f32-grade
    mr, mi = op.mass_pair(jnp.asarray(x.real), jnp.asarray(x.imag))
    m_ref = Ms @ x
    relm = np.linalg.norm((np.asarray(mr) + 1j * np.asarray(mi)) - m_ref)
    assert relm / np.linalg.norm(m_ref) < 1e-5
