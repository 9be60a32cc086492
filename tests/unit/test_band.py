"""Blocked band LU on device (solver/band.py).

Validates the TPU-native direct-solver replacement for the reference's
MUMPS/SuperLU shift-invert factorization (``Solver/eigen2.py:104-162``)
against scipy on small operators, including the saddle-point case and
the mixed-precision refinement pattern it is designed for.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from lsafw_tpu.solver.band import BandedLU


def _random_banded(n, bw, seed=0, complex_=True):
    rng = np.random.default_rng(seed)
    diags = []
    offs = range(-bw, bw + 1)
    for o in offs:
        m = n - abs(o)
        d = rng.standard_normal(m) * 0.3
        if complex_:
            d = d + 1j * rng.standard_normal(m) * 0.3
        diags.append(d)
    A = sp.diags(diags, list(offs), format="csr").astype(np.complex128)
    # diagonal dominance for a pivot-free-friendly test matrix
    A = A + sp.identity(n, format="csr") * (2.0 * bw * 0.3 + 1.0)
    return A


@pytest.mark.parametrize("nb,chunk", [(16, 8), (32, 4)])
def test_band_lu_matches_scipy(nb, chunk):
    n, bw = 300, 21
    A = _random_banded(n, bw)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    lu = BandedLU.from_complex_csr(A, nb=nb, chunk=chunk)
    x = lu.solve(b)
    ref = spla.splu(A.tocsc()).solve(b)
    rel = np.linalg.norm(x - ref) / np.linalg.norm(ref)
    assert rel < 5e-5  # f32 factorization grade


def test_band_lu_identity_permutation_and_padding():
    # n not a multiple of nb*chunk exercises the padding rows
    n, bw = 131, 9
    A = _random_banded(n, bw, seed=3)
    b = np.ones(n, dtype=np.complex128)
    lu = BandedLU.from_complex_csr(A, nb=16, chunk=4)
    x = lu.solve(b)
    rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert rel < 5e-5


def test_band_lu_refinement_reaches_f64():
    """f32 factor + f64 residual refinement -> solver-grade accuracy
    (the mixed-precision scheme the eigensolver uses)."""
    n, bw = 200, 13
    A = _random_banded(n, bw, seed=5)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    lu = BandedLU.from_complex_csr(A, nb=16, chunk=8)
    x = lu.solve(b)
    for _ in range(3):
        r = b - A @ x
        x = x + lu.solve(r)
    rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert rel < 1e-12


def test_band_lu_shifted_saddle_point():
    """Shift-inverted Stokes operator (zero pressure diagonal): the
    shifted saddle point the eigensolver factorizes."""
    from lsafw_tpu.config import BoundaryConditionsConfig
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler

    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 8, 8)

    def marker(x):
        out = np.ones(x.shape[0], np.int32)
        out[np.isclose(x[:, 0], 1.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    # pressure Dirichlet at the outlet kills the constant-pressure
    # nullspace (otherwise C = A - sigma M is exactly singular and no
    # solver can close the residual)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=2, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    w = jnp.zeros(spaces.num_dofs)
    asm = LinearizedNavierStokesAssembler(w, ctx, 10.0, bcs, mesh)
    A, M = asm.assemble_eigensystem()
    sigma = 0.05 + 0.75j
    C = (A.to_scipy().astype(np.complex128) - sigma * M.to_scipy()).tocsr()
    rng = np.random.default_rng(4)
    n = C.shape[0]
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    lu = BandedLU.from_complex_csr(C, nb=32, chunk=8, delta=1e-6)
    x = lu.solve(b)
    rel0 = np.linalg.norm(C @ x - b) / np.linalg.norm(b)
    # pivot-free elimination on the saddle point grows some error; the
    # contract is contraction per refinement pass, not one-shot accuracy
    assert np.isfinite(rel0) and rel0 < 0.2
    for _ in range(8):
        x = x + lu.solve(b - C @ x)
    rel = np.linalg.norm(C @ x - b) / np.linalg.norm(b)
    assert rel < 1e-9  # refinement closes to solver grade


def test_newton_banded_inner_solver():
    """Newton with the banded device inner solver matches the LU path
    on a lid-driven cavity baseflow (pattern-reusing refactorization)."""
    from lsafw_tpu.config import BoundaryConditionsConfig
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import StationaryNavierStokesAssembler
    from lsafw_tpu.solver.newton import NewtonSolver

    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 8, 8)

    def marker(x):
        out = np.ones(x.shape[0], np.int32)
        out[np.isclose(x[:, 1], 1.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=2, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    # cavity has no pressure BC: pin one pressure DOF to fix the constant
    pin = spaces.dofs_p[0]
    bcs.dirichlet_mask[pin] = True
    bcs.dirichlet_values[pin] = 0.0
    ctx = AssemblyContext.build(spaces)
    asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
    w0 = np.zeros(spaces.num_dofs)
    ref = NewtonSolver(asm, linear_solver="lu").solve(w0, 50.0, tol=1e-9)
    got = NewtonSolver(asm, linear_solver="banded").solve(w0, 50.0, tol=1e-9)
    assert got.converged and ref.converged
    assert np.linalg.norm(got.w - ref.w) / np.linalg.norm(ref.w) < 1e-7


def test_plan_build_does_not_mutate_pattern():
    """Regression: handing pattern arrays to scipy without copying let
    eliminate_zeros() corrupt them in place (round 2)."""
    from lsafw_tpu.solver.band import plan_for_csr

    A = _random_banded(120, 7, seed=9)
    from lsafw_tpu.ops.sparse import CSRMatrix

    Ac = CSRMatrix.from_scipy(A.real.tocsr())
    idx0 = Ac.pattern.indices.copy()
    ptr0 = Ac.pattern.indptr.copy()
    plan_for_csr(Ac)
    assert np.array_equal(Ac.pattern.indices, idx0)
    assert np.array_equal(Ac.pattern.indptr, ptr0)


# ---------------------------------------------------------------------------
# Panel-pivoted factorization (round-3 robustness path)
# ---------------------------------------------------------------------------


def _growth_bomb(n=256, nb=16):
    """Tiny pivots whose large partners live in a DIFFERENT nb-block:
    the diagonal-block embedded inversion pivots only within its own
    block, so the pivot-free elimination forms huge multipliers
    (E D^-1) and the factor destroys accuracy; cross-block panel
    pivoting handles it — the class of failure behind the round-2
    "Banded MR solve failed" degradations."""
    D = sp.lil_matrix((n, n), dtype=np.complex128)
    for i in range(n):
        blk = (i // nb) % 2
        D[i, i] = 1e-7
        if blk == 0 and i + nb < n:
            D[i, i + nb] = 1.0
            D[i + nb, i] = 1.0
        # keep odd blocks internally coupled but leave even DIAGONAL
        # BLOCKS essentially eps*I — their embedded inversion has no
        # usable pivot inside the block
        if blk == 1 and i + 1 < n and (i + 1) // nb == i // nb:
            D[i, i + 1] = 0.3
            D[i + 1, i] = 0.3
    return D.tocsr()


@pytest.mark.parametrize("nb,chunk", [(16, 8), (32, 4)])
def test_pivoted_band_lu_matches_scipy(nb, chunk):
    from lsafw_tpu.solver.band import PivotedBandedLU

    n, bw = 300, 21
    A = _random_banded(n, bw)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    lu = PivotedBandedLU.from_complex_csr(A, nb=nb, chunk=chunk)
    x = lu.solve(b)
    ref = spla.splu(A.tocsc()).solve(b)
    rel = np.linalg.norm(x - ref) / np.linalg.norm(ref)
    assert rel < 5e-5


def test_pivoted_band_lu_survives_growth_bomb():
    from lsafw_tpu.solver.band import BandedLU, PivotedBandedLU

    A = _growth_bomb()
    n = A.shape[0]
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ref = spla.splu(A.tocsc()).solve(b)
    # pin the natural ordering: the native George-Liu RCM happens to
    # reorder this fixture into a benign elimination sequence, which
    # would defuse the regression (orderings must not be relied on for
    # stability — that is the pivoting's job)
    perm = np.arange(n)
    lu_p = PivotedBandedLU.from_complex_csr(A, nb=16, chunk=8, perm=perm)
    x_p = lu_p.solve(b)
    rel_p = np.linalg.norm(x_p - ref) / np.linalg.norm(ref)
    assert rel_p < 1e-4, f"pivoted factor inaccurate: {rel_p:.2e}"
    # the pivot-free factor must actually fail on this operator —
    # otherwise the regression fixture is meaningless
    lu_f = BandedLU.from_complex_csr(A, nb=16, chunk=8, perm=perm)
    x_f = lu_f.solve(b)
    rel_f = np.linalg.norm(x_f - ref) / np.linalg.norm(ref)
    # the 1e7 multipliers wipe ~7 digits: solver-grade accuracy is gone
    # (measured rel ~0.33) while the pivoted factor keeps ~1e-8
    assert not np.isfinite(rel_f) or rel_f > 1e-2


def test_pivoted_band_lu_zero_diagonal_saddle():
    """Interleaved saddle-point with exactly-zero pressure diagonals:
    the pivoted factor needs no regularization at all."""
    from lsafw_tpu.solver.band import PivotedBandedLU

    m = 120
    K = sp.diags(
        [4.0 * np.ones(m), -np.ones(m - 1), -np.ones(m - 1)], [0, -1, 1]
    )
    G = sp.diags([np.ones(m), 0.7 * np.ones(m - 1)], [0, -1], shape=(m, m))
    S = sp.bmat([[K, G], [G.T, None]], format="csr")
    pidx = np.empty(2 * m, dtype=np.int64)
    pidx[0::2] = np.arange(m)
    pidx[1::2] = np.arange(m, 2 * m)
    Si = sp.csr_matrix(S[pidx][:, pidx].astype(np.complex128))
    rng = np.random.default_rng(4)
    b = rng.standard_normal(2 * m) + 1j * rng.standard_normal(2 * m)
    lu = PivotedBandedLU.from_complex_csr(Si, nb=16, chunk=8)
    x = lu.solve(b)
    ref = spla.splu(Si.tocsc()).solve(b)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 5e-5


def test_factor_auto_policy():
    """factor_auto picks the pivoted path when memory allows and the
    pivot-free path (with saddle regularization) above the budget."""
    import os

    import jax.numpy as jnp

    from lsafw_tpu.solver.band import BandPlan, factor_auto

    A = _random_banded(200, 11, seed=5)
    plan = BandPlan.build(A.tocsr(), nb=16, chunk=8)
    dre = jnp.asarray(np.ascontiguousarray(A.data.real))
    dim = jnp.asarray(np.ascontiguousarray(A.data.imag))
    lu, pivoted = factor_auto(plan, dre, dim)
    assert pivoted
    old = os.environ.get("LSAFW_PIVOT_MEM_GB")
    os.environ["LSAFW_PIVOT_MEM_GB"] = "0"
    try:
        lu2, pivoted2 = factor_auto(plan, dre, dim)
        assert not pivoted2
    finally:
        if old is None:
            del os.environ["LSAFW_PIVOT_MEM_GB"]
        else:
            os.environ["LSAFW_PIVOT_MEM_GB"] = old
    rng = np.random.default_rng(6)
    b = rng.standard_normal(200) + 1j * rng.standard_normal(200)
    for l in (lu, lu2):
        xr, xi = l.solve_pair(jnp.asarray(b.real.copy()), jnp.asarray(b.imag.copy()))
        x = np.asarray(xr) + 1j * np.asarray(xi)
        assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-4


def test_native_rcm_matches_scipy_quality():
    """The C++ RCM (native/sparsity.cpp::lsafw_rcm) must produce a
    valid permutation with bandwidth no worse than ~1.3x scipy's (it is
    usually tighter thanks to the George-Liu start)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from lsafw_tpu.ops.native import rcm_native

    rng = np.random.default_rng(7)
    n = 1500
    # random planar-ish pattern: 2D grid + a few random extra couplings
    g = 38
    A = sp.lil_matrix((n, n), dtype=np.int8)
    for i in range(n):
        A[i, i] = 1
        if i + 1 < n and (i + 1) % g:
            A[i, i + 1] = 1
        if i + g < n:
            A[i, i + g] = 1
    for _ in range(60):
        i, j = rng.integers(0, n, 2)
        A[i, j] = 1
    S = (A.tocsr() + A.tocsr().T).tocsr()
    S.data[:] = 1
    perm = rcm_native(S.indptr, S.indices, n)
    if perm is None:
        import pytest as _pytest

        _pytest.skip("native library unavailable")
    assert sorted(perm) == list(range(n))

    def bw(p):
        ip = np.empty(n, dtype=np.int64)
        ip[p] = np.arange(n)
        coo = S.tocoo()
        return int(np.abs(ip[coo.row] - ip[coo.col]).max())

    b_nat = bw(perm)
    b_sci = bw(np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True)))
    assert b_nat <= max(int(1.3 * b_sci), b_sci + 5)


def test_truncated_band_preconditioner():
    """A band-memory budget clips B; the factorization of the
    band-truncated operator still works as a preconditioner with
    minimal-residual refinement against the TRUE operator (the
    O(n*b) memory-wall escape, VERDICT round-3 item 2)."""
    import jax.numpy as jnp

    from lsafw_tpu.solver.band import BandPlan, PivotedBandedLU

    n, bw, nb = 400, 30, 8
    A = _random_banded(n, bw, seed=11)
    full = BandPlan.build(A.tocsr(), nb=nb, chunk=8)
    assert full.B == 4
    # budget below even the bf16 full band: forces real truncation
    # (the memory ladder tries bf16 storage first)
    small = BandPlan.build(
        A.tocsr(), nb=nb, chunk=8,
        max_bytes=(full.nblk_pad + 2) * 5 * nb * nb * 4 + 1,
    )
    assert small.B < full.B and small.band_dtype == "bf16"
    lu = PivotedBandedLU.factor(
        small,
        jnp.asarray(np.ascontiguousarray(A.data.real)),
        jnp.asarray(np.ascontiguousarray(A.data.imag)),
    )
    rng = np.random.default_rng(12)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = np.zeros(n, dtype=np.complex128)
    r = b.copy()
    rho_hist = []
    for _ in range(50):
        d = lu.solve(r)
        Cd = A @ d
        alpha = np.vdot(Cd, r) / max(np.vdot(Cd, Cd).real, 1e-300)
        x = x + alpha * d
        r = r - alpha * Cd
        rho_hist.append(np.linalg.norm(r) / np.linalg.norm(b))
        if rho_hist[-1] < 1e-10:
            break
    assert rho_hist[-1] < 1e-10, f"refinement stalled: {rho_hist[-5:]}"


def test_bf16_band_storage_preconditions():
    """Memory-ladder step 1: bf16 at-rest band storage (arithmetic
    stays f32) still preconditions to fast MR convergence."""
    import jax.numpy as jnp

    from lsafw_tpu.solver.band import BandPlan, BandedLU

    n, bw, nb = 400, 30, 8
    A = _random_banded(n, bw, seed=21)
    full = BandPlan.build(A.tocsr(), nb=nb, chunk=8)
    fb = (full.nblk_pad + full.B) * full.R * nb * nb
    plan = BandPlan.build(A.tocsr(), nb=nb, chunk=8, max_bytes=fb * 8 - 1)
    assert plan.band_dtype == "bf16" and plan.B == full.B
    lu = BandedLU.factor(
        plan,
        jnp.asarray(np.ascontiguousarray(A.data.real)),
        jnp.asarray(np.ascontiguousarray(A.data.imag)),
    )
    assert lu.band_re.dtype == jnp.bfloat16
    rng = np.random.default_rng(22)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = np.zeros(n, dtype=np.complex128)
    r = b.copy()
    for it in range(25):
        d = lu.solve(r)
        Cd = A @ d
        alpha = np.vdot(Cd, r) / max(np.vdot(Cd, Cd).real, 1e-300)
        x = x + alpha * d
        r = r - alpha * Cd
        if np.linalg.norm(r) / np.linalg.norm(b) < 1e-10:
            break
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10, it


# ---------------------------------------------------------------------------
# Real single-channel factors (half-memory path for real operators)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nb,chunk", [(16, 8), (32, 4)])
def test_real_band_lu_matches_scipy(nb, chunk):
    from lsafw_tpu.solver.band import BandPlan, RealBandedLU

    n, bw = 300, 21
    A = sp.csr_matrix(_random_banded(n, bw, seed=7, complex_=False).real)
    plan = BandPlan.build(A, nb=nb, chunk=chunk, real=True)
    lu = RealBandedLU.factor(plan, jnp.asarray(A.data))
    rng = np.random.default_rng(8)
    b = rng.standard_normal(n)
    x = np.asarray(lu.solve_vec(jnp.asarray(b)))
    ref = spla.splu(A.tocsc()).solve(b)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 5e-5
    # pair solve: two independent columns through one band pass
    b2 = rng.standard_normal(n)
    xr, xi = lu.solve_pair(jnp.asarray(b), jnp.asarray(b2))
    assert np.linalg.norm(np.asarray(xr) - ref) / np.linalg.norm(ref) < 5e-5
    ref2 = spla.splu(A.tocsc()).solve(b2)
    assert np.linalg.norm(np.asarray(xi) - ref2) / np.linalg.norm(ref2) < 5e-5


@pytest.mark.parametrize("nb,chunk", [(16, 8)])
def test_real_pivoted_band_lu_matches_scipy(nb, chunk):
    from lsafw_tpu.solver.band import BandPlan, RealPivotedBandedLU

    n, bw = 300, 21
    A = sp.csr_matrix(_random_banded(n, bw, seed=9, complex_=False).real)
    plan = BandPlan.build(A, nb=nb, chunk=chunk, real=True)
    lu = RealPivotedBandedLU.factor(plan, jnp.asarray(A.data))
    rng = np.random.default_rng(10)
    b = rng.standard_normal(n)
    x = np.asarray(lu.solve_vec(jnp.asarray(b)))
    ref = spla.splu(A.tocsc()).solve(b)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 5e-5


def test_real_pivoted_survives_growth_bomb():
    """The real panel pivoting must handle the cross-block tiny-pivot
    operator that breaks the pivot-free elimination (real analogue of
    test_pivoted_band_lu_survives_growth_bomb)."""
    from lsafw_tpu.solver.band import BandPlan, RealBandedLU, RealPivotedBandedLU

    A = sp.csr_matrix(_growth_bomb().real)
    n = A.shape[0]
    rng = np.random.default_rng(11)
    b = rng.standard_normal(n)
    ref = spla.splu(A.tocsc()).solve(b)
    perm = np.arange(n)  # pin natural order (see complex twin)
    plan = BandPlan.build(A, nb=16, chunk=8, perm=perm, real=True)
    lu_p = RealPivotedBandedLU.factor(plan, jnp.asarray(A.data))
    x_p = np.asarray(lu_p.solve_vec(jnp.asarray(b)))
    rel_p = np.linalg.norm(x_p - ref) / np.linalg.norm(ref)
    assert rel_p < 1e-4, f"real pivoted factor inaccurate: {rel_p:.2e}"
    lu_f = RealBandedLU.factor(plan, jnp.asarray(A.data))
    x_f = np.asarray(lu_f.solve_vec(jnp.asarray(b)))
    rel_f = np.linalg.norm(x_f - ref) / np.linalg.norm(ref)
    assert not np.isfinite(rel_f) or rel_f > 1e-2


def test_factor_auto_real_policy():
    """A real plan dispatches to the real factors: pivoted under the
    memory budget, pivot-free (with regularization available) above."""
    import os

    from lsafw_tpu.solver.band import (
        BandPlan, RealBandedLU, RealPivotedBandedLU, factor_auto,
    )

    A = sp.csr_matrix(_random_banded(200, 11, seed=12, complex_=False).real)
    plan = BandPlan.build(A, nb=16, chunk=8, real=True)
    dre = jnp.asarray(A.data)
    lu, pivoted = factor_auto(plan, dre)
    assert pivoted and isinstance(lu, RealPivotedBandedLU)
    old = os.environ.get("LSAFW_PIVOT_MEM_GB")
    os.environ["LSAFW_PIVOT_MEM_GB"] = "0"
    try:
        lu2, pivoted2 = factor_auto(plan, dre)
        assert not pivoted2 and isinstance(lu2, RealBandedLU)
    finally:
        if old is None:
            del os.environ["LSAFW_PIVOT_MEM_GB"]
        else:
            os.environ["LSAFW_PIVOT_MEM_GB"] = old
    rng = np.random.default_rng(13)
    b = rng.standard_normal(200)
    ref = spla.splu(A.tocsc()).solve(b)
    for l in (lu, lu2):
        x = np.asarray(l.solve_vec(jnp.asarray(b)))
        assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-4
    # complex data on a real plan must be rejected
    with pytest.raises(ValueError):
        factor_auto(plan, dre, jnp.zeros_like(dre))


def test_scatter_band_chunked_matches_unchunked(monkeypatch):
    """The chunked band fill (the 500k index-temp OOM fix: XLA pads the
    s32[nnz, 4] scatter-index tensor 32x on TPU) is bit-identical to a
    single-shot scatter."""
    import lsafw_tpu.solver.band as band_mod

    n, bw = 400, 25
    A = _random_banded(n, bw)
    b = np.random.default_rng(7).standard_normal(n) + 0.3j
    lu_ref = BandedLU.from_complex_csr(A, nb=16, chunk=8)
    x_ref = lu_ref.solve(b)
    monkeypatch.setattr(band_mod, "_SCATTER_CHUNK", 1000)  # force ~20 chunks
    lu_chk = BandedLU.from_complex_csr(A, nb=16, chunk=8)
    np.testing.assert_array_equal(
        np.asarray(lu_chk.band_re), np.asarray(lu_ref.band_re))
    np.testing.assert_array_equal(
        np.asarray(lu_chk.band_im), np.asarray(lu_ref.band_im))
    np.testing.assert_array_equal(np.asarray(lu_chk.solve(b)), np.asarray(x_ref))


def test_band_plan_force_f32_ladder():
    """force_f32 truncates B to the budget at f32 storage instead of
    keeping full width in bf16 (the 500k bf16-instability retry rung)."""
    from lsafw_tpu.ops.sparse import CSRMatrix
    from lsafw_tpu.solver.band import plan_for_csr

    A = CSRMatrix.from_scipy(_random_banded(800, 60).tocsr())
    # budget that fits bf16 full width (258 KB) but not f32 full (516 KB)
    full = plan_for_csr(A, nb=16, chunk=4, max_bytes=300_000, real=True)
    assert full.band_dtype == "bf16"
    trunc = plan_for_csr(A, nb=16, chunk=4, max_bytes=300_000, real=True,
                         force_f32=True)
    assert trunc.band_dtype == "f32"
    assert trunc.B < full.B


def test_banded_gcr_beats_single_direction_on_truncated_band():
    """With a budget-TRUNCATED band preconditioner, the GCR(m) window
    converges where the round-3 single-direction MR stalls (the 500k
    Stokes failure mode)."""
    import jax.numpy as jnp

    from lsafw_tpu.ops.sparse import CSRMatrix
    from lsafw_tpu.solver.band import factor_auto, plan_for_csr
    from lsafw_tpu.solver.newton import _banded_mr

    A = _random_banded(900, 40).real.tocsr()  # real, diagonally dominant
    Ac = CSRMatrix.from_scipy(A)
    # truncate the band hard: B=1 of ceil(40/16)=3
    plan = plan_for_csr(Ac, nb=16, chunk=4, real=True, force_f32=True,
                        max_bytes=40_000)
    assert plan.B < 3
    blu, _ = factor_auto(plan, Ac.data)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(900))
    res1 = _banded_mr(Ac, blu, b, tol=1e-11, max_its=60, m=1)
    res8 = _banded_mr(Ac, blu, b, tol=1e-11, max_its=60, m=8)
    assert float(res8.residual) < 1e-11, float(res8.residual)
    # the Krylov window can only help: never more iterations than MR(1)
    assert int(res8.iterations) <= int(res1.iterations)
