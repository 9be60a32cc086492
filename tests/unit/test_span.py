"""Quasi-3D (spanwise-Fourier) operator gates.

Two machinery gates for :mod:`lsafw_tpu.span`:

* at beta = 0 the (u, v, p) block of A(beta) must equal the 2D
  linearized operator EXACTLY (same element data, same slots) and the
  spanwise couplings must vanish;
* at beta = 2 pi / Lz the quasi-3D spectrum must appear in the
  spectrum of the FULL 3D linearized operator on a z-periodic extruded
  box around the same (analytic, z-invariant) base flow — two totally
  different discretizations of the same physics, agreeing to the 3D
  mesh's z-resolution error.
"""

import numpy as np
import pytest
import scipy.linalg as sla

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import (
    apply_periodic_constraints_matrix,
    define_bcs,
)
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import box_mesh, rectangle_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.span import SpanwiseStability

RE = 50.0
LZ = 2.0  # spanwise period of the 3D reference box (beta = pi)


def _poiseuille(spaces, gdim):
    """Exact-in-P2 channel base flow u = (4 y (1 - y), 0[, 0])."""
    w = np.zeros(spaces.num_dofs)
    coords = spaces.velocity.dof_coords
    nu = spaces.num_velocity_dofs
    comp = np.arange(nu) % gdim
    y = coords[:, 1]
    w[:nu] = np.where(comp == 0, 4.0 * y * (1.0 - y), 0.0)
    return w


def _channel_2d(nx=6, ny=4):
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), nx, ny)

    def marker(x):
        out = np.full(x.shape[0], 3, np.int32)  # walls y = 0, 1
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], 2.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=3, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=2, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    return ctx, mesh, spaces, bcs_pert


def _dense_pencil_eigs(A, M):
    lam = sla.eig(A, M, right=False)
    lam = lam[np.isfinite(lam)]
    return lam[np.abs(lam) < 1e8]


def test_beta0_reduces_to_2d():
    ctx, mesh, spaces, bcs_pert = _channel_2d()
    w = _poiseuille(spaces, 2)
    span = SpanwiseStability(ctx, w, RE, bcs_pert, mesh)
    A, M = span.assemble_eigensystem(0.0)
    n2 = span.n2

    A2, M2 = LinearizedNavierStokesAssembler(
        w, ctx, RE, bcs_pert, mesh).assemble_eigensystem()
    As, Ms = A.to_scipy().tocsr(), M.to_scipy().tocsr()
    dA = (As[:n2, :n2] - A2.to_scipy()).tocoo()
    dM = (Ms[:n2, :n2] - M2.to_scipy()).tocoo()
    assert np.abs(dA.data).max(initial=0.0) < 1e-13
    assert np.abs(dM.data).max(initial=0.0) < 1e-13
    # spanwise couplings vanish at beta = 0
    assert abs(As[:n2, n2:]).max() == 0.0
    assert abs(As[n2:, :n2]).max() == 0.0
    # the w block is a real advection-diffusion operator: nonzero,
    # and strictly stable (all finite eigenvalues damped)
    lam_w = _dense_pencil_eigs(
        As[n2:, n2:].toarray(), Ms[n2:, n2:].toarray())
    assert lam_w.size and lam_w.real.max() < 0.0


def test_spanwise_monodromy_matches_dense():
    """The quasi-3D Floquet trip (via FloquetSolver.from_operator_data)
    equals the dense N-th power of the one-step theta propagator, and
    the inexact (cycle-mean PC) backend equals the prestored one on a
    genuinely varying orbit."""
    from lsafw_tpu.span import spanwise_floquet

    ctx, mesh, spaces, bcs_pert = _channel_2d()
    w = _poiseuille(spaces, 2)
    span = SpanwiseStability(ctx, w, RE, bcs_pert, mesh)
    beta, dt, N = 1.7, 0.2, 4
    fs = spanwise_floquet(span, np.tile(w, (N, 1)), dt, beta, inexact=False)
    A, M = span.assemble_eigensystem(beta)
    Ad, Md = A.to_scipy().toarray(), M.to_scipy().toarray()
    mom = span.momentum_mask()
    Jm = np.where(mom[:, None], Ad, 0.0)
    S = np.linalg.solve(Md - 0.5 * dt * Ad, Md + 0.5 * dt * Jm)
    Phi = np.linalg.matrix_power(S, N)
    rng = np.random.default_rng(2)
    nq = span.num_dofs
    v = rng.standard_normal(nq) + 1j * rng.standard_normal(nq)
    got = fs.monodromy_apply(v)
    ref = Phi @ v
    assert np.linalg.norm(got - ref) < 1e-9 * np.linalg.norm(ref)

    snaps = np.tile(w, (N, 1)) + (
        0.03 * np.abs(w).max() * rng.standard_normal((N, w.size)))
    ref2 = spanwise_floquet(
        span, snaps, dt, beta, inexact=False).monodromy_apply(v)
    got2 = spanwise_floquet(
        span, snaps, dt, beta, inexact=True).monodromy_apply(v)
    assert np.linalg.norm(got2 - ref2) < 1e-8 * np.linalg.norm(ref2)


def _si_eigs(As, Ms, sigma, k=10):
    """Eigenvalues of the pencil nearest ``sigma`` via shift-invert
    ARPACK (handles singular M; infinite modes map to mu = 0)."""
    import scipy.sparse.linalg as spla

    lu = spla.splu((As - sigma * Ms).tocsc())
    n = As.shape[0]
    op = spla.LinearOperator(
        (n, n), matvec=lambda x: lu.solve(Ms @ x), dtype=complex)
    mu, _ = spla.eigs(op, k=k, which="LM", tol=1e-10)
    return sigma + 1.0 / mu


@pytest.mark.slow
def test_quasi3d_matches_3d_periodic():
    beta = 2.0 * np.pi / LZ

    # coarse quasi-3D dense scan locates the least-damped mode
    ctx_c, mesh_c, spaces_c, bcs_c = _channel_2d(6, 4)
    span_c = SpanwiseStability(
        ctx_c, _poiseuille(spaces_c, 2), RE, bcs_c, mesh_c)
    Ac, Mc = span_c.assemble_eigensystem(beta)
    lam_c = _dense_pencil_eigs(Ac.to_scipy().toarray(), Mc.to_scipy().toarray())
    lam_c = lam_c[np.argsort(-lam_c.real)]

    # refined quasi-3D, shift-invert about the coarse leading value
    ctx, mesh, spaces, bcs_pert = _channel_2d(12, 8)
    w2 = _poiseuille(spaces, 2)
    span = SpanwiseStability(ctx, w2, RE, bcs_pert, mesh)
    A, M = span.assemble_eigensystem(beta)
    lam_q = _si_eigs(A.to_scipy().tocsc().astype(complex),
                     M.to_scipy().tocsc().astype(complex),
                     complex(lam_c[0]) + 0.05j, k=8)
    lam_q = lam_q[np.argsort(-lam_q.real)]

    mesh3 = box_mesh((0.0, 0.0, 0.0), (2.0, 1.0, LZ), 12, 8, 8)

    def marker3(x):
        out = np.full(x.shape[0], 3, np.int32)  # walls y = 0, 1
        out[np.isclose(x[:, 2], 0.0)] = 4
        out[np.isclose(x[:, 2], LZ)] = 5
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], 2.0)] = 2
        return out

    mark_boundary_facets(mesh3, marker3)
    spaces3 = define_spaces(mesh3)
    bcs3 = define_bcs(mesh3, spaces3, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
        BoundaryConditionsConfig(marker=3, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
        BoundaryConditionsConfig(marker=2, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=4, type="periodic", value=(4, 5)),
    ])
    ctx3 = AssemblyContext.build(spaces3)
    w3 = _poiseuille(spaces3, 3)
    A3, M3 = LinearizedNavierStokesAssembler(
        w3, ctx3, RE, bcs3, mesh3).assemble_eigensystem()
    for pairs in bcs3.periodic_pairs:
        A3 = apply_periodic_constraints_matrix(A3, pairs)
        M3 = apply_periodic_constraints_matrix(M3, pairs)
    As3 = A3.to_scipy().tocsc().astype(complex)
    Ms3 = M3.to_scipy().tolil()
    for pairs in bcs3.periodic_pairs:  # pinned slaves -> infinity
        Ms3[pairs[0], pairs[0]] = 0.0
    Ms3 = Ms3.tocsc().astype(complex)
    lam_3d = _si_eigs(As3, Ms3, complex(lam_q[0]) + 0.05j, k=12)

    # the leading quasi-3D eigenvalue must have a 3D counterpart (the
    # 3D spectrum is the union over wavenumbers 0, +-beta, ...) to the
    # two meshes' discretization error (measured 0.4% here); deeper
    # modes are less resolved — sanity-level bound only
    d0 = np.abs(lam_3d - lam_q[0]).min()
    assert d0 < 0.02 * max(1.0, abs(lam_q[0])), (lam_q[0], d0)
    for lam in lam_q[1:3]:
        assert np.abs(lam_3d - lam).min() < 0.2 * abs(lam), lam
    # discrimination: beta genuinely moved the spectrum off beta = 0
    A0, M0 = span_c.assemble_eigensystem(0.0)
    lam_q0 = _dense_pencil_eigs(
        A0.to_scipy().toarray(), M0.to_scipy().toarray())
    assert np.abs(lam_q0 - lam_c[0]).min() > 0.2
