"""Resolvent analysis vs dense linear algebra on a small LNS system.

The optimal-gain operator T = P^T M C^-H M C^-1 M P (C = i w M - A)
is computed densely (direct inverse) and its generalized Hermitian
eigenvalues against W = P^T M P are the reference; the solver must
reproduce the leading gains through its Lanczos + shift-invert path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.resolvent import ResolventSolver


@pytest.fixture(scope="module")
def lns_case():
    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 6, 6)

    def marker(x):
        out = np.ones(x.shape[0], np.int32)
        out[np.isclose(x[:, 0], 1.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=2, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    # a non-trivial (shear-like) baseflow so A is genuinely nonsymmetric
    coords = spaces.velocity.dof_coords
    nu = spaces.num_velocity_dofs
    w = np.zeros(spaces.num_dofs)
    w[0:nu:2] = coords[0:nu:2, 1] * (1.0 - coords[0:nu:2, 1]) * 4.0
    asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, 30.0, bcs, mesh)
    A, M = asm.assemble_eigensystem()
    return A, M, spaces, bcs


def _dense_gains(A, M, nu, mask, omega, k):
    Ad = A.to_scipy().toarray()
    Md = M.to_scipy().toarray()
    fmask = np.zeros(Ad.shape[0], dtype=bool)
    fmask[:nu] = True
    fmask &= ~np.asarray(mask, dtype=bool)
    fd = np.nonzero(fmask)[0]
    Cd = 1j * omega * Md - Ad
    Q = np.linalg.solve(Cd, Md[:, fd])
    T = Q.conj().T @ Md @ Q
    W = Md[np.ix_(fd, fd)]
    from scipy.linalg import eigh

    gam = eigh(T, W, eigvals_only=True)
    return np.sqrt(np.maximum(gam[::-1][:k], 0.0))


def test_gains_match_dense(lns_case):
    A, M, spaces, bcs = lns_case
    omega, k = 0.8, 3
    ref = _dense_gains(A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, omega, k)
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, method="lu"
    )
    modes = rs.solve(omega, k=k)
    assert np.allclose(modes.gains, ref, rtol=1e-6), (modes.gains, ref)


def test_modes_consistent(lns_case):
    """Unit energies; the response IS the (normalized) resolvent image
    of the forcing with amplification = gain."""
    A, M, spaces, bcs = lns_case
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, method="lu"
    )
    m = rs.solve(1.2, k=1)
    Ms = M.to_scipy()
    f, q, g = m.forcings[0], m.responses[0], m.gains[0]
    assert abs(np.vdot(f, Ms @ f).real - 1.0) < 1e-8
    assert abs(np.vdot(q, Ms @ q).real - 1.0) < 1e-8
    # unnormalized response energy = gain^2
    Cd = 1j * m.omega * Ms - A.to_scipy()
    import scipy.sparse.linalg as spla

    q_raw = spla.spsolve(Cd.tocsc(), Ms @ f)
    assert abs(np.sqrt(np.vdot(q_raw, Ms @ q_raw).real) - g) < 1e-6 * g
    # forcing lives on free velocity DOFs only
    nu = spaces.num_velocity_dofs
    assert np.allclose(f[nu:], 0.0)
    assert np.allclose(f[np.asarray(bcs.dirichlet_mask)], 0.0)


def test_gain_curve_peak(lns_case):
    """The gain curve is finite, positive, and frequency-dependent."""
    A, M, spaces, bcs = lns_case
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, method="lu"
    )
    sweep = rs.gain_curve([0.4, 0.8, 1.6], k=1)
    gains = np.array([m.gains[0] for m in sweep])
    assert np.all(np.isfinite(gains)) and np.all(gains > 0)
    assert gains.max() / gains.min() > 1.0 + 1e-6


def test_banded_matches_lu(lns_case):
    """The device banded inner solve reproduces the host-LU gains
    (the production backend for large operators)."""
    A, M, spaces, bcs = lns_case
    kw = dict(num_velocity_dofs=spaces.num_velocity_dofs,
              dirichlet_mask=bcs.dirichlet_mask)
    g_lu = ResolventSolver(A, M, method="lu", **kw).solve(0.8, k=2).gains
    g_bd = ResolventSolver(A, M, method="banded", **kw).solve(0.8, k=2).gains
    assert np.allclose(g_bd, g_lu, rtol=1e-6), (g_bd, g_lu)


def test_transpose_pair_shared_pattern(lns_case):
    from lsafw_tpu.ops.sparse import transpose_pair

    A, M, _, _ = lns_case
    At, Mt = transpose_pair(A, M)
    assert At.pattern is Mt.pattern
    assert At.pattern.has_full_diagonal
    assert np.allclose((At.to_scipy() - A.to_scipy().T).toarray(), 0.0)
    assert np.allclose((Mt.to_scipy() - M.to_scipy().T).toarray(), 0.0)


def test_response_mode_shape(lns_case):
    """responses[0] is the NORMALIZED true response C^-1 M f (a
    regression for the double-M bug caught in review)."""
    import scipy.sparse.linalg as spla

    A, M, spaces, bcs = lns_case
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, method="lu"
    )
    m = rs.solve(0.8, k=1)
    Ms = M.to_scipy()
    Cd = 1j * m.omega * Ms - A.to_scipy()
    q_raw = spla.spsolve(Cd.tocsc(), Ms @ m.forcings[0])
    q_raw /= np.sqrt(np.vdot(q_raw, Ms @ q_raw).real)
    corr = abs(np.vdot(m.responses[0], Ms @ q_raw))
    assert abs(corr - 1.0) < 1e-8, corr


def _dense_norm_at(A, M, nu, mask, z):
    Ad = A.to_scipy().toarray()
    Md = M.to_scipy().toarray()
    fmask = np.zeros(Ad.shape[0], dtype=bool)
    fmask[:nu] = True
    fmask &= ~np.asarray(mask, dtype=bool)
    fd = np.nonzero(fmask)[0]
    Cd = z * Md - Ad
    Q = np.linalg.solve(Cd, Md[:, fd])
    T = Q.conj().T @ Md @ Q
    W = Md[np.ix_(fd, fd)]
    from scipy.linalg import eigh

    gam = eigh(T, W, eigvals_only=True)
    return float(np.sqrt(max(gam[-1], 0.0)))


def test_pseudospectrum_matches_dense(lns_case):
    """The resolvent norm at COMPLEX z (pseudospectrum machinery) must
    match the dense computation, and must blow up ~1/eps as z
    approaches an eigenvalue of the pencil."""
    import scipy.linalg as sla

    A, M, spaces, bcs = lns_case
    nu, mask = spaces.num_velocity_dofs, bcs.dirichlet_mask
    rs = ResolventSolver(A, M, nu, mask, method="lu")
    for z in (-0.5 + 0.8j, 0.2 - 0.3j):
        got = rs.resolvent_norm(z, tol=1e-9)
        ref = _dense_norm_at(A, M, nu, mask, z)
        assert abs(got - ref) < 1e-5 * ref, (z, got, ref)
    # the 2x2 pseudospectrum grid wraps the same call
    G = rs.pseudospectrum([-0.5, 0.2], [0.8], tol=1e-9)
    assert G.shape == (1, 2) and G[0, 0] > 0
    # divergence near an eigenvalue
    lam = sla.eig(A.to_scipy().toarray(), M.to_scipy().toarray(),
                  right=False)
    lam = lam[np.isfinite(lam)]
    lam0 = lam[np.argmax(lam.real)]
    n1 = rs.resolvent_norm(complex(lam0) + 0.1, tol=1e-9)
    n2 = rs.resolvent_norm(complex(lam0) + 0.01, tol=1e-9)
    assert n2 > 4.0 * n1, (n1, n2)
