"""SIPG DG Laplacian (beyond the reference, whose DG space is an
unimplemented stub — ``/root/reference/FEM/spaces.py``)."""

import numpy as np
import scipy.sparse.linalg as spla

from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.models.dg import assemble_dg_poisson
from lsafw_tpu.models.membrane import analytic_eigenvalues


def _dg_eigs(n, count, eta=10.0):
    mesh = rectangle_mesh((0, 0), (2.0, 4.0), n, 2 * n)
    K, M = assemble_dg_poisson(mesh, eta=eta)
    Ks, Ms = K.to_scipy(), M.to_scipy()
    vals = spla.eigsh(Ks, k=count, M=Ms, sigma=1.0, which="LM",
                      return_eigenvectors=False)
    return np.sort(vals)


def test_dg_spd_and_symmetric():
    mesh = rectangle_mesh((0, 0), (1.0, 1.0), 6, 6)
    K, M = assemble_dg_poisson(mesh)
    Ks = K.to_scipy()
    assert abs(Ks - Ks.T).max() < 1e-12
    w = spla.eigsh(Ks, k=1, which="SA", return_eigenvectors=False)
    assert w[0] > 0  # Dirichlet Nitsche terms: strictly positive


def test_dg_membrane_eigenvalues():
    got = _dg_eigs(16, 3)
    ref = analytic_eigenvalues(2.0, 4.0, 3)
    rel = np.abs(got - ref) / ref
    assert np.all(rel < 2e-2), rel


def test_dg_eigenvalue_convergence():
    """P1 SIPG eigenvalues converge at O(h^2)."""
    ref = analytic_eigenvalues(2.0, 4.0, 1)[0]
    e1 = abs(_dg_eigs(8, 1)[0] - ref) / ref
    e2 = abs(_dg_eigs(16, 1)[0] - ref) / ref
    rate = np.log2(e1 / e2)
    assert rate > 1.6, (e1, e2, rate)


def test_dg_poisson_manufactured():
    """-lap u = f with u = sin(pi x) sin(pi y): L2 error O(h^2)."""
    errs = []
    for n in (8, 16):
        mesh = rectangle_mesh((0, 0), (1.0, 1.0), n, n)
        K, M = assemble_dg_poisson(mesh, eta=12.0)
        # DG nodal coordinates: cell vertices in cell order
        coords = mesh.vertices[mesh.cells].reshape(-1, 2)
        u_ex = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
        f = 2 * np.pi**2 * u_ex
        b = M.to_scipy() @ f
        u = spla.spsolve(K.to_scipy().tocsc(), b)
        e = u - u_ex
        errs.append(float(np.sqrt(e @ (M.to_scipy() @ e))))
    rate = np.log2(errs[0] / errs[1])
    assert errs[1] < 2e-2 and rate > 1.6, (errs, rate)


def test_dg_3d_box_eigenvalues():
    """3D SIPG on tets: lowest Dirichlet-Laplacian eigenvalues of the
    unit cube vs pi^2 (l^2 + m^2 + n^2)."""
    from lsafw_tpu.meshing.mesh import unit_cube
    from lsafw_tpu.models.membrane import analytic_eigenvalues_3d

    mesh = unit_cube(8)
    K, M = assemble_dg_poisson(mesh, eta=12.0)
    vals = spla.eigsh(K.to_scipy(), k=2, M=M.to_scipy(), sigma=25.0,
                      which="LM", return_eigenvectors=False)
    got = np.sort(vals)
    ref = analytic_eigenvalues_3d(1.0, 1.0, 1.0, 2)
    rel = np.abs(got - ref) / ref
    assert np.all(rel < 5e-2), (got, ref, rel)
