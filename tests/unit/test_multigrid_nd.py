"""N-D multigrid V-cycle: 3D cube membrane EVP + 2D cross-check."""

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.meshing.mesh import box_mesh, rectangle_mesh
from lsafw_tpu.models.membrane import (
    analytic_eigenvalues,
    analytic_eigenvalues_3d,
    assemble_membrane_evp,
)
from lsafw_tpu.ops.stencil_nd import build_stencil_nd
from lsafw_tpu.solver.multigrid_nd import build_multigrid_nd_pc
from lsafw_tpu.solver.power import lobpcg_block_pc, lobpcg_smallest_pc


def _setup_3d(nd=8):
    mesh = box_mesh((0, 0, 0), (1.0, 1.0, 1.0), nd, nd, nd)
    K, M, mask = assemble_membrane_evp(mesh)
    pc = build_multigrid_nd_pc(mesh, K, mask)
    from lsafw_tpu.fem.spaces import make_scalar_space

    space = make_scalar_space(mesh, "p2")
    Mop = build_stencil_nd(K.pattern, np.asarray(M.data), [(space, 1)],
                           bc_mask=mask, bc_diag=0.0)
    return mesh, K, M, mask, pc, Mop


def test_vcycle3d_contracts_error():
    """One 3D V-cycle must contract the error of K x = b well below
    the Jacobi rate."""
    mesh, K, M, mask, pc, _ = _setup_3d(8)
    rng = np.random.default_rng(0)
    n = K.shape[0]
    x_true = np.where(mask, 0.0, rng.standard_normal(n))
    xp_true = pc.op2.pack(jnp.asarray(x_true))
    b = pc.op2.matvec(xp_true)
    x = jnp.zeros_like(b)
    errs = []
    for _ in range(6):
        x = x + pc.apply(b - pc.op2.matvec(x))
        errs.append(float(jnp.linalg.norm(x - xp_true) / jnp.linalg.norm(xp_true)))
    rho = (errs[-1] / errs[0]) ** (1 / 5)
    assert rho < 0.5, (errs, rho)


def test_mg3d_lobpcg_cube():
    """Smallest cube eigenvalue (3 pi^2) through the 3D V-cycle."""
    mesh, K, M, mask, pc, Mop = _setup_3d(8)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    x0 = pc.op2.pack(x0)
    res = lobpcg_smallest_pc(pc.op2, Mop, x0, pc, tol=1e-9, max_iter=100)
    exact = analytic_eigenvalues_3d(1.0, 1.0, 1.0, 1)[0]
    lam = float(res.eigenvalue)
    # 8^3 P2 discretization error ~1e-4 relative
    assert abs(lam - exact) / exact < 1e-3, (lam, exact)
    assert int(res.iterations) < 60, int(res.iterations)


def test_mg3d_lobpcg_block_degenerate():
    """Blocked LOBPCG through the 3D V-cycle resolves the cube's
    degenerate second eigenvalue (6 pi^2, multiplicity 3).  Compared
    against the DISCRETE spectrum (scipy eigsh on the same pencil):
    the discretization error of the (2,1,1) modes at 8^3 (~3e-3) is
    not the solver's to answer for."""
    import scipy.sparse.linalg as spla

    mesh, K, M, mask, pc, Mop = _setup_3d(8)
    rng = np.random.default_rng(2)
    m = 4
    X0 = []
    for i in range(m):
        X0.append(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    X0 = jnp.stack([pc.op2.pack(jnp.asarray(x)) for x in X0])
    res = lobpcg_block_pc(pc.op2, Mop, X0, pc, tol=1e-8, max_iter=200)
    lams = np.asarray(res.eigenvalues)
    discrete = np.sort(spla.eigsh(
        K.to_scipy().astype(np.float64), k=m, M=M.to_scipy().astype(np.float64),
        sigma=20.0, which="LM", return_eigenvectors=False,
    ))
    exact = analytic_eigenvalues_3d(1.0, 1.0, 1.0, m)
    for i in range(m):
        assert abs(lams[i] - discrete[i]) / discrete[i] < 1e-6, (
            i, lams[i], discrete[i])
        assert abs(lams[i] - exact[i]) / exact[i] < 1e-2, (i, lams[i], exact[i])


def test_mgnd_2d_matches_2d_impl():
    """The N-D builder on a 2D rectangle solves the same problem as
    the dedicated 2D multigrid (same physics, independent code)."""
    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 16, 32)
    K, M, mask = assemble_membrane_evp(mesh)
    pc = build_multigrid_nd_pc(mesh, K, mask)
    from lsafw_tpu.fem.spaces import make_scalar_space

    space = make_scalar_space(mesh, "p2")
    Mop = build_stencil_nd(K.pattern, np.asarray(M.data), [(space, 1)],
                           bc_mask=mask, bc_diag=0.0)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    x0 = pc.op2.pack(x0)
    res = lobpcg_smallest_pc(pc.op2, Mop, x0, pc, tol=1e-9, max_iter=100)
    exact = analytic_eigenvalues(2.0, 4.0, 1)[0]
    lam = float(res.eigenvalue)
    assert abs(lam - exact) / exact < 1e-4, (lam, exact)
