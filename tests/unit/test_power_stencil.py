"""Device-resident inverse iteration on the membrane stencil EVP."""

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.models.membrane import analytic_eigenvalues, assemble_membrane_evp
from lsafw_tpu.ops.stencil import build_stencil_operator
from lsafw_tpu.solver.power import shift_invert_power


def test_membrane_leading_eigenvalue_stencil():
    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 16, 32)
    K, M, mask = assemble_membrane_evp(mesh)
    from lsafw_tpu.fem.spaces import make_scalar_space

    space = make_scalar_space(mesh, "p2")
    blocks = [(space, 1)]
    Kop = build_stencil_operator(K.pattern, np.asarray(K.data), blocks,
                                 bc_mask=mask, bc_diag=1.0)
    Mop = build_stencil_operator(K.pattern, np.asarray(M.data), blocks,
                                 bc_mask=mask, bc_diag=0.0)
    # Jacobi preconditioner diag of (K - sigma M) in packed layout
    sigma = 1.0
    dK = np.asarray(K.diagonal())
    dM = np.asarray(M.diagonal())
    d = (dK - sigma * dM)[Kop.structure.perm]
    inv_diag = jnp.asarray(np.where(np.abs(d) > 0, 1.0 / np.where(d == 0, 1, d), 1.0))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(Kop.structure.packed_size))
    res = shift_invert_power(Kop, Mop, sigma, x0, inv_diag,
                             tol=1e-12, max_outer=50, cg_iters=300)
    exact = analytic_eigenvalues(2.0, 4.0, 1)[0]
    lam = float(res.eigenvalue)
    # discretization error bound (16x32 P2): ~1e-6 relative
    assert abs(lam - exact) / exact < 1e-4, (lam, exact)
    assert float(res.residual) < 1e-6


def test_membrane_lobpcg():
    from lsafw_tpu.solver.power import lobpcg_smallest

    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 16, 32)
    K, M, mask = assemble_membrane_evp(mesh)
    from lsafw_tpu.fem.spaces import make_scalar_space

    space = make_scalar_space(mesh, "p2")
    blocks = [(space, 1)]
    Kop = build_stencil_operator(K.pattern, np.asarray(K.data), blocks,
                                 bc_mask=mask, bc_diag=1.0)
    Mop = build_stencil_operator(K.pattern, np.asarray(M.data), blocks,
                                 bc_mask=mask, bc_diag=0.0)
    dK = np.asarray(K.diagonal())[Kop.structure.perm]
    inv_diag = jnp.asarray(np.where(np.abs(dK) > 0, 1.0 / np.where(dK == 0, 1, dK), 1.0))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal(Kop.structure.packed_size))
    res = lobpcg_smallest(Kop, Mop, x0, inv_diag, tol=1e-10, max_iter=2000)
    exact = analytic_eigenvalues(2.0, 4.0, 1)[0]
    lam = float(res.eigenvalue)
    assert abs(lam - exact) / exact < 1e-4, (lam, exact, int(res.iterations))


def test_membrane_lobpcg_block():
    """Blocked (multi-pair) LOBPCG: first three membrane eigenvalues at
    once, checked against the analytic Laplace spectrum and for mutual
    M-orthogonality of the returned block."""
    from lsafw_tpu.ops.dots import ddot
    from lsafw_tpu.solver.power import lobpcg_block

    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 16, 32)
    K, M, mask = assemble_membrane_evp(mesh)
    from lsafw_tpu.fem.spaces import make_scalar_space

    space = make_scalar_space(mesh, "p2")
    blocks = [(space, 1)]
    Kop = build_stencil_operator(K.pattern, np.asarray(K.data), blocks,
                                 bc_mask=mask, bc_diag=1.0)
    Mop = build_stencil_operator(K.pattern, np.asarray(M.data), blocks,
                                 bc_mask=mask, bc_diag=0.0)
    dK = np.asarray(K.diagonal())[Kop.structure.perm]
    inv_diag = jnp.asarray(np.where(np.abs(dK) > 0, 1.0 / np.where(dK == 0, 1, dK), 1.0))
    rng = np.random.default_rng(2)
    m = 3
    X0 = jnp.asarray(rng.standard_normal((m, Kop.structure.packed_size)))
    res = lobpcg_block(Kop, Mop, X0, inv_diag, tol=1e-9, max_iter=3000)
    exact = analytic_eigenvalues(2.0, 4.0, m)
    lams = np.asarray(res.eigenvalues)
    for i in range(m):
        assert abs(lams[i] - exact[i]) / exact[i] < 1e-3, (
            i, lams[i], exact[i], int(res.iterations))
    # block M-orthonormality
    for i in range(m):
        for j in range(i, m):
            g = float(ddot(res.eigenvectors[i], Mop.matvec(res.eigenvectors[j])))
            assert abs(g - (1.0 if i == j else 0.0)) < 1e-8, (i, j, g)
