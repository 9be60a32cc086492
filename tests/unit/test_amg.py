"""Smoothed-aggregation AMG (the GAMG/hypre role,
``/root/reference/Solver/utils.py:84-88``): mesh-free multigrid on the
bare assembled matrix."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix, spmv
from lsafw_tpu.solver.amg import amg_preconditioner, build_amg
from lsafw_tpu.solver.linear import cg


def _laplacian_2d(nx):
    """5-point Laplacian on an nx x nx grid (Dirichlet)."""
    n1 = nx
    main = 4.0 * np.ones(n1 * n1)
    ex = np.ones(n1 * n1 - 1)
    ex[np.arange(1, n1 * n1) % n1 == 0] = 0.0
    ey = np.ones(n1 * (n1 - 1))
    return sp.diags(
        [main, -ex, -ex, -ey, -ey], [0, -1, 1, -n1, n1]
    ).tocsr()


def test_amg_hierarchy_coarsens():
    A = CSRMatrix.from_scipy(_laplacian_2d(40))
    h = build_amg(A, coarse_size=100)
    assert len(h.levels) >= 2
    sizes = [lv.A.shape[0] for lv in h.levels]
    assert sizes == sorted(sizes, reverse=True)
    assert h.coarse_inv.shape[0] <= 150  # aggregation may overshoot a bit


def test_amg_mesh_independent_cg():
    """CG + AMG iteration counts stay ~flat as the grid refines (the
    multigrid property), far below unpreconditioned counts."""
    iters = {}
    for nx in (24, 48):
        A = CSRMatrix.from_scipy(_laplacian_2d(nx))
        rng = np.random.default_rng(1)
        x_true = rng.standard_normal(A.shape[0])
        b = spmv(A, jnp.asarray(x_true))
        mv = lambda v: spmv(A, v)
        res_p = cg(mv, b, tol=1e-10, maxiter=5000)
        res_a = cg(mv, b, tol=1e-10, maxiter=500, M=amg_preconditioner(A))
        assert bool(res_a.converged), nx
        iters[nx] = (int(res_a.iterations), int(res_p.iterations))
        rel = float(jnp.linalg.norm(mv(res_a.x) - b) / jnp.linalg.norm(b))
        assert rel < 1e-8
    # multigrid: iteration growth under refinement stays mild while
    # plain CG roughly doubles
    assert iters[48][0] <= 2 * iters[24][0]
    assert iters[48][0] * 4 < iters[48][1]


def test_amg_on_unstructured_no_mesh_info():
    """The capability PMG lacks: multigrid for a matrix with no mesh or
    space attached (e.g. loaded from .mtx) — here an unstructured
    distmesh disc stiffness matrix used as a bare CSR."""
    from lsafw_tpu.meshing.geometries import distmesh2d
    from lsafw_tpu.meshing.mesh import CellType, Mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp

    fd = lambda p: np.sqrt((p**2).sum(axis=1)) - 1.0
    fh = lambda p: np.ones(p.shape[0])
    pts, tris = distmesh2d(fd, fh, 0.08, (-1, 1, -1, 1), max_iter=80, seed=3)
    mesh = Mesh(pts, tris, CellType.TRIANGLE)
    K, _, _ = assemble_membrane_evp(mesh)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(K.shape[0])
    b = spmv(K, jnp.asarray(x_true))
    mv = lambda v: spmv(K, v)
    res_p = cg(mv, b, tol=1e-10, maxiter=4000)
    res_a = cg(mv, b, tol=1e-10, maxiter=300, M=amg_preconditioner(K))
    assert bool(res_a.converged)
    assert int(res_a.iterations) * 3 < int(res_p.iterations)


def test_amg_menu_entry():
    from lsafw_tpu.solver.precond import make_preconditioner

    A = CSRMatrix.from_scipy(_laplacian_2d(20))
    for kind in ("gamg", "hypre"):
        M = make_preconditioner(A, kind)
        rng = np.random.default_rng(3)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        res = cg(lambda v: spmv(A, v), b, tol=1e-10, maxiter=200, M=M)
        assert bool(res.converged), kind
