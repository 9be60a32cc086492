"""Unstructured p-multigrid (P2->P1 + banded coarse solve) quality.

The preconditioner class the reference gets from GAMG/hypre
(``/root/reference/Solver/utils.py:84-88``) exercised on a genuinely
unstructured distmesh disc: V-cycle contraction, CG acceleration vs
Jacobi with near-mesh-independent counts, and an MG-LOBPCG eigensolve
against the analytic disc eigenvalue.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.fem.spaces import make_scalar_space
from lsafw_tpu.meshing.geometries import distmesh2d
from lsafw_tpu.meshing.mesh import CellType, Mesh
from lsafw_tpu.models.membrane import assemble_membrane_evp
from lsafw_tpu.solver.linear import cg
from lsafw_tpu.solver.pmg import build_pmg_pc
from lsafw_tpu.solver.power import lobpcg_smallest_pc

J01 = 2.404825557695773  # first zero of J0: disc eigenvalue j01^2


def disc_mesh(h0: float) -> Mesh:
    fd = lambda p: np.sqrt((p**2).sum(axis=1)) - 1.0
    fh = lambda p: np.ones(p.shape[0])
    pts, tris = distmesh2d(fd, fh, h0, (-1, 1, -1, 1), max_iter=80, seed=3)
    return Mesh(pts, tris, CellType.TRIANGLE)


def _setup(h0: float):
    mesh = disc_mesh(h0)
    K, M, mask = assemble_membrane_evp(mesh)
    space = make_scalar_space(mesh, "p2")
    pc = build_pmg_pc(space, K, mask, nb=32)
    return mesh, space, K, M, mask, pc


def _cg_iters(K, mask, M_apply):
    rng = np.random.default_rng(0)
    b = jnp.asarray(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    res = cg(K.matvec, b, tol=1e-10, maxiter=500, M=M_apply)
    assert bool(res.converged), float(res.residual)
    return int(res.iterations)


def test_pmg_vcycle_contracts():
    mesh, space, K, M, mask, pc = _setup(0.12)
    rng = np.random.default_rng(1)
    x_true = jnp.asarray(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    b = K.matvec(x_true)
    x = jnp.zeros_like(b)
    errs = []
    for _ in range(6):
        x = x + pc.apply(b - K.matvec(x))
        errs.append(float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))
    rho = (errs[-1] / errs[0]) ** (1 / 5)
    assert rho < 0.35, (errs, rho)


def test_pmg_cg_beats_jacobi_and_mesh_independent():
    iters = {}
    for h0 in (0.16, 0.08):
        mesh, space, K, M, mask, pc = _setup(h0)
        d = np.asarray(K.diagonal())
        inv_d = jnp.asarray(1.0 / d)
        it_j = _cg_iters(K, mask, lambda r: inv_d * r)
        it_mg = _cg_iters(K, mask, pc.apply)
        assert it_mg * 3 < it_j, (h0, it_mg, it_j)
        iters[h0] = it_mg
    # two-level with exact coarse solve: near-mesh-independent counts
    assert iters[0.08] <= iters[0.16] + 6, iters


def test_pmg_lobpcg_disc_eigenvalue():
    mesh, space, K, M, mask, pc = _setup(0.08)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    res = lobpcg_smallest_pc(K, M, x0, pc, tol=1e-9, max_iter=100)
    lam = float(res.eigenvalue)
    exact = J01**2
    # P2 disc at h~0.08 with straight-edge boundary: sub-percent accuracy
    assert abs(lam - exact) / exact < 5e-3, (lam, exact)
    assert int(res.iterations) < 60, int(res.iterations)
