"""Multi-device sharding tests on the virtual 8-device CPU mesh.

This is the capability the reference lacks entirely (it assumes
``mpirun``, SURVEY.md section 4): device-mesh behavior validated without
hardware.
"""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from lsafw_tpu.meshing.mesh import unit_square
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.parallel import (
    device_mesh,
    partition_cells,
    shard_csr,
    shard_vector,
)
from lsafw_tpu.parallel.partition import renumber_dofs_by_partition
from lsafw_tpu.parallel.sharded import sharded_solve


@pytest.fixture(scope="module")
def mesh8():
    return device_mesh(jax.devices("cpu")[:8])


def test_partition_cells_balanced():
    mesh = unit_square(8)
    parts = partition_cells(mesh, 8)
    counts = np.bincount(parts, minlength=8)
    assert counts.sum() == mesh.num_cells
    assert counts.max() - counts.min() <= 1


def test_renumber_dofs():
    mesh = unit_square(4)
    parts = partition_cells(mesh, 4)
    perm = renumber_dofs_by_partition(mesh.cells, mesh.num_vertices, parts, 4)
    assert sorted(perm.tolist()) == list(range(mesh.num_vertices))


def test_sharded_spmv_matches_dense(mesh8):
    rng = np.random.default_rng(0)
    A = sp.random(101, 101, 0.1, format="csr", random_state=3) + sp.eye(101)
    Ac = CSRMatrix.from_scipy(sp.csr_matrix(A))
    op = shard_csr(Ac, mesh8)
    x = rng.standard_normal(101)
    xp = shard_vector(x, mesh8)
    y = np.asarray(op.matvec(xp))[:101]
    assert np.allclose(y, A @ x)


def test_sharded_gmres_solves(mesh8):
    n = 96
    A = sp.diags([-1.0, 4.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    Ac = CSRMatrix.from_scipy(A)
    op = shard_csr(Ac, mesh8)
    b = np.ones(n)
    res = sharded_solve(op, b, ksp_type="gmres", tol=1e-12, maxiter=300)
    assert np.allclose(A @ res.x, b, atol=1e-9)


def test_dryrun_multichip_entrypoints():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[2] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)


def test_sharded_krylov_schur_matches_single_device(mesh8):
    """Distributed eigensolve (VERDICT round-1 item 5): the Krylov
    basis sharded P(None, "dof") over 8 devices with RCB-renumbered
    rows reproduces the single-device eigenvalues to 1e-10 (parity:
    the reference's MPI-parallel SLEPc, README.md:43)."""
    from lsafw_tpu.fem.assembly import SpaceContext, stiffness_scalar
    from lsafw_tpu.fem.spaces import make_scalar_space
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.parallel.sharded import sharded_eigensolve
    from lsafw_tpu.solver.eigen import EpsWhich, PlainOperator, krylov_schur

    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), 10, 5)
    space = make_scalar_space(mesh, "p2")
    ctx = SpaceContext.build(space)
    K = ctx.scatter(stiffness_scalar(ctx))

    ref = krylov_schur(
        PlainOperator(K).apply, K.shape[0],
        nev=4, ncv=20, which=EpsWhich.LARGEST_MAGNITUDE, tol=1e-12,
    )
    got = sharded_eigensolve(
        K, mesh8, nev=4, ncv=20, which="largest_magnitude", tol=1e-12,
        locality=(mesh, np.asarray(space.cell_dofs)),
    )
    lam_ref = np.sort(ref.eigenvalues.real)
    lam_got = np.sort(got.eigenvalues.real)
    assert np.allclose(lam_got, lam_ref, rtol=1e-10, atol=1e-10)
    # eigenvectors are in the original numbering: check the residual
    x = got.eigenvectors[0]
    lam = got.eigenvalues[0]
    r = K.to_scipy() @ x - lam * x
    assert np.linalg.norm(r) / np.linalg.norm(x) < 1e-8 * abs(lam)


def test_sharded_shift_invert_matches_single_device(mesh8):
    """Sharded generalized shift-invert (SPIKE-preconditioned inner
    FGMRES under shard_map) vs the single-device banded/LU SI path on
    the membrane pair — the production inner loop under sharding
    (round-2 VERDICT weak item 6)."""
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.parallel.sharded import sharded_si_eigensolve
    from lsafw_tpu.solver.eigen import (
        EigenSolver,
        EigensolverConfig,
        STType,
    )

    gm = rectangle_mesh((0, 0), (2.0, 4.0), 12, 12)
    K, M, _ = assemble_membrane_evp(gm)
    sigma = 2.0 + 0.1j

    es = EigenSolver(K, M, EigensolverConfig(num_eig=3, atol=1e-10, ncv=18))
    es.set_st_type(STType.SINVERT)
    es.set_target(sigma)
    ref = np.sort_complex(np.asarray([p[0] for p in es.solve()]))

    res = sharded_si_eigensolve(
        K, M, sigma, mesh8, nev=3, ncv=18, tol=1e-10, nb=16, chunk=2)
    got = np.sort_complex(np.asarray(res.eigenvalues[:3]))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-9)

    # eigenvector residual against the unsharded operators
    lam, v = res.eigenvalues[0], res.eigenvectors[0]
    Ks, Ms = K.to_scipy(), M.to_scipy()
    r = Ks @ v - lam * (Ms @ v)
    rel = np.linalg.norm(r) / max(np.linalg.norm(Ks @ v), 1e-300)
    assert rel < 1e-7, rel


def test_sharded_shift_invert_exact_vs_truncated(mesh8):
    """spike="exact" (direct SPIKE applies, no inner Krylov) and
    spike="truncated" (FGMRES) agree on the membrane pair."""
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.parallel.sharded import sharded_si_eigensolve

    gm = rectangle_mesh((0, 0), (2.0, 4.0), 10, 10)
    K, M, _ = assemble_membrane_evp(gm)
    sigma = 2.0 + 0.1j

    r_ex = sharded_si_eigensolve(
        K, M, sigma, mesh8, nev=2, ncv=12, tol=1e-10, nb=16, chunk=2,
        spike="exact")
    r_tr = sharded_si_eigensolve(
        K, M, sigma, mesh8, nev=2, ncv=12, tol=1e-10, nb=16, chunk=2,
        spike="truncated")
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(r_ex.eigenvalues[:2])),
        np.sort_complex(np.asarray(r_tr.eigenvalues[:2])),
        rtol=1e-8, atol=1e-9)
    lam, v = r_ex.eigenvalues[0], r_ex.eigenvectors[0]
    Ks, Ms = K.to_scipy(), M.to_scipy()
    r = Ks @ v - lam * (Ms @ v)
    assert np.linalg.norm(r) / max(np.linalg.norm(Ks @ v), 1e-300) < 1e-7
