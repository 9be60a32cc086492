"""Mesh file IO, ARPACK cross-check, periodic/Robin BCs, capture."""

import numpy as np
import pytest
import scipy.sparse as sp

from lsafw_tpu.meshing.io import from_file, read_msh, write_msh
from lsafw_tpu.meshing.mesh import unit_cube, unit_square
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.eigen2 import ArpackEigenSolver, ShiftInvertConfig


def test_msh_roundtrip_2d(tmp_path):
    mesh = unit_square(4)
    mark_boundary_facets(
        mesh, lambda x: np.where(np.isclose(x[:, 0], 0.0), 7, 3).astype(np.int32)
    )
    write_msh(mesh, tmp_path / "m.msh")
    m2 = read_msh(tmp_path / "m.msh")
    assert m2.num_vertices == mesh.num_vertices
    assert m2.num_cells == mesh.num_cells
    assert np.allclose(m2.vertices, mesh.vertices)
    # tags survive the round trip
    assert (m2.facet_tags == 7).sum() == (mesh.facet_tags == 7).sum()
    assert (m2.facet_tags == 3).sum() == (mesh.facet_tags == 3).sum()


def test_msh_roundtrip_3d(tmp_path):
    mesh = unit_cube(2)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], dtype=np.int32))
    write_msh(mesh, tmp_path / "m3.msh")
    m2 = from_file(tmp_path / "m3.msh")
    assert m2.num_cells == mesh.num_cells
    assert np.isclose(m2.cell_volumes.sum(), 1.0)


def test_from_file_bad_extension(tmp_path):
    with pytest.raises(ValueError):
        from_file(tmp_path / "mesh.xyz")


def test_arpack_cross_check_membrane():
    """Krylov-Schur and ARPACK agree on the membrane spectrum."""
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.membrane import assemble_membrane_evp
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType

    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 6, 12)
    K, M, _ = assemble_membrane_evp(mesh)
    es = EigenSolver(K, M, EigensolverConfig(num_eig=4, atol=1e-10, ncv=24))
    es.set_st_type(STType.SINVERT)
    es.set_target(1.5)
    native = np.sort([p[0].real for p in es.solve()])
    arp = ArpackEigenSolver(K, M, ShiftInvertConfig(sigma=1.5, num_eig=4, tol=1e-12))
    arpack_vals = np.sort([p[0].real for p in arp.solve()])
    assert np.allclose(native, arpack_vals, rtol=1e-9), (native, arpack_vals)


def test_periodic_bcs_pairing_and_folding():
    """(model: reference tests/unit/FEM/test_bcs.py periodic cases)"""
    from lsafw_tpu.config import BoundaryConditionsConfig
    from lsafw_tpu.fem.bcs import (
        apply_periodic_constraints_matrix,
        apply_periodic_constraints_vector,
        define_bcs,
    )
    from lsafw_tpu.fem.spaces import define_spaces

    mesh = unit_square(4)

    def marker(x):
        out = np.full(x.shape[0], 5, dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], 1.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="periodic", value=(1, 2)),
    ])
    to_d, from_d = bcs.velocity_periodic[0]
    # matched dofs sit at translated coordinates (same y, x: 0 vs 1)
    cf = spaces.velocity.dof_coords[from_d]
    ct = spaces.velocity.dof_coords[to_d]
    assert np.allclose(cf[:, 1], ct[:, 1])
    assert np.allclose(ct[:, 0] - cf[:, 0], 1.0)
    # folding: matrix rows/cols accumulate then pin
    n = spaces.num_dofs
    A = CSRMatrix.from_scipy(sp.identity(n, format="csr") * 2.0)
    A2 = apply_periodic_constraints_matrix(A, (to_d, from_d))
    d = A2.to_scipy().diagonal()
    assert np.allclose(d[to_d], 1.0)  # pinned
    assert np.allclose(d[from_d], 4.0)  # folded 2 + 2
    v = np.ones(n)
    v2 = apply_periodic_constraints_vector(v, (to_d, from_d))
    assert np.allclose(v2[to_d], 0.0)
    assert np.allclose(v2[from_d], 2.0)


def test_robin_bc_modifies_system():
    """Robin term contributes -alpha(u - g) on the tagged boundary."""
    from lsafw_tpu.config import BoundaryConditionsConfig
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.models.navier_stokes import StationaryNavierStokesAssembler

    mesh = unit_square(4)

    def marker(x):
        out = np.full(x.shape[0], 9, dtype=np.int32)
        out[np.isclose(x[:, 1], 1.0)] = 4
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs_plain = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=9, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_robin = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=9, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=4, type="robin", value=(0.5, 0.0), robin_alpha=2.0),
    ])
    ctx = AssemblyContext.build(spaces)
    import jax.numpy as jnp

    w = jnp.asarray(np.random.default_rng(0).standard_normal(spaces.num_dofs) * 0.1)
    r_plain = StationaryNavierStokesAssembler(ctx, mesh, bcs_plain).residual(w, 10.0)
    r_robin = StationaryNavierStokesAssembler(ctx, mesh, bcs_robin).residual(w, 10.0)
    diff = np.abs(np.asarray(r_robin) - np.asarray(r_plain))
    # difference localized on top-boundary velocity dofs
    top = spaces.velocity.dofs_on_facets(
        np.nonzero(mesh.facet_tags == 4)[0].astype(np.int32)
    )
    assert diff[top].max() > 1e-3
    interior = np.ones(spaces.num_dofs, dtype=bool)
    # facet term touches all dofs of boundary-adjacent cells
    cells_touched = np.unique(
        spaces.mixed_cell_dofs[mesh.facet_to_cells[mesh.facet_tags == 4, 0]]
    )
    interior[cells_touched] = False
    assert diff[interior].max() < 1e-14


def test_capture_c_streams(caplog):
    import logging
    import os

    from lsafw_tpu.utils.capture import capture_c_streams

    with caplog.at_level(logging.DEBUG, logger="lsafw_tpu"):
        with capture_c_streams():
            os.write(1, b"native says hi\n")
    assert any("native says hi" in r.message for r in caplog.records)
