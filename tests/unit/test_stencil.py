"""Stencil operator equals assembled CSR SpMV on structured meshes."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext, dirichlet_matrix_data
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh, unit_square
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import linearized_ns_elements
from lsafw_tpu.ops.sparse import CSRMatrix, assemble_csr_data, spmv
from lsafw_tpu.ops.stencil import build_stencil_operator


@pytest.fixture(scope="module")
def case():
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), 12, 6)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], dtype=np.int32))
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    ctx = AssemblyContext.build(spaces)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(spaces.num_dofs) * 0.1)
    Ael = linearized_ns_elements(ctx, w, 30.0)
    data0 = assemble_csr_data(ctx.pattern_dev, Ael)
    return mesh, spaces, bcs, ctx, data0


def test_stencil_matches_csr_no_bc(case):
    mesh, spaces, bcs, ctx, data0 = case
    op = build_stencil_operator(ctx.pattern, np.asarray(data0), spaces)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(spaces.num_dofs))
    y_ref = np.asarray(spmv(CSRMatrix(ctx.pattern, data0), x))
    xp = op.pack(x)
    y = np.asarray(op.unpack(op.matvec(xp)))
    assert np.abs(y - y_ref).max() < 1e-11


def test_stencil_matches_csr_with_bc(case):
    mesh, spaces, bcs, ctx, data0 = case
    mask = jnp.asarray(bcs.dirichlet_mask)
    data_bc = dirichlet_matrix_data(ctx.pattern_dev, data0, mask, 1.0)
    op = build_stencil_operator(
        ctx.pattern, np.asarray(data0), spaces,
        bc_mask=bcs.dirichlet_mask, bc_diag=1.0,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(spaces.num_dofs))
    y_ref = np.asarray(spmv(CSRMatrix(ctx.pattern, data_bc), x))
    y = np.asarray(op.unpack(op.matvec(op.pack(x))))
    assert np.abs(y - y_ref).max() < 1e-11


def test_stencil_pack_roundtrip(case):
    mesh, spaces, bcs, ctx, data0 = case
    op = build_stencil_operator(ctx.pattern, np.asarray(data0), spaces)
    x = jnp.arange(spaces.num_dofs, dtype=jnp.float64)
    assert np.array_equal(np.asarray(op.unpack(op.pack(x))), np.asarray(x))


def test_stencil_rejects_unstructured():
    from lsafw_tpu.config import CylinderFlowGeometryConfig
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh

    cfg = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-4.0, 8.0), y_range=(-4.0, 4.0), resolution=1.0,
        resolution_around_cylinder=0.5, influence_radius=2.0,
    )
    mesh = cylinder_flow_mesh(cfg, max_iter=40)
    spaces = define_spaces(mesh)
    ctx = AssemblyContext.build(spaces)
    data = np.zeros(ctx.pattern.nnz)
    with pytest.raises(ValueError):
        build_stencil_operator(ctx.pattern, data, spaces)
