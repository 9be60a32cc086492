"""N-D stencil operator: 3D box Taylor-Hood matches assembled CSR."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext, dirichlet_matrix_data
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import box_mesh, rectangle_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import linearized_ns_elements
from lsafw_tpu.ops.sparse import CSRMatrix, assemble_csr_data, spmv
from lsafw_tpu.ops.stencil_nd import build_stencil_nd


def test_stencil_3d_box_matches_csr():
    mesh = box_mesh((0, 0, 0), (1.0, 1.0, 1.0), 4, 4, 4)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], dtype=np.int32))
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
    ])
    ctx = AssemblyContext.build(spaces)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(spaces.num_dofs) * 0.1)
    Ael = linearized_ns_elements(ctx, w, 25.0)
    data0 = assemble_csr_data(ctx.pattern_dev, Ael)

    op = build_stencil_nd(ctx.pattern, np.asarray(data0), spaces)
    x = jnp.asarray(rng.standard_normal(spaces.num_dofs))
    y_ref = np.asarray(spmv(CSRMatrix(ctx.pattern, data0), x))
    y = np.asarray(op.unpack(op.matvec(op.pack(x))))
    assert np.abs(y - y_ref).max() < 1e-11

    # with Dirichlet elimination
    mask = jnp.asarray(bcs.dirichlet_mask)
    data_bc = dirichlet_matrix_data(ctx.pattern_dev, data0, mask, 1.0)
    op_bc = build_stencil_nd(ctx.pattern, np.asarray(data0), spaces,
                             bc_mask=bcs.dirichlet_mask, bc_diag=1.0)
    y_ref = np.asarray(spmv(CSRMatrix(ctx.pattern, data_bc), x))
    y = np.asarray(op_bc.unpack(op_bc.matvec(op_bc.pack(x))))
    assert np.abs(y - y_ref).max() < 1e-11


def test_stencil_nd_2d_matches_2d_impl():
    from lsafw_tpu.ops.stencil import build_stencil_operator

    mesh = rectangle_mesh((0, 0), (2.0, 1.0), 8, 4)
    spaces = define_spaces(mesh)
    ctx = AssemblyContext.build(spaces)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal(spaces.num_dofs) * 0.1)
    data = np.asarray(assemble_csr_data(ctx.pattern_dev, linearized_ns_elements(ctx, w, 10.0)))
    op2 = build_stencil_operator(ctx.pattern, data, spaces)
    # distinct pattern object for the ND cache (same structure content)
    from lsafw_tpu.ops.sparse import build_sparsity

    pattern2 = build_sparsity(spaces.mixed_cell_dofs, shape=(spaces.num_dofs, spaces.num_dofs))
    opn = build_stencil_nd(pattern2, data, spaces)
    x = jnp.asarray(rng.standard_normal(spaces.num_dofs))
    y2 = np.asarray(op2.unpack(op2.matvec(op2.pack(x))))
    yn = np.asarray(opn.unpack(opn.matvec(opn.pack(x))))
    assert np.abs(y2 - yn).max() < 1e-12
