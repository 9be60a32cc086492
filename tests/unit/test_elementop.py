"""Matrix-free element operator equals assembled CSR SpMV."""

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext, dirichlet_matrix_data
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import unit_square
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import linearized_ns_elements
from lsafw_tpu.ops.elementop import element_operator_from_context
from lsafw_tpu.ops.sparse import CSRMatrix, assemble_csr_data, spmv


def test_element_operator_matches_csr():
    mesh = unit_square(6)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], dtype=np.int32))
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    ctx = AssemblyContext.build(spaces)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(spaces.num_dofs) * 0.1)
    x = jnp.asarray(rng.standard_normal(spaces.num_dofs))
    mask = jnp.asarray(bcs.dirichlet_mask)

    Ael = linearized_ns_elements(ctx, w, 42.0)
    data = dirichlet_matrix_data(
        ctx.pattern_dev, assemble_csr_data(ctx.pattern_dev, Ael), mask, 1.0
    )
    y_csr = np.asarray(spmv(CSRMatrix(ctx.pattern, data), x))

    op = element_operator_from_context(ctx, Ael, bc_mask=mask, bc_diag=1.0)
    y_el = np.asarray(op @ x)
    assert np.allclose(y_el, y_csr, atol=1e-12)

    # no-BC variant
    data0 = assemble_csr_data(ctx.pattern_dev, Ael)
    y0_csr = np.asarray(spmv(CSRMatrix(ctx.pattern, data0), x))
    op0 = element_operator_from_context(ctx, Ael)
    assert np.allclose(np.asarray(op0 @ x), y0_csr, atol=1e-12)

    # complex pair apply
    yr, yi = op.matvec_pair(x, 2.0 * x)
    assert np.allclose(np.asarray(yi), 2.0 * y_csr, atol=1e-12)
