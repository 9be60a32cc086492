"""Row-gather assembly == exact segment-sum scatter (bit-compatible).

The TPU-default scatter replacement (fem/rowassembly.py) must reproduce
``assemble_csr_data``'s exact-f64 results on the same element matrices —
same fixed-point channel decomposition, same exact f32 accumulation, so
the outputs agree to the last bit on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext, SpaceContext
from lsafw_tpu.fem.rowassembly import RowPlan, assemble_rows
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh, unit_cube
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.ops.sparse import assemble_csr_data


def _mixed_ctx(nx=6, ny=6):
    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), nx, ny)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], np.int32))
    spaces = define_spaces(mesh)
    return AssemblyContext.build(spaces), spaces


def test_rowassembly_matches_segment_sum_mixed():
    ctx, spaces = _mixed_ctx()
    plan = RowPlan.build(np.asarray(spaces.mixed_cell_dofs), ctx.pattern)
    rng = np.random.default_rng(3)
    nc = ctx.detJ.shape[0]
    el = rng.standard_normal((nc, ctx.ndofs_el, ctx.ndofs_el))
    el *= np.exp(rng.uniform(-8, 8, size=(nc, 1, 1)))  # wide dynamic range
    elj = jnp.asarray(el)
    ref = np.asarray(assemble_csr_data(ctx.pattern_dev, elj))
    got = np.asarray(assemble_rows(plan, ctx.pattern_dev.slots, elj))
    # CPU reference path uses plain f64 segment_sum; the row path uses
    # the exact channel decomposition — agreement is to f64 roundoff
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13 * np.abs(ref).max())


def test_rowassembly_matches_on_real_jacobian():
    """Same equality on the actual linearized-NS element matrices, and
    through the context dispatch (LSAFW_ROW_ASSEMBLY=1 build)."""
    import os

    from lsafw_tpu.fem.assembly import scatter_entries
    from lsafw_tpu.models.navier_stokes import linearized_ns_elements

    ctx, spaces = _mixed_ctx(5, 5)
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal(spaces.num_dofs))
    el = linearized_ns_elements(ctx, w, 40.0)
    ref = np.asarray(assemble_csr_data(ctx.pattern_dev, el))

    os.environ["LSAFW_ROW_ASSEMBLY"] = "1"
    try:
        ctx2 = AssemblyContext.build(spaces)
        assert ctx2.row_plan is not None
        got = np.asarray(scatter_entries(ctx2, el))
    finally:
        del os.environ["LSAFW_ROW_ASSEMBLY"]
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13 * np.abs(ref).max())


def test_rowassembly_scalar_space_3d():
    """SpaceContext (scalar P2 on tets) exercises the E != mixed width
    and 3D connectivity (large K at interior vertices)."""
    import os

    from lsafw_tpu.fem.assembly import mass_scalar, stiffness_scalar
    from lsafw_tpu.fem.spaces import make_scalar_space

    mesh = unit_cube(3)
    space = make_scalar_space(mesh, "p2")
    ctx = SpaceContext.build(space)
    el = stiffness_scalar(ctx) + 0.37 * mass_scalar(ctx)
    ref = np.asarray(assemble_csr_data(ctx.pattern_dev, el))
    plan = RowPlan.build(np.asarray(space.cell_dofs), ctx.pattern)
    got = np.asarray(assemble_rows(plan, ctx.pattern_dev.slots, el))
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13 * np.abs(ref).max())
