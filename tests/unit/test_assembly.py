"""Assembly correctness tests (model: reference tests/unit/FEM/test_operators.py).

Matrix-level probes: mass row sums integrate to the domain measure,
Laplacian annihilates constants and reproduces linear-exactness,
divergence pairs with constants correctly, Dirichlet rows are identity
rows (the reference's probe at tests/unit/FEM/test_operators.py:35-47).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.fem.assembly import (
    AssemblyContext,
    SpaceContext,
    dirichlet_matrix_data,
    mass_scalar,
    stiffness_scalar,
)
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces, make_scalar_space
from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.meshing.mesh import unit_cube, unit_square
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    mass_elements,
    stokes_elements,
)
from lsafw_tpu.ops.sparse import CSRMatrix, assemble_csr_data


@pytest.fixture(scope="module")
def square_spaces():
    mesh = unit_square(8)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], dtype=np.int32))
    return mesh, define_spaces(mesh)


def test_scalar_mass_total(square_spaces):
    mesh, spaces = square_spaces
    ctx = SpaceContext.build(spaces.pressure)
    M = ctx.scatter(mass_scalar(ctx))
    # sum_ij M_ij = integral of 1 * 1 = |Omega| = 1
    ones = jnp.ones(spaces.pressure.num_dofs)
    assert np.isclose(float(ones @ (M @ ones)), 1.0)


def test_scalar_mass_p2_total_3d():
    mesh = unit_cube(2)
    s = make_scalar_space(mesh, "p2")
    ctx = SpaceContext.build(s)
    M = ctx.scatter(mass_scalar(ctx))
    ones = jnp.ones(s.num_dofs)
    assert np.isclose(float(ones @ (M @ ones)), 1.0)


def test_stiffness_annihilates_linears(square_spaces):
    mesh, spaces = square_spaces
    s = make_scalar_space(mesh, "p2")
    ctx = SpaceContext.build(s)
    K = ctx.scatter(stiffness_scalar(ctx))
    # K @ constant = 0 and energy of linear u = x is |Omega| * |grad|^2 = 1
    const = jnp.ones(s.num_dofs)
    assert np.allclose(np.asarray(K @ const), 0.0, atol=1e-12)
    x = jnp.asarray(s.interpolate(lambda p: p[:, 0]))
    assert np.isclose(float(x @ (K @ x)), 1.0)
    # quadratic energy: u = x^2 -> integral |2x|^2 = 4/3 (P2 exact)
    x2 = jnp.asarray(s.interpolate(lambda p: p[:, 0] ** 2))
    assert np.isclose(float(x2 @ (K @ x2)), 4.0 / 3.0)


def test_mixed_mass_velocity_only(square_spaces):
    mesh, spaces = square_spaces
    ctx = AssemblyContext.build(spaces)
    M = CSRMatrix(ctx.pattern, assemble_csr_data(ctx.pattern, mass_elements(ctx)))
    w = jnp.ones(spaces.num_dofs)
    # velocity block integrates 2 components over unit area; pressure rows zero
    assert np.isclose(float(w @ (M @ w)), 2.0)
    Ms = M.to_scipy()
    nu = spaces.num_velocity_dofs
    assert abs(Ms[nu:, :]).sum() == 0.0


def test_stokes_divergence_consistency(square_spaces):
    """Divergence row applied to a linear solenoidal field integrates to 0;
    applied to u = (x, y) gives integral of 2 against each pressure basis."""
    mesh, spaces = square_spaces
    ctx = AssemblyContext.build(spaces)
    A = CSRMatrix(ctx.pattern, assemble_csr_data(ctx.pattern, stokes_elements(ctx, 1.0)))
    nu = spaces.num_velocity_dofs
    # w = (u, p=0) with u = (x, y): div u = 2
    u = spaces.velocity.interpolate(lambda p: np.stack([p[:, 0], p[:, 1]], axis=1))
    w = jnp.asarray(np.concatenate([u, np.zeros(spaces.num_pressure_dofs)]))
    r = np.asarray(A @ w)[nu:]
    # each pressure row k: integral 2 * phi_k -> sums to 2 * |Omega|
    assert np.isclose(r.sum(), 2.0)
    # solenoidal field u = (y, x): div = 0
    u2 = spaces.velocity.interpolate(lambda p: np.stack([p[:, 1], p[:, 0]], axis=1))
    w2 = jnp.asarray(np.concatenate([u2, np.zeros(spaces.num_pressure_dofs)]))
    assert np.allclose(np.asarray(A @ w2)[nu:], 0.0, atol=1e-12)


def test_dirichlet_identity_rows(square_spaces):
    mesh, spaces = square_spaces
    cfg = [BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0))]
    bcs = define_bcs(mesh, spaces, cfg)
    ctx = AssemblyContext.build(spaces)
    data = assemble_csr_data(ctx.pattern, stokes_elements(ctx, 10.0))
    mask = jnp.asarray(bcs.dirichlet_mask)
    bc_data = dirichlet_matrix_data(ctx.pattern, data, mask, 1.0)
    A = CSRMatrix(ctx.pattern, bc_data).to_scipy()
    bc_rows = np.nonzero(bcs.dirichlet_mask)[0]
    for r in bc_rows[:20]:
        row = A.getrow(r).toarray().ravel()
        expect = np.zeros_like(row)
        expect[r] = 1.0
        assert np.allclose(row, expect)
    # columns also zeroed (symmetric elimination)
    col = np.abs(A[:, bc_rows]).sum() - bc_rows.size
    assert np.isclose(col, 0.0)


def test_linearized_assembler_eigensystem(square_spaces):
    mesh, spaces = square_spaces
    cfg = [BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0))]
    bcs = define_bcs(mesh, spaces, cfg)
    ctx = AssemblyContext.build(spaces)
    base = np.zeros(spaces.num_dofs)
    asm = LinearizedNavierStokesAssembler(base, ctx, 50.0, bcs, mesh)
    A, M = asm.assemble_eigensystem()
    # zero baseflow: A is Stokes-like; finite data
    assert np.isfinite(np.asarray(A.data)).all()
    Ms = M.to_scipy()
    bc_rows = np.nonzero(bcs.dirichlet_mask)[0]
    assert abs(Ms[bc_rows, :]).sum() == 0.0  # mass_diag = 0 kills spurious modes
    # baseflow on wrong space rejected
    with pytest.raises(ValueError):
        LinearizedNavierStokesAssembler(np.zeros(3), ctx, 50.0, bcs, mesh)
