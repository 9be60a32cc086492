"""Minimum end-to-end slice: Stokes channel flow with exact solution.

(SURVEY.md section 7.2 step 3; model: reference
``tests/unit/FEM/test_bcs_integration.py`` and ``test_linear.py``.)

Poiseuille flow in [0,2]x[0,1]: u = (y(1-y), 0), p = 2(2-x)/Re is in
the Taylor-Hood space exactly, so the discrete solution must match to
solver tolerance for every solver type.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import StokesAssembler
from lsafw_tpu.ops.sparse import spmv
from lsafw_tpu.solver.direct import direct_solve
from lsafw_tpu.solver.linear import KSPType, gmres, solve
from lsafw_tpu.solver.precond import block_jacobi, jacobi

RE = 10.0

INLET, OUTLET, WALL = 1, 2, 3


@pytest.fixture(scope="module")
def channel():
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), 12, 6)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = INLET
        out[np.isclose(x[:, 0], 2.0)] = OUTLET
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    cfg = [
        BoundaryConditionsConfig(
            marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)
        ),
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ]
    bcs = define_bcs(mesh, spaces, cfg)
    # replace inlet BC value with the parabolic profile (callable values)
    inlet_cfg = [
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ]
    bcs2 = define_bcs(mesh, spaces, inlet_cfg)

    # build callable inlet: u = (y(1-y), 0)
    def inlet_profile(coords):
        u = np.zeros((coords.shape[0], 2))
        u[:, 0] = coords[:, 1] * (1.0 - coords[:, 1])
        return u

    from lsafw_tpu.meshing.tags import facets_with_marker

    dofs = spaces.velocity.dofs_on_facets(facets_with_marker(mesh, INLET))
    coords = spaces.velocity.dof_coords[dofs]
    comp = dofs % 2
    vals = inlet_profile(coords)[np.arange(dofs.size), comp]
    bcs2.dirichlet_mask[dofs] = True
    bcs2.dirichlet_values[dofs] = vals

    ctx = AssemblyContext.build(spaces)
    return mesh, spaces, bcs2, ctx


def exact_solution(spaces):
    u = spaces.velocity.interpolate(
        lambda p: np.stack([p[:, 1] * (1 - p[:, 1]), np.zeros(p.shape[0])], axis=1)
    )
    p = spaces.pressure.interpolate(lambda x: 2.0 * (2.0 - x[:, 0]) / RE)
    return np.concatenate([u, p])


def test_stokes_direct(channel):
    mesh, spaces, bcs, ctx = channel
    A, b = StokesAssembler(ctx, mesh, bcs, re=RE).get_matrix_forms()
    x = direct_solve(A, np.asarray(b))
    err = np.abs(x - exact_solution(spaces)).max()
    assert err < 1e-9


@pytest.mark.parametrize("ksp", [KSPType.GMRES, KSPType.FGMRES, KSPType.BICGSTAB])
def test_stokes_iterative(channel, ksp):
    mesh, spaces, bcs, ctx = channel
    A, b = StokesAssembler(ctx, mesh, bcs, re=RE).get_matrix_forms()
    M = block_jacobi(A, block_size=32)
    res = solve(lambda v: spmv(A, v), b, ksp_type=ksp, tol=1e-12, maxiter=2000, M=M)
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x) - exact_solution(spaces)).max()
    assert err < 1e-7, (ksp, float(res.residual), int(res.iterations))


def test_stokes_divergence_free(channel):
    mesh, spaces, bcs, ctx = channel
    A, b = StokesAssembler(ctx, mesh, bcs, re=RE).get_matrix_forms()
    x = direct_solve(A, np.asarray(b))
    u, p = spaces.split(x)
    # velocity max matches profile peak 0.25
    assert np.isclose(np.abs(u[:, 0]).max(), 0.25, atol=1e-10)
    assert np.abs(u[:, 1]).max() < 1e-10


def test_cg_spd_system():
    """CG on an SPD Laplacian system (parity: test_linear.py CG case)."""
    from lsafw_tpu.fem.assembly import SpaceContext, stiffness_scalar, mass_scalar
    from lsafw_tpu.fem.spaces import make_scalar_space
    from lsafw_tpu.meshing.mesh import unit_square
    from lsafw_tpu.ops.sparse import CSRMatrix
    from lsafw_tpu.solver.linear import cg

    mesh = unit_square(8)
    s = make_scalar_space(mesh, "p1")
    ctx = SpaceContext.build(s)
    K = ctx.scatter(stiffness_scalar(ctx) + mass_scalar(ctx))
    b = jnp.ones(s.num_dofs)
    res = cg(lambda v: spmv(K, v), b, tol=1e-12, maxiter=500, M=jacobi(K))
    assert bool(res.converged)
    x_ref = direct_solve(K, np.asarray(b))
    assert np.allclose(np.asarray(res.x), x_ref, atol=1e-9)
