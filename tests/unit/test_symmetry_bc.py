"""Symmetry BC physics gate (VERDICT r3 item 9: previously untested).

Half-channel Poiseuille: the full channel y in [-1, 1] with
u = (1 - y^2, 0) is symmetric about y = 0, so solving only the upper
half [0, 2] x [0, 1] with a ``symmetry`` BC on y = 0 (wall-normal
velocity pinned, tangential traction natural: du_x/dy = 0 there — the
exact solution satisfies both) must reproduce the same parabola.
Parity: the reference's hard-coded comp=1 symmetry plane
(``/root/reference/FEM/bcs.py:178-195``).
"""

import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.meshing.tags import facets_with_marker, mark_boundary_facets
from lsafw_tpu.models.navier_stokes import StokesAssembler
from lsafw_tpu.solver.direct import direct_solve

RE = 10.0
INLET, OUTLET, WALL, SYM = 1, 2, 3, 4


@pytest.fixture(scope="module")
def half_channel():
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), 12, 6)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 1], 0.0)] = SYM
        out[np.isclose(x[:, 0], 0.0)] = INLET
        out[np.isclose(x[:, 0], 2.0)] = OUTLET
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity",
                                 value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=SYM, type="symmetry", value=0.0),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure",
                                 value=0.0),
    ])
    # parabolic inlet profile u = (1 - y^2, 0)
    dofs = spaces.velocity.dofs_on_facets(facets_with_marker(mesh, INLET))
    coords = spaces.velocity.dof_coords[dofs]
    comp = dofs % 2
    prof = np.stack([1.0 - coords[:, 1] ** 2, np.zeros(len(coords))], axis=1)
    bcs.dirichlet_mask[dofs] = True
    bcs.dirichlet_values[dofs] = prof[np.arange(dofs.size), comp]
    ctx = AssemblyContext.build(spaces)
    return mesh, spaces, bcs, ctx


def test_symmetry_bc_pins_only_normal_component(half_channel):
    mesh, spaces, bcs, _ = half_channel
    dofs_n = spaces.velocity.dofs_on_facets(
        facets_with_marker(mesh, SYM), component=1)
    dofs_t = spaces.velocity.dofs_on_facets(
        facets_with_marker(mesh, SYM), component=0)
    assert bcs.dirichlet_mask[dofs_n].all()
    # tangential DOFs strictly inside the symmetry facet stay free
    coords = spaces.velocity.dof_coords
    free_t = [d for d in dofs_t if coords[d][0] > 1e-12]
    assert not bcs.dirichlet_mask[free_t].any()


def test_symmetry_half_channel_matches_full_profile(half_channel):
    mesh, spaces, bcs, ctx = half_channel
    A, b = StokesAssembler(ctx, mesh, bcs, re=RE).get_matrix_forms()
    x = direct_solve(A, np.asarray(b))
    u, p = spaces.split(x)
    coords = spaces.velocity.node_coords
    u_exact = 1.0 - coords[:, 1] ** 2
    assert np.abs(u[:, 0] - u_exact).max() < 1e-9
    assert np.abs(u[:, 1]).max() < 1e-9
    # centerline (symmetry plane) velocity is the full-channel peak
    on_sym = np.isclose(coords[:, 1], 0.0)
    assert np.isclose(u[on_sym, 0].max(), 1.0, atol=1e-9)
