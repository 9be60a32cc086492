"""MINI (P1+bubble) element end-to-end validation.

The reference supports MINI spaces (``FEM/spaces.py:126-145``) but has
no solve-level test for them; here MINI Stokes is validated by
convergence toward the Taylor-Hood solution on the same flow.
"""

import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs, pin_dofs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.meshing.tags import facets_with_marker, mark_boundary_facets
from lsafw_tpu.models.navier_stokes import StokesAssembler
from lsafw_tpu.solver.direct import direct_solve

INLET, OUTLET, WALL = 1, 2, 3


def poiseuille_solve(nx, ny, space_type):
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), nx, ny)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = INLET
        out[np.isclose(x[:, 0], 2.0)] = OUTLET
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh, space_type)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    dofs = spaces.velocity.dofs_on_facets(facets_with_marker(mesh, INLET))
    coords = spaces.velocity.dof_coords[dofs]
    comp = dofs % 2
    bcs.dirichlet_mask[dofs] = True
    bcs.dirichlet_values[dofs] = np.where(
        comp == 0, coords[:, 1] * (1 - coords[:, 1]), 0.0
    )
    ctx = AssemblyContext.build(spaces)
    A, b = StokesAssembler(ctx, mesh, bcs, re=10.0).get_matrix_forms()
    w = direct_solve(A, np.asarray(b))
    return mesh, spaces, w


def vertex_velocity_error(mesh, spaces, w):
    """Max error of u at mesh vertices vs exact Poiseuille."""
    u, _ = spaces.split(w)
    nv = mesh.num_vertices
    exact = mesh.vertices[:, 1] * (1 - mesh.vertices[:, 1])
    return np.abs(u[:nv, 0] - exact).max() + np.abs(u[:nv, 1]).max()


def test_mini_stokes_converges():
    errs = []
    for n in (4, 8, 16):
        mesh, spaces, w = poiseuille_solve(2 * n, n, "mini")
        errs.append(vertex_velocity_error(mesh, spaces, w))
    # MINI is O(h) in H1 / O(h^2)-ish nodally: error strictly decreasing
    assert errs[1] < 0.6 * errs[0]
    assert errs[2] < 0.6 * errs[1]
    # and already small on the finest mesh
    assert errs[2] < 0.02, errs


def test_mini_close_to_taylor_hood():
    mesh, spaces_m, wm = poiseuille_solve(16, 8, "mini")
    _, spaces_t, wt = poiseuille_solve(16, 8, "taylor_hood")
    um, _ = spaces_m.split(wm)
    ut, _ = spaces_t.split(wt)
    nv = mesh.num_vertices
    assert np.abs(um[:nv] - ut[:nv]).max() < 0.02
