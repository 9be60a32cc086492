"""Q2 tensor elements on quadrilaterals: tabulation, EVP accuracy, and
the Q2/Q1 Taylor-Hood mixed pair (parity: basix tensor elements behind
``FEM/spaces.py:103-179`` on quad meshes)."""

import numpy as np
import pytest

from lsafw_tpu.fem.elements import ElementFamily, make_element
from lsafw_tpu.meshing.mesh import CellType, rectangle_mesh


def test_q2_tabulation_basics():
    el = make_element(ElementFamily.Q2, CellType.QUADRILATERAL)
    assert el.ndofs == 9
    # Kronecker at its own nodes
    tab = el.tabulate(el.nodes)
    np.testing.assert_allclose(tab.phi, np.eye(9), atol=1e-13)
    # partition of unity + zero gradient sum at random points
    rng = np.random.default_rng(0)
    p = rng.random((20, 2))
    tab = el.tabulate(p)
    np.testing.assert_allclose(tab.phi.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(tab.grad.sum(axis=1), 0.0, atol=1e-12)
    # exactly reproduces a biquadratic: f = (2x^2-x)(y^2+3y+1)
    f = lambda q: (2 * q[:, 0] ** 2 - q[:, 0]) * (q[:, 1] ** 2 + 3 * q[:, 1] + 1)
    coef = f(el.nodes)
    np.testing.assert_allclose(tab.phi @ coef, f(p), atol=1e-12)


def test_q2_membrane_eigenvalues_quads():
    from lsafw_tpu.models.membrane import analytic_eigenvalues, assemble_membrane_evp
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType

    mesh = rectangle_mesh((0, 0), (2.0, 4.0), 16, 32,
                          cell_type=CellType.QUADRILATERAL)
    K, M, _ = assemble_membrane_evp(mesh, family=ElementFamily.Q2)
    es = EigenSolver(K, M, EigensolverConfig(num_eig=4, atol=1e-10, ncv=24))
    es.set_st_type(STType.SINVERT)
    es.set_target(2.0)
    lam = np.sort([p[0].real for p in es.solve()])
    ref = analytic_eigenvalues(2.0, 4.0, 4)
    rel = np.abs(lam - ref) / ref
    assert np.all(rel < 5e-5), rel


def test_taylor_hood_q2q1_stokes_quads():
    """Q2/Q1 mixed Stokes on a quad mesh: lid-driven-style channel with
    a manufactured Poiseuille solution (exactly representable by
    Q2 velocity / Q1 pressure, so the discrete solve is exact)."""
    from lsafw_tpu.config import BoundaryConditionsConfig
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.tags import facets_with_marker, mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import StokesAssembler
    from lsafw_tpu.solver.direct import direct_solve

    mesh = rectangle_mesh((0, 0), (1.0, 1.0), 8, 8,
                          cell_type=CellType.QUADRILATERAL)

    def marker(x):
        out = np.full(x.shape[0], 2, dtype=np.int32)  # outlet: do-nothing
        wall = np.isclose(x[:, 1], 0.0) | np.isclose(x[:, 1], 1.0)
        out[wall] = 4
        out[np.isclose(x[:, 0], 0.0)] = 1  # inlet
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)  # Q2/Q1 on quads
    assert spaces.velocity.element.family is ElementFamily.Q2
    re = 1.0

    def poiseuille(x):
        u = np.zeros((x.shape[0], 2))
        u[:, 0] = 4.0 * x[:, 1] * (1.0 - x[:, 1])
        return u

    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=4, type="dirichlet_velocity",
                                 value=(0.0, 0.0)),
    ])
    inlet_dofs = spaces.velocity.dofs_on_facets(facets_with_marker(mesh, 1))
    coords_in = spaces.velocity.dof_coords[inlet_dofs]
    comp = inlet_dofs % 2
    bcs.dirichlet_mask[inlet_dofs] = True
    bcs.dirichlet_values[inlet_dofs] = poiseuille(coords_in)[
        np.arange(inlet_dofs.size), comp]

    ctx = AssemblyContext.build(spaces)
    A, b = StokesAssembler(ctx, mesh, bcs, re=re).get_matrix_forms()
    x = direct_solve(A, np.asarray(b))
    u, p = spaces.split(x)
    coords = spaces.velocity.node_coords
    np.testing.assert_allclose(u, poiseuille(coords), atol=1e-8)
    # pressure is linear in x with slope -8/Re (up to the outlet gauge)
    pc = spaces.pressure.node_coords
    fit = np.polyfit(pc[:, 0], np.asarray(p), 1)
    np.testing.assert_allclose(fit[0], -8.0 / re, rtol=1e-6)
