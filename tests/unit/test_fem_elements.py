"""Element/quadrature/space unit tests (model: reference tests/unit/FEM)."""

import numpy as np
import pytest

from lsafw_tpu.fem.elements import ElementFamily, make_element
from lsafw_tpu.fem.quadrature import quadrature_rule
from lsafw_tpu.fem.spaces import (
    FunctionSpaceType,
    define_spaces,
    make_scalar_space,
    make_vector_space,
)
from lsafw_tpu.meshing.mesh import CellType, unit_cube, unit_square


@pytest.mark.parametrize(
    "family,cell",
    [
        (ElementFamily.P1, CellType.TRIANGLE),
        (ElementFamily.P2, CellType.TRIANGLE),
        (ElementFamily.P1_BUBBLE, CellType.TRIANGLE),
        (ElementFamily.P1, CellType.TETRAHEDRON),
        (ElementFamily.P2, CellType.TETRAHEDRON),
        (ElementFamily.P1, CellType.INTERVAL),
        (ElementFamily.P2, CellType.INTERVAL),
        (ElementFamily.Q1, CellType.QUADRILATERAL),
    ],
)
def test_partition_of_unity_and_nodal(family, cell):
    el = make_element(family, cell)
    rule = quadrature_rule(cell, 3)
    tab = el.tabulate(rule.points)
    if family is not ElementFamily.P1_BUBBLE:  # bubble breaks PoU by design
        assert np.allclose(tab.phi.sum(axis=1), 1.0)
        assert np.allclose(tab.grad.sum(axis=1), 0.0, atol=1e-12)
    # Kronecker property at nodes (the enriched P1+bubble basis is not
    # interpolatory at the centroid; its interpolation is corrected in
    # FunctionSpace.interpolate instead)
    if family is not ElementFamily.P1_BUBBLE:
        nt = el.tabulate(el.nodes)
        assert np.allclose(nt.phi, np.eye(el.ndofs), atol=1e-12)


@pytest.mark.parametrize("cell", [CellType.TRIANGLE, CellType.TETRAHEDRON])
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6])
def test_quadrature_exactness(cell, degree):
    rule = quadrature_rule(cell, degree)
    tdim = cell.dim
    vol = 0.5 if tdim == 2 else 1 / 6
    assert np.isclose(rule.weights.sum(), vol)
    # exact integration of monomials x^a y^b (z^c) with a+b+c <= degree
    rng = [(a, b, c) for a in range(degree + 1) for b in range(degree + 1)
           for c in range(degree + 1) if a + b + c <= degree]
    for a, b, c in rng:
        if tdim == 2 and c > 0:
            continue
        vals = rule.points[:, 0] ** a * rule.points[:, 1] ** b
        if tdim == 3:
            vals = vals * rule.points[:, 2] ** c
        approx = (rule.weights * vals).sum()
        # exact simplex integral: a! b! c! / (a+b+c+tdim)!
        from math import factorial

        exact = (
            factorial(a) * factorial(b) * (factorial(c) if tdim == 3 else 1)
        ) / factorial(a + b + (c if tdim == 3 else 0) + tdim)
        assert np.isclose(approx, exact, rtol=1e-12, atol=1e-15), (a, b, c)


def test_gradient_finite_difference():
    el = make_element(ElementFamily.P2, CellType.TRIANGLE)
    p = np.array([[0.3, 0.2]])
    tab = el.tabulate(p)
    h = 1e-6
    for d in range(2):
        dp = p.copy()
        dp[0, d] += h
        fd = (el.tabulate(dp).phi - tab.phi) / h
        assert np.allclose(fd, tab.grad[:, :, d], atol=1e-5)


def test_taylor_hood_dof_counts():
    mesh = unit_square(4)
    spaces = define_spaces(mesh, FunctionSpaceType.TAYLOR_HOOD)
    nv = mesh.num_vertices  # 25
    ne = mesh.facets.shape[0]  # edges
    assert spaces.pressure.num_dofs == nv
    assert spaces.velocity.num_nodes == nv + ne
    assert spaces.velocity.num_dofs == 2 * (nv + ne)
    assert spaces.num_dofs == 2 * (nv + ne) + nv
    assert spaces.mixed_cell_dofs.shape == (mesh.num_cells, 6 * 2 + 3)


def test_mini_and_simple_spaces():
    mesh = unit_square(4)
    mini = define_spaces(mesh, "mini")
    assert mini.velocity.num_nodes == mesh.num_vertices + mesh.num_cells
    simple = define_spaces(mesh, FunctionSpaceType.SIMPLE)
    assert simple.velocity.num_nodes == mesh.num_vertices
    with pytest.raises(NotImplementedError):
        define_spaces(mesh, FunctionSpaceType.DG)


def test_p2_space_3d():
    mesh = unit_cube(2)
    s = make_scalar_space(mesh, ElementFamily.P2)
    assert s.num_nodes == mesh.num_vertices + mesh.edges.shape[0]
    assert s.cell_nodes.shape == (mesh.num_cells, 10)


def test_interpolation_and_facet_dofs():
    mesh = unit_square(4)
    from lsafw_tpu.meshing.tags import mark_boundary_facets

    mark_boundary_facets(
        mesh, lambda x: np.where(np.isclose(x[:, 0], 0.0), 1, 2).astype(np.int32)
    )
    v = make_vector_space(mesh, ElementFamily.P2)
    vals = v.interpolate(lambda x: np.stack([x[:, 0], 2 * x[:, 1]], axis=1))
    assert vals.shape == (v.num_dofs,)
    # dofs on the left boundary
    from lsafw_tpu.meshing.tags import facets_with_marker

    left = facets_with_marker(mesh, 1)
    dofs = v.dofs_on_facets(left)
    assert np.allclose(v.dof_coords[dofs][:, 0], 0.0)
    # 5 vertices + 4 edge midpoints, 2 components
    assert dofs.size == 9 * 2
    comp1 = v.dofs_on_facets(left, component=1)
    assert comp1.size == 9
    assert (comp1 % 2 == 1).all()
