"""Meshing unit tests (model: reference ``tests/unit/Meshing/test_core.py``)."""

import numpy as np
import pytest

from lsafw_tpu.config import (
    CylinderFlowGeometryConfig,
    FacetCondition,
    FacetRule,
    StepFlowGeometryConfig,
    compile_facet_rules,
)
from lsafw_tpu.meshing import (
    CellType,
    Shape,
    cylinder_flow_mesh,
    generate_mesh,
    mark_boundary_facets,
    step_flow_mesh,
    unit_cube,
    unit_interval,
    unit_square,
)
from lsafw_tpu.meshing.mesh import box_mesh, rectangle_mesh


@pytest.mark.parametrize(
    "shape,kw,tdim,ncells",
    [
        (Shape.UNIT_INTERVAL, dict(n=10), 1, 10),
        (Shape.UNIT_SQUARE, dict(nx=4, ny=4), 2, 32),
        (Shape.UNIT_SQUARE, dict(nx=3, ny=2, cell_type=CellType.QUADRILATERAL), 2, 6),
        (Shape.UNIT_CUBE, dict(nx=2), 3, 48),
        (Shape.UNIT_CUBE, dict(nx=2, cell_type=CellType.HEXAHEDRON), 3, 8),
    ],
)
def test_generate_shapes(shape, kw, tdim, ncells):
    mesh = generate_mesh(shape, **kw)
    assert mesh.tdim == tdim
    assert mesh.num_cells == ncells
    assert mesh.num_vertices > 0


def test_unit_square_area_and_volumes():
    mesh = unit_square(8)
    assert np.isclose(mesh.cell_volumes.sum(), 1.0)
    # every triangle has area 1/(2*8*8)
    assert np.allclose(mesh.cell_volumes, 1.0 / 128.0)


def test_unit_cube_volume():
    mesh = unit_cube(3)
    assert np.isclose(mesh.cell_volumes.sum(), 1.0)


def test_box_mesh_volume():
    mesh = box_mesh((0, 0, 0), (2.0, 1.0, 3.0), 4, 2, 6)
    assert np.isclose(mesh.cell_volumes.sum(), 6.0)


def test_boundary_facets_unit_square():
    mesh = unit_square(4)
    # 4 sides x 4 edges per side
    assert mesh.boundary_facets.size == 16
    # interior facet count: Euler-ish sanity, every facet has <= 2 cells
    f2c = mesh.facet_to_cells
    assert (f2c[:, 0] >= 0).all()
    interior = f2c[:, 1] >= 0
    assert interior.sum() == mesh.facets.shape[0] - 16


def test_boundary_facets_cube():
    mesh = unit_cube(2)
    mids = mesh.facet_midpoints[mesh.boundary_facets]
    on_boundary = (
        np.isclose(mids, 0.0).any(axis=1) | np.isclose(mids, 1.0).any(axis=1)
    )
    assert on_boundary.all()


def test_facet_tagging_rules():
    mesh = unit_square(4)
    rules = [
        FacetRule(marker=1, when=FacetCondition(axis="x", equals=0.0)),
        FacetRule(marker=2, when=FacetCondition(axis="x", equals=1.0)),
        FacetRule(marker=3, otherwise=True),
    ]
    tags = mark_boundary_facets(mesh, compile_facet_rules(rules))
    assert (tags[mesh.boundary_facets] > 0).all()
    left = tags == 1
    assert left.sum() == 4
    assert np.allclose(mesh.facet_midpoints[left][:, 0], 0.0)
    assert (tags == 2).sum() == 4
    assert (tags == 3).sum() == 8


def test_facet_rules_order_matters():
    rules = [
        FacetRule(marker=5, when=FacetCondition(axis="y", less_than=0.5)),
        FacetRule(marker=7, otherwise=True),
    ]
    fn = compile_facet_rules(rules)
    out = fn(np.array([[0.0, 0.2], [0.0, 0.8]]))
    assert out.tolist() == [5, 7]


def test_facet_rules_no_fallback_raises():
    fn = compile_facet_rules([FacetRule(marker=1, when=FacetCondition(axis="x", equals=0.0))])
    with pytest.raises(RuntimeError):
        fn(np.array([[0.5, 0.5]]))


def test_rectangle_mesh_custom_domain():
    mesh = rectangle_mesh((-1.0, 2.0), (3.0, 5.0), 4, 3)
    assert np.isclose(mesh.cell_volumes.sum(), 12.0)
    assert mesh.vertices[:, 0].min() == -1.0
    assert mesh.vertices[:, 1].max() == 5.0


@pytest.mark.slow
def test_cylinder_mesh_small():
    cfg = CylinderFlowGeometryConfig(
        dim=2,
        cylinder_radius=0.5,
        cylinder_center=(0.0, 0.0),
        x_range=(-5.0, 10.0),
        y_range=(-5.0, 5.0),
        resolution=0.8,
        resolution_around_cylinder=0.25,
        influence_radius=2.0,
    )
    mesh = cylinder_flow_mesh(cfg, max_iter=60)
    # area = rectangle minus circle
    expected = 15.0 * 10.0 - np.pi * 0.25
    assert abs(mesh.cell_volumes.sum() - expected) / expected < 0.02
    # no vertex strictly inside the cylinder
    d = np.hypot(mesh.vertices[:, 0], mesh.vertices[:, 1])
    assert (d > 0.5 - 1e-3).all()
    # grading: boundary-adjacent edges much shorter than far-field
    assert mesh.hmin < 0.3
    assert mesh.hmax > 0.5


@pytest.mark.slow
def test_step_mesh_small():
    cfg = StepFlowGeometryConfig(
        dim=2,
        inlet_length=2.0,
        step_height=0.5,
        outlet_length=5.0,
        channel_height=1.0,
        resolution=0.2,
        refinement_factor=2.0,
    )
    mesh = step_flow_mesh(cfg, max_iter=60)
    expected = 2.0 * 1.0 + 5.0 * 1.5
    assert abs(mesh.cell_volumes.sum() - expected) / expected < 0.02


def test_3d_config_files_load_and_tag():
    """The shipped 3D TOMLs (parity: /root/reference/config_files/3D)
    drive cube tagging + BCs and the 3D step geometry loader."""
    import numpy as np

    from lsafw_tpu.config import (
        load_bc_config,
        load_facet_config,
        load_step_flow_config,
    )
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import unit_cube
    from lsafw_tpu.meshing.tags import mark_boundary_facets

    mesh = unit_cube(3, 3, 3)
    marker = load_facet_config("config_files/3D/unit_cube/facets.toml")
    mark_boundary_facets(mesh, marker)
    tags = np.unique(mesh.facet_tags[mesh.facet_tags > 0])
    assert set(tags) == {1, 2, 3, 4, 5, 6}
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, load_bc_config("config_files/3D/unit_cube/bcs.toml"))
    assert bcs.dirichlet_mask.any()
    geo = load_step_flow_config("config_files/3D/step/geometry.toml")
    assert geo.dim == 3 and geo.width == 0.4
    assert load_facet_config("config_files/3D/step/facets.toml") is not None


def test_bc_expression_values_from_toml(tmp_path):
    """TOML BC values as coordinate expressions (callable-BC parity:
    the reference interpolates Python callables, FEM/bcs.py:77-195)."""
    import numpy as np

    from lsafw_tpu.config import load_bc_config
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import unit_square
    from lsafw_tpu.meshing.tags import mark_boundary_facets

    toml = tmp_path / "bcs.toml"
    toml.write_text(
        '[[BC]]\nmarker = 1\ntype = "dirichlet_velocity"\n'
        'value = ["4*y*(1 - y)", "0.0"]\n'
        '[[BC]]\nmarker = 2\ntype = "dirichlet_pressure"\nvalue = "sin(pi*y)"\n'
    )
    mesh = unit_square(4, 4)

    def marker(x):
        out = np.zeros(x.shape[0], dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], 1.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, load_bc_config(toml))
    # inlet u_x follows the parabola at each constrained velocity dof
    nu = spaces.num_velocity_dofs
    vdofs = np.nonzero(bcs.dirichlet_mask[:nu])[0]
    ux = vdofs[vdofs % 2 == 0]
    yc = spaces.velocity.dof_coords[ux][:, 1]
    assert np.allclose(bcs.dirichlet_values[ux], 4 * yc * (1 - yc))
    pdofs = np.nonzero(bcs.dirichlet_mask[nu:])[0]
    yp = spaces.pressure.node_coords[pdofs][:, 1]
    assert np.allclose(bcs.dirichlet_values[nu + pdofs], np.sin(np.pi * yp))


def test_msh_error_messages(tmp_path):
    """Malformed .msh inputs fail with actionable errors, not bare
    IndexError/KeyError (ROADMAP quality item)."""
    import pytest

    from lsafw_tpu.meshing.io import read_msh

    bad = tmp_path / "trunc.msh"
    bad.write_text("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n5\n1 0 0 0\n")
    with pytest.raises(ValueError, match="malformed|No mesh data"):
        read_msh(bad)
    binary = tmp_path / "bin.msh"
    binary.write_bytes(b"$MeshFormat\n2.2 1 8\n" + bytes(range(256)))
    with pytest.raises(ValueError, match="binary|malformed"):
        read_msh(binary)
