"""Meshing layer: canonical generators, benchmark geometries, facet tagging.

TPU-native counterpart of the reference's ``Meshing/`` package
(``Meshing/core.py``, ``Meshing/geometries.py``): meshes are plain
host-side numpy arrays (static compile-time data for the jitted
numerics), generated natively (structured grids, Delaunay-based
cylinder/step benchmark geometries) instead of through the gmsh C++
kernel.
"""

from lsafw_tpu.meshing.mesh import (
    CellType,
    Mesh,
    Shape,
    box_mesh,
    generate_mesh,
    unit_cube,
    unit_interval,
    unit_square,
)
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh, step_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets

__all__ = [
    "CellType",
    "Mesh",
    "Shape",
    "generate_mesh",
    "unit_interval",
    "unit_square",
    "unit_cube",
    "box_mesh",
    "cylinder_flow_mesh",
    "step_flow_mesh",
    "mark_boundary_facets",
]
