"""XDMF/HDF5 mesh and function export.

Interop parity with the reference's persistence layer: dolfinx writes
meshes, facet tags and functions as XDMF + HDF5
(``/root/reference/Meshing/core.py:215-262``, ``lib/cache.py:34-91``).
Output opens in ParaView and reads back with meshio/dolfinx.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lsafw_tpu.meshing.mesh import CellType, Mesh

_XDMF_TOPOLOGY = {
    CellType.TRIANGLE: "Triangle",
    CellType.QUADRILATERAL: "Quadrilateral",
    CellType.TETRAHEDRON: "Tetrahedron",
    CellType.HEXAHEDRON: "Hexahedron",
    CellType.INTERVAL: "Polyline",
}

# XDMF hexahedron ordering differs from box_mesh's binary (di,dj,dk):
# VTK/XDMF wants the bottom quad CCW then the top quad CCW.
_CELL_PERMUTE = {
    CellType.HEXAHEDRON: [0, 4, 6, 2, 1, 5, 7, 3],
    CellType.QUADRILATERAL: [0, 1, 3, 2],
}


def write_xdmf(
    path: Path | str,
    mesh: Mesh,
    *,
    point_data: dict[str, np.ndarray] | None = None,
    cell_data: dict[str, np.ndarray] | None = None,
) -> Path:
    """Write mesh (+ optional nodal/cell fields) as ``path``.xdmf/.h5.

    ``point_data`` arrays are (num_vertices,) scalars or
    (num_vertices, k) vectors evaluated at mesh vertices (P2 fields:
    pass the vertex-node slice); ``cell_data`` are per-cell scalars
    (e.g. facet-region markers projected to cells, DG-0 materials).
    """
    import h5py

    path = Path(path)
    if path.suffix == ".xdmf":
        path = path.with_suffix("")
    h5path = path.with_suffix(".h5")
    xdmfpath = path.with_suffix(".xdmf")

    cells = mesh.cells
    perm = _CELL_PERMUTE.get(mesh.cell_type)
    if perm is not None:
        cells = cells[:, perm]
    verts = mesh.vertices
    if verts.shape[1] == 2:  # XDMF XY geometry exists, but 3D is safest
        geom_type = "XY"
    else:
        geom_type = "XYZ"

    with h5py.File(h5path, "w") as h5:
        h5.create_dataset("mesh/topology", data=cells.astype(np.int64))
        h5.create_dataset("mesh/geometry", data=verts.astype(np.float64))
        for name, arr in (point_data or {}).items():
            h5.create_dataset(f"point/{name}", data=np.asarray(arr, dtype=np.float64))
        for name, arr in (cell_data or {}).items():
            h5.create_dataset(f"cell/{name}", data=np.asarray(arr))

    def _attr(name: str, arr: np.ndarray, center: str, group: str) -> str:
        arr = np.asarray(arr)
        if arr.ndim == 1:
            atype, dims = "Scalar", f"{arr.shape[0]}"
        else:
            atype = "Vector" if arr.shape[1] in (2, 3) else "Matrix"
            dims = f"{arr.shape[0]} {arr.shape[1]}"
        dtype = "Float" if np.issubdtype(arr.dtype, np.floating) else "Int"
        return (
            f'      <Attribute Name="{name}" AttributeType="{atype}" Center="{center}">\n'
            f'        <DataItem Dimensions="{dims}" NumberType="{dtype}" Format="HDF">'
            f"{h5path.name}:/{group}/{name}</DataItem>\n"
            f"      </Attribute>\n"
        )

    attrs = "".join(
        _attr(n, a, "Node", "point") for n, a in (point_data or {}).items()
    ) + "".join(_attr(n, a, "Cell", "cell") for n, a in (cell_data or {}).items())

    topo = _XDMF_TOPOLOGY[mesh.cell_type]
    xml = f"""<?xml version="1.0"?>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Topology TopologyType="{topo}" NumberOfElements="{cells.shape[0]}">
        <DataItem Dimensions="{cells.shape[0]} {cells.shape[1]}" NumberType="Int" Format="HDF">{h5path.name}:/mesh/topology</DataItem>
      </Topology>
      <Geometry GeometryType="{geom_type}">
        <DataItem Dimensions="{verts.shape[0]} {verts.shape[1]}" Format="HDF">{h5path.name}:/mesh/geometry</DataItem>
      </Geometry>
{attrs}    </Grid>
  </Domain>
</Xdmf>
"""
    xdmfpath.write_text(xml)
    return xdmfpath


def read_xdmf(path: Path | str) -> tuple[Mesh, dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Read back a mesh written by :func:`write_xdmf` (round-trip and
    interop ingestion)."""
    import h5py

    path = Path(path)
    h5path = path.with_suffix(".h5")
    with h5py.File(h5path, "r") as h5:
        cells = np.asarray(h5["mesh/topology"])
        verts = np.asarray(h5["mesh/geometry"])
        point_data = {k: np.asarray(v) for k, v in h5.get("point", {}).items()}
        cell_data = {k: np.asarray(v) for k, v in h5.get("cell", {}).items()}
    nv = cells.shape[1]
    dim = verts.shape[1]
    cell_type = {
        (3, 2): CellType.TRIANGLE,
        (4, 2): CellType.QUADRILATERAL,
        (4, 3): CellType.TETRAHEDRON,
        (8, 3): CellType.HEXAHEDRON,
    }[(nv, dim)]
    perm = _CELL_PERMUTE.get(cell_type)
    if perm is not None:
        inv = np.argsort(perm)
        cells = cells[:, inv]
    return Mesh(verts, cells, cell_type), point_data, cell_data
