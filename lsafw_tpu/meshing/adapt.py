"""Baseflow-driven mesh adaptation.

Counterpart of ``Meshing/adapt.py:215-265``: the reference projects the
baseflow velocity magnitude to P1, scales/clamps it into a target
element-size field, writes a GMSH POS background field and remeshes
through gmsh.  Natively, the same size field drives a distmesh
regeneration: |u| is sampled at old-mesh vertices, mapped to sizes in
[min_size, max_size] (fast flow -> fine cells), and interpolated as the
``fh`` field of :func:`lsafw_tpu.meshing.geometries.distmesh2d`
(triangles) or :func:`~lsafw_tpu.meshing.geometries.distmesh3d` (tets,
the counterpart of the reference's 4-faces/tet POS background fields,
``Meshing/adapt.py:102-138``).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from lsafw_tpu.fem.spaces import FunctionSpaces
from lsafw_tpu.meshing.geometries import SDF, distmesh2d
from lsafw_tpu.meshing.mesh import CellType, Mesh
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def velocity_magnitude_p1(spaces: FunctionSpaces, baseflow: np.ndarray) -> np.ndarray:
    """|u| at mesh vertices (parity: ``_project_velocity_magnitude``,
    ``Meshing/adapt.py:55-88`` — nodal evaluation replaces the
    lumped-mass L2 projection; identical for Lagrange velocity spaces)."""
    u, _ = spaces.split(np.real(baseflow))
    mag = np.linalg.norm(u, axis=1)
    nv = spaces.velocity.mesh.num_vertices
    return mag[:nv]  # velocity nodes are ordered vertices-first


def scale_and_clamp(
    mag: np.ndarray, min_size: float, max_size: float
) -> np.ndarray:
    """Map velocity magnitude to target sizes: fastest flow -> finest
    cells (parity: ``_scale_and_clamp_velocity``, ``Meshing/adapt.py:91-99``)."""
    lo, hi = float(mag.min()), float(mag.max())
    t = (mag - lo) / (hi - lo) if hi > lo else np.zeros_like(mag)
    return np.clip(max_size - t * (max_size - min_size), min_size, max_size)


def adapt_mesh(
    mesh: Mesh,
    spaces: FunctionSpaces,
    baseflow: np.ndarray,
    *,
    min_size: float,
    max_size: float,
    fd: SDF | None = None,
    pfix: np.ndarray | None = None,
    max_iter: int = 120,
    seed: int = 0,
) -> Mesh:
    """Remesh with a baseflow-magnitude size field
    (parity: ``adapt_mesh``, ``Meshing/adapt.py:215-265``).

    Args:
        fd: signed distance of the domain; defaults to the convex
            bounding box of the current mesh (adequate for channel
            domains; pass the true SDF for domains with holes).
        pfix: fixed points (domain corners etc.).
    """
    if mesh.tdim not in (2, 3):
        raise NotImplementedError("Native adaptation supports 2D/3D simplex meshes.")
    mag = velocity_magnitude_p1(spaces, baseflow)
    sizes = scale_and_clamp(mag, min_size, max_size)
    tree = cKDTree(mesh.vertices)

    def fh(p: np.ndarray) -> np.ndarray:
        _, idx = tree.query(p)
        return sizes[idx]

    lo = mesh.vertices.min(axis=0)
    hi = mesh.vertices.max(axis=0)
    if mesh.tdim == 2:
        if fd is None:
            from lsafw_tpu.meshing.geometries import d_rectangle

            (x0, y0), (x1, y1) = lo, hi

            def fd(p):  # noqa: F811 - deliberate default
                return d_rectangle(p, x0, x1, y0, y1)

            if pfix is None:
                pfix = np.array([[x0, y0], [x1, y0], [x0, y1], [x1, y1]])
        bbox = (float(lo[0]), float(hi[0]), float(lo[1]), float(hi[1]))
        pts, cells = distmesh2d(
            fd, fh, min_size, bbox, pfix, max_iter=max_iter, seed=seed
        )
        new = Mesh(pts, cells, CellType.TRIANGLE)
    else:
        # 3D: graded tet regeneration through distmesh3d (parity:
        # the reference's 4-faces/tet POS background remeshing,
        # ``Meshing/adapt.py:102-138`` — here the size field drives the
        # tet smoother directly, no POS round-trip needed)
        from lsafw_tpu.meshing.geometries import d_box, distmesh3d

        if fd is None:
            (x0, y0, z0), (x1, y1, z1) = lo, hi

            def fd(p):  # noqa: F811 - deliberate default
                return d_box(p, x0, x1, y0, y1, z0, z1)

            if pfix is None:
                pfix = np.array(
                    [[x, y, z] for x in (x0, x1) for y in (y0, y1) for z in (z0, z1)]
                )
        bbox = (
            float(lo[0]), float(hi[0]),
            float(lo[1]), float(hi[1]),
            float(lo[2]), float(hi[2]),
        )
        pts, cells = distmesh3d(
            fd, fh, min_size, bbox, pfix, max_iter=max_iter, seed=seed
        )
        new = Mesh(pts, cells, CellType.TETRAHEDRON)
    logger.info(
        "Adapted mesh: %d -> %d cells (h in [%.3g, %.3g])",
        mesh.num_cells, new.num_cells, min_size, max_size,
    )
    return new
