"""SHA-256-keyed disk cache for meshes, solution arrays and matrices.

Counterpart of the reference's ``CacheStore`` (``lib/cache.py:21-110``,
XDMF/HDF5 + PETSc viewers); here artifacts are npz archives — meshes
are plain arrays and operators are (pattern, data) CSR triples, so
numpy containers are the natural persistence format.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import scipy.sparse as sp

from lsafw_tpu.meshing.mesh import CellType, Mesh
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _hash(key: str) -> str:
    return hashlib.sha256(key.encode()).hexdigest()[:32]


class CacheStore:
    """(parity: ``CacheStore``, ``lib/cache.py:21``)."""

    def __init__(self, root: Path | str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, kind: str, key: str) -> Path:
        return self.root / f"{kind}_{_hash(key)}.npz"

    # --- meshes (parity: load/save_mesh, lib/cache.py:34-73) ---
    def save_mesh(self, key: str, mesh: Mesh) -> None:
        data = dict(
            vertices=mesh.vertices,
            cells=mesh.cells,
            cell_type=np.array(mesh.cell_type.value),
        )
        if mesh.facet_tags is not None:
            data["facet_tags"] = mesh.facet_tags
        if mesh.cell_tags is not None:
            data["cell_tags"] = mesh.cell_tags
        np.savez_compressed(self._path("mesh", key), **data)
        logger.debug("Cached mesh under %s", key)

    def load_mesh(self, key: str) -> Mesh | None:
        p = self._path("mesh", key)
        if not p.exists():
            return None
        z = np.load(p, allow_pickle=False)
        mesh = Mesh(
            vertices=z["vertices"],
            cells=z["cells"],
            cell_type=CellType(str(z["cell_type"])),
        )
        if "facet_tags" in z:
            mesh.facet_tags = z["facet_tags"]
        if "cell_tags" in z:
            mesh.cell_tags = z["cell_tags"]
        return mesh

    # --- arrays / functions (parity: load/save_function, lib/cache.py:74-91) ---
    def save_array(self, key: str, arr: np.ndarray) -> None:
        np.savez_compressed(self._path("fn", key), data=np.asarray(arr))
        logger.debug("Cached array under %s", key)

    def load_array(self, key: str) -> np.ndarray | None:
        p = self._path("fn", key)
        if not p.exists():
            return None
        return np.load(p, allow_pickle=False)["data"]

    # --- matrices (parity: load/save_matrix, lib/cache.py:92-110) ---
    def save_matrix(self, key: str, mat: CSRMatrix) -> None:
        np.savez_compressed(
            self._path("mat", key),
            data=np.asarray(mat.data),
            indices=mat.pattern.indices,
            indptr=mat.pattern.indptr,
            shape=np.asarray(mat.shape),
        )
        logger.debug("Cached matrix under %s", key)

    def load_matrix(self, key: str) -> CSRMatrix | None:
        p = self._path("mat", key)
        if not p.exists():
            return None
        z = np.load(p, allow_pickle=False)
        m = sp.csr_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"])
        )
        return CSRMatrix.from_scipy(m)
