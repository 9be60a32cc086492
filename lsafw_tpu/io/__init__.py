"""Artifact IO: baseflow export/load, MatrixMarket, eigenvector export.

Counterpart of the reference's persistence surface:
``export_function``/``load_function`` (``Solver/baseflow.py:216-321``,
npz + DOF maps), MatrixMarket/PETSc-binary matrix export
(``FEM/utils.py:616-659``) and eigenvector binary export
(``FEM/utils.py:901-908``).  Complex data is stored as (re, im) real
pairs, matching the device representation.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

from lsafw_tpu.fem.spaces import FunctionSpaces
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def export_function(
    w: np.ndarray,
    spaces: FunctionSpaces,
    output_folder: Path | str,
    *,
    name: str = "baseflow",
) -> None:
    """Export a mixed (u, p) vector with its subspace DOF maps
    (parity: ``export_function``, ``Solver/baseflow.py:216-274``)."""
    out = Path(output_folder)
    out.mkdir(parents=True, exist_ok=True)
    w = np.asarray(w)
    np.savez(
        out / f"{name}_npz.npz",
        u=np.real(w[spaces.dofs_u]),
        p=np.real(w[spaces.dofs_p]),
        u_imag=np.imag(w[spaces.dofs_u]),
        p_imag=np.imag(w[spaces.dofs_p]),
        dofs_u=spaces.dofs_u,
        dofs_p=spaces.dofs_p,
    )
    logger.info("Function '%s' exported to '%s'", name, out)


def load_function(
    input_folder: Path | str, spaces: FunctionSpaces, *, name: str = "baseflow"
) -> np.ndarray:
    """(parity: ``load_function``, ``Solver/baseflow.py:277-321``)."""
    folder = Path(input_folder)
    if not folder.is_dir():
        raise ValueError(f"Input path {str(folder)!r} is not a valid folder.")
    z = np.load(folder / f"{name}_npz.npz", allow_pickle=False)
    has_imag = "u_imag" in z and (np.abs(z["u_imag"]).max() > 0 or np.abs(z["p_imag"]).max() > 0)
    dtype = np.complex128 if has_imag else np.float64
    w = np.zeros(spaces.num_dofs, dtype=dtype)
    w[z["dofs_u"]] = z["u"] + (1j * z["u_imag"] if has_imag else 0.0)
    w[z["dofs_p"]] = z["p"] + (1j * z["p_imag"] if has_imag else 0.0)
    logger.info("Function '%s' loaded from '%s'", name, folder)
    return w


def export_matrix(mat: CSRMatrix, path: Path | str) -> None:
    """MatrixMarket export (parity: ``iPETScMatrix.export``,
    ``FEM/utils.py:616-659``; .mtx is the reference's real->complex
    hand-off format, ``.examples/assembler.py:33``)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    sio.mmwrite(str(path), mat.to_scipy())
    logger.info("Matrix exported to '%s'", path)


def import_matrix(path: Path | str) -> CSRMatrix:
    """(parity: ``iPETScMatrix.from_path``, ``FEM/utils.py:144-215``)."""
    m = sio.mmread(str(path))
    return CSRMatrix.from_scipy(sp.csr_matrix(m))


def export_eigenvector(vec: np.ndarray, path: Path | str) -> None:
    """(parity: eigenvector binary export, ``FEM/utils.py:901-908``)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, re=np.real(vec), im=np.imag(vec))


def import_eigenvector(path: Path | str) -> np.ndarray:
    z = np.load(Path(path), allow_pickle=False)
    return z["re"] + 1j * z["im"]
