"""ctypes bindings for the native (C++) components.

The native layer plays the roles the reference delegates to vendored
C/C++ libraries (SURVEY.md section 2.2): here, dolfinx's C++ sparsity
construction.  Everything degrades gracefully to the numpy
implementation when the shared library has not been built
(``make -C native``); builds on demand when a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsparsity.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and os.environ.get("LSAFW_BUILD_NATIVE", "1") == "1":
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as exc:  # toolchain absent etc.
            logger.debug("native build skipped: %s", exc)
    if _LIB_PATH.exists():
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            if hasattr(lib, "lsafw_rcm"):
                lib.lsafw_rcm.restype = ctypes.c_int64
                lib.lsafw_rcm.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_void_p,
                ]
            lib.lsafw_build_pattern.restype = ctypes.c_int64
            lib.lsafw_build_pattern.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
            logger.debug("native sparsity builder loaded from %s", _LIB_PATH)
        except OSError as exc:
            logger.warning("failed to load native library: %s", exc)
    return _lib


def native_available() -> bool:
    return _load() is not None


def build_pattern_native(
    cell_rows: np.ndarray, cell_cols: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """(indptr, indices, slots) via the C++ builder, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    cell_rows = np.ascontiguousarray(cell_rows, dtype=np.int32)
    cell_cols = np.ascontiguousarray(cell_cols, dtype=np.int32)
    nc, a = cell_rows.shape
    b = cell_cols.shape[1]
    n_entries = nc * a * b
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    indices = np.empty(n_entries, dtype=np.int32)
    slots = np.empty(n_entries, dtype=np.int32)
    nnz = lib.lsafw_build_pattern(
        cell_rows.ctypes.data, cell_cols.ctypes.data,
        nc, a, b, n_rows,
        indptr.ctypes.data, indices.ctypes.data, slots.ctypes.data,
    )
    if nnz < 0:
        raise ValueError("native sparsity builder: DOF index out of range")
    return indptr, indices[:nnz].copy(), slots


def rcm_native(indptr: np.ndarray, indices: np.ndarray, n: int) -> np.ndarray | None:
    """Reverse Cuthill-McKee permutation via the C++ implementation, or
    None if the library is unavailable.  The pattern must be
    structurally symmetric (same contract as scipy's
    ``reverse_cuthill_mckee(symmetric_mode=True)``, which this replaces
    — scipy costs 30-80 s at 520k DOFs, the native sweep ~0.5 s)."""
    lib = _load()
    if lib is None or not hasattr(lib, "lsafw_rcm"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    perm = np.empty(n, dtype=np.int32)
    rc = lib.lsafw_rcm(indptr.ctypes.data, indices.ctypes.data, n, perm.ctypes.data)
    if rc != 0:
        return None
    return perm.astype(np.int64)
