"""Sparse matrix containers and kernels for static-sparsity FEM operators.

TPU-native replacement for the PETSc Mat/Vec layer the reference wraps
(``FEM/utils.py:104-908`` ``iPETScMatrix``/``iPETScVector``):

  * the sparsity pattern is host-precomputed once per (mesh, spaces)
    and shared by A, M and every Jacobian — so matrix sums like
    ``A - sigma*M`` are element-wise data ops with zero index work;
  * device SpMV uses an ELL (padded-row) layout: one gather + one
    multiply + one row reduction, which XLA vectorizes on the VPU and
    which is the memory-bandwidth-optimal access pattern for
    bounded-degree FEM matrices (a Pallas kernel variant lives in
    :mod:`lsafw_tpu.ops.kernels`);
  * host-side conversions to scipy CSR support direct factorization
    and MatrixMarket IO (parity: ``FEM/utils.py:616-659`` export).

All structure arrays are static numpy; only ``data`` is a traced jnp
array, so assembly and solves jit cleanly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclass(frozen=True, eq=False)
class SparsityPattern:
    """CSR structure + COO-entry -> nnz-slot scatter map.

    Built once on the host from per-cell DOF maps; ``slots`` routes the
    flattened (cell, i, j) element-matrix entries into the deduplicated
    nnz array via ``jax.ops.segment_sum``.

    Equality is identity (``eq=False``): patterns ride through jit as
    pytree aux data, where distinct patterns must hash/compare fast and
    trigger a recompile rather than an array-valued comparison.
    """

    shape: tuple[int, int]
    indptr: np.ndarray  # (n+1,) int64
    indices: np.ndarray  # (nnz,) int32
    slots: np.ndarray  # (num_coo_entries,) int32

    @property
    def nnz(self) -> int:
        return int(self.indices.size)

    @cached_property
    def row_ids(self) -> np.ndarray:
        """(nnz,) row index of every stored entry."""
        n = self.shape[0]
        return np.repeat(
            np.arange(n, dtype=np.int32), np.diff(self.indptr).astype(np.int64)
        )

    @cached_property
    def diag_slots(self) -> np.ndarray:
        """(n,) nnz slot of each diagonal entry (requires square pattern
        containing the diagonal, which FEM cell patterns always do)."""
        n = self.shape[0]
        out = np.full(n, -1, dtype=np.int64)
        for r in range(n):
            lo, hi = self.indptr[r], self.indptr[r + 1]
            k = np.searchsorted(self.indices[lo:hi], r)
            if k < hi - lo and self.indices[lo + k] == r:
                out[r] = lo + k
        if (out < 0).any():
            raise ValueError("Sparsity pattern is missing diagonal entries.")
        return out

    @cached_property
    def ell(self) -> tuple[np.ndarray, np.ndarray, int]:
        """ELL mapping: (ell_map (n, w) int32 into nnz (-1 = pad),
        ell_cols (n, w) int32 (0 for pads), width w)."""
        n = self.shape[0]
        counts = np.diff(self.indptr).astype(np.int64)
        w = int(counts.max()) if n else 0
        ell_map = np.full((n, w), -1, dtype=np.int32)
        col_in_row = np.arange(self.nnz, dtype=np.int64) - np.repeat(self.indptr[:-1], counts)
        ell_map[self.row_ids, col_in_row] = np.arange(self.nnz, dtype=np.int32)
        ell_cols = np.zeros((n, w), dtype=np.int32)
        ell_cols[self.row_ids, col_in_row] = self.indices
        return ell_map, ell_cols, w


def build_sparsity(
    rows_per_cell: np.ndarray,
    cols_per_cell: np.ndarray | None = None,
    shape: tuple[int, int] | None = None,
) -> SparsityPattern:
    """Build the CSR pattern for a cell-local scatter.

    Args:
        rows_per_cell: (num_cells, a) int row DOFs per cell.
        cols_per_cell: (num_cells, b) int col DOFs (defaults to rows).
        shape: matrix shape (defaults to square over max DOF + 1).
    """
    rows_per_cell = np.asarray(rows_per_cell, dtype=np.int64)
    cols_per_cell = (
        rows_per_cell if cols_per_cell is None else np.asarray(cols_per_cell, dtype=np.int64)
    )
    nc, a = rows_per_cell.shape
    b = cols_per_cell.shape[1]
    if shape is None:
        n = int(rows_per_cell.max()) + 1
        m = int(cols_per_cell.max()) + 1
        shape = (n, m)
    rows = np.broadcast_to(rows_per_cell[:, :, None], (nc, a, b)).ravel()
    cols = np.broadcast_to(cols_per_cell[:, None, :], (nc, a, b)).ravel()
    keys = rows * shape[1] + cols
    uniq, inverse = np.unique(keys, return_inverse=True)
    indices = (uniq % shape[1]).astype(np.int32)
    urows = uniq // shape[1]
    indptr = np.zeros(shape[0] + 1, dtype=np.int64)
    np.add.at(indptr, urows + 1, 1)
    np.cumsum(indptr, out=indptr)
    return SparsityPattern(
        shape=shape,
        indptr=indptr,
        indices=indices,
        slots=inverse.astype(np.int32),
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class CSRMatrix:
    """A sparse matrix with static structure and traced data.

    The jit-visible leaf is ``data``; the pattern rides along as static
    aux data (identical patterns share one compiled kernel).
    """

    pattern: SparsityPattern
    data: jnp.ndarray

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.data,), self.pattern

    @classmethod
    def tree_unflatten(cls, pattern, leaves):
        return cls(pattern=pattern, data=leaves[0])

    # --- properties ---
    @property
    def shape(self) -> tuple[int, int]:
        return self.pattern.shape

    @property
    def dtype(self):
        return self.data.dtype

    # --- algebra (parity: iPETScMatrix arithmetic, FEM/utils.py:226-330) ---
    def __add__(self, other: "CSRMatrix") -> "CSRMatrix":
        self._check_same_pattern(other)
        return CSRMatrix(self.pattern, self.data + other.data)

    def __sub__(self, other: "CSRMatrix") -> "CSRMatrix":
        self._check_same_pattern(other)
        return CSRMatrix(self.pattern, self.data - other.data)

    def __mul__(self, alpha) -> "CSRMatrix":
        return CSRMatrix(self.pattern, self.data * alpha)

    __rmul__ = __mul__

    def axpy(self, alpha, other: "CSRMatrix") -> "CSRMatrix":
        """self + alpha * other (parity: ``iPETScMatrix.axpy``)."""
        self._check_same_pattern(other)
        return CSRMatrix(self.pattern, self.data + alpha * other.data)

    def _check_same_pattern(self, other: "CSRMatrix") -> None:
        if other.pattern is not self.pattern:
            raise ValueError(
                "CSRMatrix arithmetic requires a shared SparsityPattern "
                "(assemble both operators from the same AssemblyContext)."
            )

    def diagonal(self) -> jnp.ndarray:
        return self.data[self.pattern.diag_slots]

    # --- matvec ---
    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        return spmv(self, x)

    def matvec_t(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transpose matvec A^T x without materializing A^T: scatter-add
        the column contributions (adjoint of the ELL gather)."""
        pat = self.pattern
        contrib = self.data * x[jnp.asarray(pat.row_ids)]
        return jax.ops.segment_sum(
            contrib, jnp.asarray(pat.indices.astype(np.int32)), num_segments=pat.shape[1]
        )

    # --- host interop ---
    def to_scipy(self) -> sp.csr_matrix:
        return sp.csr_matrix(
            (np.asarray(self.data), self.pattern.indices, self.pattern.indptr),
            shape=self.shape,
        )

    @classmethod
    def from_scipy(cls, mat: sp.spmatrix) -> "CSRMatrix":
        m = sp.csr_matrix(mat)
        m.sort_indices()
        pattern = SparsityPattern(
            shape=m.shape,
            indptr=m.indptr.astype(np.int64),
            indices=m.indices.astype(np.int32),
            slots=np.arange(m.nnz, dtype=np.int32),
        )
        return cls(pattern, jnp.asarray(m.data))

    def transpose(self) -> "CSRMatrix":
        """Host-side transpose producing a new pattern
        (parity: ``iPETScMatrix.T`` / Sensitivity ``_hermitian``)."""
        return CSRMatrix.from_scipy(self.to_scipy().T.tocsr())


def assemble_csr_data(
    pattern: SparsityPattern, element_values: jnp.ndarray
) -> jnp.ndarray:
    """Scatter flattened per-cell element matrices into nnz data.

    ``element_values``: (num_cells, a, b) or already-flat (num_entries,).
    This is the single jit-compatible scatter primitive the whole FEM
    layer reduces to (replaces dolfinx's C++ assembly insertion loop,
    ``FEM/operators.py:483-486``).
    """
    flat = element_values.reshape(-1)
    return jax.ops.segment_sum(
        flat, jnp.asarray(pattern.slots), num_segments=pattern.nnz
    )


def spmv(A: CSRMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """ELL-layout sparse matrix-vector product y = A x."""
    ell_map, ell_cols, _ = A.pattern.ell
    data_ell = jnp.where(
        jnp.asarray(ell_map) >= 0, A.data[jnp.asarray(ell_map)], 0.0
    )
    return (data_ell * x[jnp.asarray(ell_cols)]).sum(axis=1)


def spmv_pair(A: CSRMatrix, xr: jnp.ndarray, xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real-matrix complex SpMV over an (re, im) pair: two fused gathers
    (the TPU-native form of the reference's real-build complex emulation,
    ``FEM/utils.py:911-1244``)."""
    ell_map, ell_cols, _ = A.pattern.ell
    m = jnp.asarray(ell_map)
    c = jnp.asarray(ell_cols)
    data_ell = jnp.where(m >= 0, A.data[m], 0.0)
    return (data_ell * xr[c]).sum(axis=1), (data_ell * xi[c]).sum(axis=1)
