"""Sparse matrix containers and kernels for static-sparsity FEM operators.

TPU-native replacement for the PETSc Mat/Vec layer the reference wraps
(``FEM/utils.py:104-908`` ``iPETScMatrix``/``iPETScVector``):

  * the sparsity pattern is host-precomputed once per (mesh, spaces)
    and shared by A, M and every Jacobian — so matrix sums like
    ``A - sigma*M`` are element-wise data ops with zero index work;
  * device SpMV uses an ELL (padded-row) layout: one gather + one
    multiply + one row reduction, which XLA vectorizes on the VPU and
    which is the memory-bandwidth-optimal access pattern for
    bounded-degree FEM matrices;
  * host-side conversions to scipy CSR support direct factorization
    and MatrixMarket IO (parity: ``FEM/utils.py:616-659`` export).

TPU compilation contract: large index arrays must reach jitted code as
*arguments*, never as closed-over constants (embedded constants make
XLA program serialization/compilation take minutes at FEM sizes).  The
structure therefore materializes once as a :class:`PatternDev` bundle
of device arrays, and :class:`CSRMatrix` is a pytree whose leaves are
``(data, dev)`` — pass the matrix itself through jit and everything
stays a runtime buffer.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


class PatternDev(NamedTuple):
    """Device-resident structure arrays of a sparsity pattern."""

    slots: jnp.ndarray  # (num_coo_entries,) int32: COO entry -> nnz slot
    row_ids: jnp.ndarray  # (nnz,) int32
    indices: jnp.ndarray  # (nnz,) int32 column ids
    diag_slots: jnp.ndarray  # (n,) int32
    ell_map: jnp.ndarray  # (n, w) int32 into nnz, -1 = pad
    ell_cols: jnp.ndarray  # (n, w) int32, 0 on pads


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
        """(n,) nnz slot of each diagonal entry (vectorized per-row
        binary search: (row, col) pairs form one globally sorted key)."""
        n = self.shape[0]
        rows = np.arange(n, dtype=np.int64)
        key = self.row_ids.astype(np.int64) * (self.shape[1] + 1) + self.indices
        want = rows * (self.shape[1] + 1) + rows
        out = np.searchsorted(key, want)
        if not ((out < self.nnz) & (key[np.minimum(out, self.nnz - 1)] == want)).all():
            raise ValueError("Sparsity pattern is missing diagonal entries.")
        return out

    @cached_property
    def has_full_diagonal(self) -> bool:
        try:
            _ = self.diag_slots
            return True
        except ValueError:
            return False

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

    @cached_property
    def dev(self) -> PatternDev:
        """Device bundle.  Materialized eagerly (never first-touch this
        inside a jit trace); pass it (or a CSRMatrix) as a jit argument."""
        ell_map, ell_cols, _ = self.ell
        diag = (
            self.diag_slots.astype(np.int32)
            if self.has_full_diagonal
            else np.zeros(self.shape[0], dtype=np.int32)  # sentinel; see diagonal()
        )
        return PatternDev(
            slots=jnp.asarray(self.slots),
            row_ids=jnp.asarray(self.row_ids),
            indices=jnp.asarray(self.indices.astype(np.int32)),
            diag_slots=jnp.asarray(diag),
            ell_map=jnp.asarray(ell_map),
            ell_cols=jnp.asarray(ell_cols),
        )


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

    # native C++ builder (bucketed counting sort, ~10x the numpy path)
    from lsafw_tpu.ops.native import build_pattern_native

    native = build_pattern_native(rows_per_cell, cols_per_cell, shape[0])
    if native is not None:
        indptr, indices, slots = native
        return SparsityPattern(shape=shape, indptr=indptr, indices=indices, slots=slots)

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

    Pytree leaves are ``(data, dev)`` so jitted callees receive the
    structure arrays as runtime buffers; the host-side pattern rides
    along as static aux data.
    """

    pattern: SparsityPattern
    data: jnp.ndarray
    dev: PatternDev = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.dev is None:
            self.dev = self.pattern.dev

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.data, self.dev), self.pattern

    @classmethod
    def tree_unflatten(cls, pattern, leaves):
        data, dev = leaves
        obj = cls.__new__(cls)
        obj.pattern = pattern
        obj.data = data
        obj.dev = dev
        return obj

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
        return CSRMatrix(self.pattern, self.data + other.data, self.dev)

    def __sub__(self, other: "CSRMatrix") -> "CSRMatrix":
        self._check_same_pattern(other)
        return CSRMatrix(self.pattern, self.data - other.data, self.dev)

    def __mul__(self, alpha) -> "CSRMatrix":
        return CSRMatrix(self.pattern, self.data * alpha, self.dev)

    __rmul__ = __mul__

    def axpy(self, alpha, other: "CSRMatrix") -> "CSRMatrix":
        """self + alpha * other (parity: ``iPETScMatrix.axpy``)."""
        self._check_same_pattern(other)
        return CSRMatrix(self.pattern, self.data + alpha * other.data, self.dev)

    def _check_same_pattern(self, other: "CSRMatrix") -> None:
        if other.pattern is not self.pattern:
            raise ValueError(
                "CSRMatrix arithmetic requires a shared SparsityPattern "
                "(assemble both operators from the same AssemblyContext)."
            )

    def diagonal(self) -> jnp.ndarray:
        if not self.pattern.has_full_diagonal:
            raise ValueError("Matrix pattern has no stored diagonal.")
        return self.data[self.dev.diag_slots]

    # --- matvec ---
    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        return spmv(self, x)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Operator-protocol alias (LOBPCG/MG take ops with .matvec)."""
        return spmv(self, x)

    def matvec_t(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transpose matvec A^T x without materializing A^T: scatter-add
        the column contributions (adjoint of the ELL gather)."""
        from lsafw_tpu.ops.exact import segment_sum_fast

        contrib = self.data * x[self.dev.row_ids]
        return segment_sum_fast(contrib, self.dev.indices, self.pattern.shape[1])

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


def transpose_pair(A: "CSRMatrix", M: "CSRMatrix") -> tuple["CSRMatrix", "CSRMatrix"]:
    """Transpose an (A, M) pair that shares a sparsity pattern onto ONE
    shared transposed pattern.

    ``A.transpose()`` alone re-patterns each matrix separately, which
    knocks adjoint solves off every shared-pattern fast path (device
    C = A - sigma M arithmetic, BandPlan caching, BCSR refinement
    matvecs — ``solver/eigen.py:_factor_banded``).  Here the slot
    permutation of the structural transpose is computed once and both
    data arrays are permuted onto the same pattern object, preserving
    explicit zeros (scipy arithmetic prunes them, which loses the
    saddle-point diagonal slots the band regularization needs)."""
    if M.pattern is not A.pattern:
        return A.transpose(), M.transpose()
    pat = A.pattern
    Ps = sp.csr_matrix(
        # 1-based slot ids: an explicit 0 would be vulnerable to pruning
        (np.arange(1, pat.nnz + 1, dtype=np.int64), pat.indices, pat.indptr),
        shape=pat.shape,
    )
    Pt = Ps.T.tocsr()
    perm = Pt.data.astype(np.int64) - 1
    pattern_t = SparsityPattern(
        shape=(pat.shape[1], pat.shape[0]),
        indptr=Pt.indptr.astype(np.int64),
        indices=Pt.indices.astype(np.int32),
        slots=np.arange(pat.nnz, dtype=np.int32),
    )
    perm_d = jnp.asarray(perm)
    return (
        CSRMatrix(pattern_t, A.data[perm_d]),
        CSRMatrix(pattern_t, M.data[perm_d]),
    )


def assemble_csr_data(
    pattern: SparsityPattern | PatternDev, element_values: jnp.ndarray
) -> jnp.ndarray:
    """Scatter flattened per-cell element matrices into nnz data.

    ``element_values``: (num_cells, a, b) or already-flat (num_entries,).
    This is the single jit-compatible scatter primitive the whole FEM
    layer reduces to (replaces dolfinx's C++ assembly insertion loop,
    ``FEM/operators.py:483-486``).  Under jit, pass the pattern's
    :class:`PatternDev` (or a context pytree carrying it) as an argument.
    """
    from lsafw_tpu.ops.exact import segment_sum_fast

    dev = pattern.dev if isinstance(pattern, SparsityPattern) else pattern
    nnz = (
        pattern.nnz
        if isinstance(pattern, SparsityPattern)
        else int(dev.indices.shape[0])
    )
    flat = element_values.reshape(-1)
    return segment_sum_fast(flat, dev.slots, nnz)


def spmv(A: CSRMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """ELL-layout sparse matrix-vector product y = A x.

    f64 gathers run as hi/lo f32 pairs on TPU (ops/exact.py), bounding
    the apply error at ~2^-48 relative — Krylov-grade accuracy at f32
    gather speed."""
    from lsafw_tpu.ops.exact import gather_f64_fast

    data_ell = jnp.where(A.dev.ell_map >= 0, gather_f64_fast(A.data, A.dev.ell_map), 0.0)
    return (data_ell * gather_f64_fast(x, A.dev.ell_cols)).sum(axis=1)


def spmv_pair(A: CSRMatrix, xr: jnp.ndarray, xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real-matrix complex SpMV over an (re, im) pair: two fused gathers
    (the TPU-native form of the reference's real-build complex emulation,
    ``FEM/utils.py:911-1244``)."""
    from lsafw_tpu.ops.exact import gather_f64_fast

    data_ell = jnp.where(A.dev.ell_map >= 0, gather_f64_fast(A.data, A.dev.ell_map), 0.0)
    c = A.dev.ell_cols
    xrg = gather_f64_fast(xr, c)
    xig = gather_f64_fast(xi, c)
    return (data_ell * xrg).sum(axis=1), (data_ell * xig).sum(axis=1)
