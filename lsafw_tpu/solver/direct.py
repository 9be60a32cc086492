"""Direct sparse factorization.

The reference's direct-solve workhorse is MUMPS/SuperLU through PETSc
(``Solver/nonlinear2.py:67``, ``Solver/eigen2.py:127-150``,
``Solver/linear.py:89-168``).  Here the host-side factorization path
wraps scipy SuperLU (same underlying library as the reference's
fallback), with real *and* complex support; the TPU-resident
alternative for shift-invert is the preconditioned iterative inner
solve in :mod:`lsafw_tpu.solver.eigen`.  A C++ native factorization
with device triangular solves is the planned replacement (see
``native/``).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from lsafw_tpu.ops.sparse import CSRMatrix


class SparseLU:
    """LU factorization of a sparse matrix (real or complex).

    Parity: the PREONLY+LU shift-invert factorization of
    ``Solver/eigen2.py:104-162`` (one factorization, many solves).
    """

    def __init__(self, A: CSRMatrix | sp.spmatrix) -> None:
        mat = A.to_scipy() if isinstance(A, CSRMatrix) else sp.csc_matrix(A)
        self.shape = mat.shape
        self.dtype = mat.dtype
        self._lu = spla.splu(sp.csc_matrix(mat))

    def solve(self, b: np.ndarray) -> np.ndarray:
        """Solve A x = b (host arrays; accepts (n,) or (n, k))."""
        return self._lu.solve(np.asarray(b, dtype=self.dtype))

    def solve_t(self, b: np.ndarray) -> np.ndarray:
        """Solve A^T x = b."""
        return self._lu.solve(np.asarray(b, dtype=self.dtype), trans="T")


def direct_solve(A: CSRMatrix | sp.spmatrix, b) -> np.ndarray:
    """One-shot direct LU solve (parity: ``direct_lu_solve``,
    ``Solver/linear.py:89-120``)."""
    return SparseLU(A).solve(np.asarray(b))
