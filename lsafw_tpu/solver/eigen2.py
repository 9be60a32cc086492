"""ARPACK shift-invert eigensolver (validation alternative).

Counterpart of the reference's SLEPc-free escape hatch
(``ArpackEigenSolver``, ``Solver/eigen2.py:71-265``): the generalized
shift-invert problem wrapped as a scipy LinearOperator over a sparse
LU factorization, solved by ARPACK, with velocity-subspace projection,
residual QC and the mu -> lambda back-transform.  Serves as an
independent cross-check of the native Krylov-Schur solver
(:mod:`lsafw_tpu.solver.eigen`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class ShiftInvertConfig:
    """(parity: ``ShiftInvertConfig``, ``Solver/eigen2.py:59-68``)."""

    sigma: complex = 0.0
    num_eig: int = 5
    ncv: int | None = None
    tol: float = 1e-10
    max_it: int = 2000
    residual_warn: float = 1e-6


class ArpackEigenSolver:
    """Generalized shift-invert Arnoldi via scipy/ARPACK
    (parity: ``ArpackEigenSolver``, ``Solver/eigen2.py:71-265``)."""

    def __init__(
        self,
        A: CSRMatrix | sp.spmatrix,
        M: CSRMatrix | sp.spmatrix | None,
        config: ShiftInvertConfig | None = None,
        *,
        velocity_dofs: np.ndarray | None = None,
    ) -> None:
        self.cfg = config or ShiftInvertConfig()
        self._A = (A.to_scipy() if isinstance(A, CSRMatrix) else sp.csr_matrix(A)).astype(
            np.complex128
        )
        self._M = (
            (M.to_scipy() if isinstance(M, CSRMatrix) else sp.csr_matrix(M)).astype(
                np.complex128
            )
            if M is not None
            else None
        )
        self._vel = velocity_dofs
        n = self._A.shape[0]
        C = self._A - self.cfg.sigma * (
            self._M if self._M is not None else sp.identity(n, format="csr", dtype=np.complex128)
        )
        # one factorization, many applies (``Solver/eigen2.py:104-162``;
        # SuperLU here is the reference's own MUMPS fallback)
        self._lu = spla.splu(C.tocsc())

    def _op_mv(self, x: np.ndarray) -> np.ndarray:
        """y = (A - sigma M)^-1 M x (``Solver/eigen2.py:164-201``),
        with optional velocity-subspace projection."""
        b = self._M @ x if self._M is not None else x
        y = self._lu.solve(b)
        if not np.isfinite(y).all():
            raise FloatingPointError("Non-finite values in shift-invert apply.")
        if self._vel is not None:
            mask = np.zeros_like(y)
            mask[self._vel] = 1.0
            y = y * mask
        return y

    def solve(self) -> list[tuple[complex, np.ndarray]]:
        cfg = self.cfg
        n = self._A.shape[0]
        op = spla.LinearOperator((n, n), matvec=self._op_mv, dtype=np.complex128)
        mu, vecs = spla.eigs(
            op,
            k=cfg.num_eig,
            which="LM",
            ncv=cfg.ncv,
            tol=cfg.tol,
            maxiter=cfg.max_it,
        )
        lam = self._mu_to_lambda(mu)
        pairs = [(complex(lam[i]), vecs[:, i]) for i in range(len(lam))]
        self._check_residuals(pairs)
        order = np.argsort(np.abs(lam - cfg.sigma))
        return [pairs[i] for i in order]

    def _mu_to_lambda(self, mu: np.ndarray) -> np.ndarray:
        """(parity: ``_mu_to_lambda``, ``Solver/eigen2.py:210``)."""
        return self.cfg.sigma + 1.0 / mu

    def _check_residuals(self, pairs) -> None:
        """(parity: residual QC with warnings, ``Solver/eigen2.py:244-264``)."""
        for lam, x in pairs:
            Mx = self._M @ x if self._M is not None else x
            r = np.linalg.norm(self._A @ x - lam * Mx) / max(np.linalg.norm(x), 1e-300)
            if r > self.cfg.residual_warn:
                logger.warning(
                    "ARPACK eigenpair residual %.2e exceeds %.1e (lambda=%s)",
                    r, self.cfg.residual_warn, lam,
                )
