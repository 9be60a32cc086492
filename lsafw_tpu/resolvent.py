"""Resolvent analysis: optimal harmonic forcing / response gains.

Beyond the reference's modal toolbox (``/root/reference/Sensitivity/``
stops at eigenmodes + structural sensitivity): resolvent analysis is
the standard companion study for stable baseflows — the largest
energy amplification a harmonic body forcing can achieve,

    sigma_1(omega)^2 = max_f  ||q||_E^2 / ||f||_E^2,
    (i omega M - A) q = M P f,

with ``A, M`` the linearized-NS eigensystem pair (the exact matrices of
``LinearizedNavierStokesAssembler.assemble_eigensystem``), ``P`` the
restriction of the forcing to free velocity DOFs (momentum forcing
only, zero on Dirichlet/pressure DOFs) and the energy norm
``||q||_E^2 = q^H M q`` (kinetic energy: M has zero pressure rows).

The gains are the eigenvalues of the Hermitian operator

    T = P^T M C^-H M C^-1 M P,   C = i omega M - A,

generalized against ``W = P^T M P`` (SPD on the forcing subspace).
Each ``T`` apply is exactly two shift-invert applies of the existing
machinery: with ``sigma = i omega``,

    C^-1 M v  = -(A - sigma M)^-1 M v         (the direct SI operator)
    C^-H M v  = -(A^T - conj(sigma) M)^-1 M v (the adjoint SI operator)

so the banded device factorization, BCSR refinement matvecs, and the
host-LU fallback (:class:`lsafw_tpu.solver.eigen.ShiftInvertOperator`)
are all reused unchanged — one factorization pair per frequency, many
Lanczos applies, the same cost shape as a shift-invert eigensolve.

The adjoint operator is always built on the *assembled transposed*
CSR (not element matrices): the element-operator path imposes the
Dirichlet identity rows AFTER the per-cell products, a step that does
not commute with transposition, so per-cell transposes would not
reproduce ``A^T``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def w_weighted_gains(
    apply_T, W: sp.spmatrix, k: int, *, tol: float = 1e-8, dtype=np.complex128
):
    """Leading eigenpairs of the Hermitian PSD operator ``apply_T``
    generalized against SPD ``W`` (mass on the forcing subspace):
    gamma_j, F[:, j] descending.  Dense fallback on tiny subspaces
    (Lanczos is breakdown-prone there); ``k`` is clamped to the
    subspace size."""
    nf = W.shape[0]
    k = min(int(k), nf)
    T = spla.LinearOperator(
        (nf, nf), matvec=lambda fc: apply_T(np.asarray(fc, dtype)), dtype=dtype
    )
    if nf <= max(4 * k, 40):
        Td = T @ np.eye(nf, dtype=dtype)
        from scipy.linalg import eigh

        gam, F = eigh(Td, W.toarray())
    else:
        ncv = min(nf - 1, max(2 * k + 1, 20))
        gam, F = spla.eigsh(
            T, k=k, M=W.astype(dtype), which="LA", tol=tol, ncv=ncv
        )
    order = np.argsort(gam)[::-1][:k]  # ARPACK order is not guaranteed
    return gam[order], F[:, order]


@dataclass
class ResolventModes:
    """Result of one frequency: ``gains[j]`` is sigma_j (amplitude,
    not energy) with forcing/response modes as full-length mixed
    vectors, unit energy norm (f^H M f = q^H M q = 1)."""

    omega: float
    gains: np.ndarray  # (k,) descending
    forcings: np.ndarray  # (k, n) complex
    responses: np.ndarray  # (k, n) complex


class ResolventSolver:
    """Optimal-gain solver over the (A, M) eigensystem pair.

    Args:
        A, M: assembled eigensystem (real CSR; BC rows of A are
            identity, of M zero — as produced by
            ``LinearizedNavierStokesAssembler.assemble_eigensystem``).
        num_velocity_dofs: velocity block size ``nu`` (mixed layout is
            velocity [0, nu) then pressure — ``fem/spaces.py``).
        dirichlet_mask: (n,) bool — constrained DOFs (perturbation BCs).
        method: inner solve backend, ``"lu"`` (host SuperLU) or
            ``"banded"`` (device band LU + f64 refinement).  NOTE: the
            banded path holds TWO complex band factors (direct +
            adjoint) simultaneously; at production sizes set
            ``LSAFW_BAND_MEM_GB`` to about half the HBM so the
            per-factor budget leaves room for both (the band plan
            truncates to a preconditioner past the budget and the MR
            refinement absorbs it).
        elements: optional ``(dofs, A_el, M_el, bc_mask)`` for the
            matrix-free refinement matvecs of the *direct* operator.
    """

    def __init__(
        self,
        A: CSRMatrix,
        M: CSRMatrix,
        num_velocity_dofs: int,
        dirichlet_mask: np.ndarray,
        *,
        method: str = "lu",
        elements=None,
    ) -> None:
        self.A = A
        self.M = M
        self.method = method
        self._elements = elements
        self._n = A.shape[0]
        fmask = np.zeros(self._n, dtype=bool)
        fmask[:num_velocity_dofs] = True
        fmask &= ~np.asarray(dirichlet_mask, dtype=bool)
        self._fdofs = np.nonzero(fmask)[0]
        if self._fdofs.size == 0:
            raise ValueError("no free velocity DOFs to force")
        Ms = M.to_scipy().tocsr()
        self._Ms = Ms
        # forcing-subspace mass (SPD): the right-hand side of the gain EVP
        self._W = Ms[self._fdofs][:, self._fdofs].tocsc()
        from lsafw_tpu.ops.sparse import transpose_pair

        # shared transposed pattern: the adjoint factorization rides the
        # same device fast paths (C arithmetic, BCSR matvecs) as the
        # direct one
        self._At, self._Mt = transpose_pair(A, M)
        self._napply = 0

    # ------------------------------------------------------------------
    def _si_pair(self, sigma: complex):
        """(direct, adjoint) shift-invert operators for C = sigma M - A
        (harmonic forcing: sigma = i omega; pseudospectra: any z)."""
        from lsafw_tpu.solver.eigen import ShiftInvertOperator

        sigma = complex(sigma)
        si1 = ShiftInvertOperator(
            self.A, self.M, sigma, method=self.method, elements=self._elements
        )
        si2 = ShiftInvertOperator(
            self._At, self._Mt, np.conj(sigma), method=self.method, elements=None
        )
        return si1, si2

    def _apply_T(self, si1, si2, fc: np.ndarray) -> np.ndarray:
        """T fc over the forcing subspace (complex nf -> nf).

        T = P^T M C^-H M C^-1 M P; the two minus signs of the SI
        rewrites cancel: T fc = P^T M si2(si1(P fc))."""
        x = np.zeros(self._n, dtype=np.complex128)
        x[self._fdofs] = fc
        vr, vi = jnp.asarray(x.real), jnp.asarray(x.imag)
        qr, qi = si1.apply((vr, vi))
        dr, di = si2.apply((qr, qi))
        d = np.asarray(dr) + 1j * np.asarray(di)
        self._napply += 1
        return (self._Ms @ d)[self._fdofs]

    def _response(self, si1, f: np.ndarray) -> np.ndarray:
        """q = C^-1 M f = -si1(f) (full-length forcing vector)."""
        qr, qi = si1.apply((jnp.asarray(f.real), jnp.asarray(f.imag)))
        return -(np.asarray(qr) + 1j * np.asarray(qi))

    def _energy(self, v: np.ndarray) -> float:
        return float(np.real(np.vdot(v, self._Ms @ v)))

    # ------------------------------------------------------------------
    def solve(self, omega: float, k: int = 1, *, tol: float = 1e-8) -> ResolventModes:
        """Leading ``k`` gains and modes at frequency ``omega``
        (clamped to the forcing-subspace size)."""
        k = min(int(k), self._fdofs.size)
        si1, si2 = self._si_pair(1j * float(omega))
        self._napply = 0
        gam, F = w_weighted_gains(
            lambda fc: self._apply_T(si1, si2, fc), self._W, k, tol=tol
        )
        gains = np.sqrt(np.maximum(gam, 0.0))
        forcings = np.zeros((k, self._n), dtype=np.complex128)
        responses = np.zeros((k, self._n), dtype=np.complex128)
        for j in range(k):
            f = np.zeros(self._n, dtype=np.complex128)
            f[self._fdofs] = F[:, j]
            f /= np.sqrt(self._energy(f))  # unit forcing energy
            # _response applies M internally: q = C^-1 M f
            q = self._response(si1, f)
            eq = self._energy(q)
            if eq > 0:
                q /= np.sqrt(eq)
            forcings[j], responses[j] = f, q
        logger.info(
            "Resolvent omega=%.4f: gains %s (%d T applies)",
            omega, np.array2string(gains, precision=4), self._napply,
        )
        return ResolventModes(float(omega), gains, forcings, responses)

    def gain_curve(
        self, omegas, k: int = 1, *, tol: float = 1e-8
    ) -> list[ResolventModes]:
        """Gains over a frequency sweep (one factorization pair per
        omega; the reference's closest analog is the per-Re sigma sweep
        of ``.examples/eigenvalues.py``)."""
        return [self.solve(float(w), k=k, tol=tol) for w in omegas]

    # ------------------------------------------------------------------
    def resolvent_norm(self, z: complex, *, tol: float = 1e-6) -> float:
        """||R(z)||_E — the energy-norm resolvent norm at a COMPLEX
        point z (= sigma_1 of the forced problem at sigma = z): the
        quantity whose level sets are the epsilon-pseudospectrum
        boundaries (Trefethen & Embree).  Diverges as z approaches an
        eigenvalue of the pencil."""
        si1, si2 = self._si_pair(z)
        gam, _ = w_weighted_gains(
            lambda fc: self._apply_T(si1, si2, fc), self._W, 1, tol=tol
        )
        return float(np.sqrt(max(gam[0], 0.0)))

    def pseudospectrum(
        self, re_pts, im_pts, *, tol: float = 1e-6
    ) -> np.ndarray:
        """Grid of ||R(z)||_E over the complex plane: entry [i, j] is
        the resolvent norm at ``re_pts[j] + 1j * im_pts[i]`` (one
        factorization pair per grid point — embarrassingly sweepable).
        Contour at level 1/eps = boundary of the eps-pseudospectrum in
        the energy metric.  Non-normal pencils (this one: advection-
        dominated, non-self-adjoint) show pseudospectra protruding far
        beyond the eigenvalues — the quantitative link between the
        spectral picture and the transient-growth/resolvent analyses."""
        G = np.empty((len(im_pts), len(re_pts)))
        for i, b in enumerate(im_pts):
            for j, a in enumerate(re_pts):
                G[i, j] = self.resolvent_norm(complex(a, b), tol=tol)
            logger.info("pseudospectrum row %d/%d done", i + 1, len(im_pts))
        return G
