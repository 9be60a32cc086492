"""Krylov-Schur eigensolver with shift-invert spectral transform.

TPU-native replacement for SLEPc EPS (reached via ``iEpsSolver``,
``Solver/utils.py:190-328``; configured in ``Solver/eigen.py:48-155``)
and for the ARPACK shift-invert formulation of ``Solver/eigen2.py``
(whose explicit operator loop — y = (A - sigma M)^-1 M v per Arnoldi
step — is the spec this implements).

Architecture:
  * the Krylov basis lives on device as (re, im) pairs of (ncv+1, n)
    real arrays; orthogonalization is CGS2 expressed as dense basis
    matmuls (:mod:`lsafw_tpu.ops.cvec`) — MXU work;
  * the shift-invert inner solve is either a host complex LU
    factorization (the MUMPS role, one factorization + many solves) or
    a device-resident block-preconditioned GMRES on the equivalent
    2n real system (inexact shift-invert);
  * the (ncv x ncv) Hessenberg bookkeeping, sorted Schur restarts and
    Ritz extraction run on the host in complex128 — O(ncv^3) work on an
    80-dim matrix, negligible next to the n-dim device compute.

Eigenvalue back-transform: theta = 1/(lambda - sigma) so
lambda = sigma + 1/theta (``Solver/eigen2.py:210`` `_mu_to_lambda`).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from enum import Enum
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp

from typing import NamedTuple

from lsafw_tpu.ops.dots import ddot
from lsafw_tpu.ops.cvec import CVec, basis_combine, basis_project, basis_subtract
from lsafw_tpu.ops.sparse import CSRMatrix, spmv, spmv_pair
from lsafw_tpu.solver.band import BandedLU
from lsafw_tpu.solver.direct import SparseLU
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class EpsProblemType(Enum):
    """(parity: ``iEpsProblemType``, ``Solver/utils.py:27-63``)."""

    HEP = "hep"
    NHEP = "nhep"
    GHEP = "ghep"
    GNHEP = "gnhep"
    PGNHEP = "pgnhep"
    GHIEP = "ghiep"

    @property
    def is_generalized(self) -> bool:
        return self in (EpsProblemType.GHEP, EpsProblemType.GNHEP,
                        EpsProblemType.PGNHEP, EpsProblemType.GHIEP)


class STType(Enum):
    """Spectral transforms (parity: ``iSTType``, ``Solver/utils.py:131-149``).

    CAYLEY applies ``(A - sigma M)^-1 (A + nu M)`` (SLEPc's Cayley with
    antishift ``nu``, default ``nu = sigma``); it shares the
    shift-invert factorization and back-transforms via
    ``lambda = (sigma theta + nu) / (theta - 1)``.
    """

    SHIFT = "shift"
    SINVERT = "sinvert"
    CAYLEY = "cayley"
    # Preconditioned (inexact) shift-and-invert: same transform as
    # SINVERT but the inner solve is iterative-with-preconditioner by
    # construction (SLEPc's STPRECOND role).
    PRECOND = "precond"
    # Chebyshev polynomial filter (SLEPc's STFILTER role): amplifies an
    # extremal spectral window of a Hermitian operator without any
    # factorization; eigenvalues recovered by Rayleigh quotients.
    FILTER = "filter"
    # user-defined transform (SLEPc's STSHELL role): the caller
    # supplies the transformed apply and its eigenvalue back-transform
    # via EigenSolver.set_st_shell
    SHELL = "shell"


class EpsWhich(Enum):
    """(parity: ``iEpsWhich``, ``Solver/utils.py:152-188`` — including
    fixing its latent SMALLEST_MAGNITUDE bug, ``Solver/utils.py:157``)."""

    LARGEST_MAGNITUDE = "largest_magnitude"
    SMALLEST_MAGNITUDE = "smallest_magnitude"
    LARGEST_REAL = "largest_real"
    SMALLEST_REAL = "smallest_real"
    TARGET_MAGNITUDE = "target_magnitude"
    TARGET_REAL = "target_real"


@dataclass
class EigensolverConfig:
    """(parity: ``EigensolverConfig``, ``Solver/eigen.py:48-62``)."""

    num_eig: int = 5
    problem_type: EpsProblemType = EpsProblemType.GNHEP
    atol: float = 1e-8
    max_it: int = 500
    ncv: int = 80


# ---------------------------------------------------------------------------
# Shift-invert operator
# ---------------------------------------------------------------------------


class BandedSIOp(NamedTuple):
    """Device-resident shift-invert operator state (a pytree): pass it
    through jit so the fused Arnoldi expansion traces the full apply.

    ``Cop``/``Mop`` (matrix-free element operators, ~6x fewer gathered
    elements than ELL SpMV on this TPU) are used when available;
    otherwise C and M apply through the assembled CSR pair.
    """

    A: CSRMatrix
    M: CSRMatrix | None
    blu: BandedLU
    sig_re: jnp.ndarray
    sig_im: jnp.ndarray
    Cop: object | None = None  # CElementOperator
    Mop: object | None = None  # ElementOperator (bc_diag = 0)
    # Cayley antishift (None -> plain shift-invert RHS M v)
    nu_re: jnp.ndarray | None = None
    nu_im: jnp.ndarray | None = None


def _si_apply_C(op: BandedSIOp, xr, xi):
    """(A - sigma M) x over a pair.  When the fast C apply lives inside
    a TwoGridSIPC ``blu`` (multiplicative composition), reuse it instead
    of duplicating the multi-GB value blocks as a second pytree leaf
    (XLA buffer assignment counts repeated leaves twice)."""
    Cop = op.Cop if op.Cop is not None else getattr(op.blu, "Cop", None)
    if Cop is not None:
        return Cop.matvec_pair(xr, xi)
    Ar, Ai = spmv_pair(op.A, xr, xi)
    if op.M is not None:
        Mr, Mi = spmv_pair(op.M, xr, xi)
    else:
        Mr, Mi = xr, xi
    return (
        Ar - (op.sig_re * Mr - op.sig_im * Mi),
        Ai - (op.sig_re * Mi + op.sig_im * Mr),
    )


def _si_apply_M(op: BandedSIOp, xr, xi):
    if op.Mop is not None:
        return op.Mop.matvec_pair(xr, xi)
    if op.Cop is not None and hasattr(op.Cop, "mass_pair"):
        # BCSRShiftedOp stores (A, M) blocks; M x reuses the same
        # storage.  Passing a mass VIEW as a separate Mop pytree leaf
        # duplicated the multi-GB value blocks in every jitted program's
        # parameter list — XLA buffer assignment counts the alias twice
        # (measured: 17.06 GB > 15.75 GB HBM at 175k DOFs).
        return op.Cop.mass_pair(xr, xi)
    if op.M is not None:
        return spmv_pair(op.M, xr, xi)
    return xr, xi


def _si_rhs(op: BandedSIOp, xr, xi):
    """RHS of the transformed apply: ``M v`` (shift-invert) or
    ``A v + nu M v = C v + (sigma + nu) M v`` (Cayley — reuses the C
    apply so the matrix-free element-operator path works unchanged)."""
    Mr, Mi = _si_apply_M(op, xr, xi)
    if op.nu_re is None:
        return Mr, Mi
    Cr, Ci = _si_apply_C(op, xr, xi)
    ar = op.sig_re + op.nu_re
    ai = op.sig_im + op.nu_im
    return (
        Cr + (ar * Mr - ai * Mi),
        Ci + (ar * Mi + ai * Mr),
    )


def banded_si_apply(
    op: BandedSIOp, v: CVec, *, tol: float = 1e-9, max_its: int = 16
) -> CVec:
    """y ~= (A - sigma M)^-1 (M v): f32 banded solve + f64 iterative
    refinement to a relative residual of ``tol`` (mixed-precision
    direct-iterative — the TPU-native form of the reference's
    one-factorization-many-solves shift-invert,
    ``Solver/eigen2.py:104-201``).  Fully traceable: usable inside the
    fused per-restart Arnoldi program."""
    br, bi = _si_rhs(op, v[0], v[1])
    return banded_solve_raw(op, (br, bi), tol=tol, max_its=max_its)


def banded_solve_raw(
    op: BandedSIOp, b: CVec, *, tol: float = 1e-9, max_its: int = 16,
    m: int = 8, proj=None, x0_zero: bool = False,
    apply_fn=None, pc_fn=None,
) -> CVec:
    """x ~= (A - sigma M)^-1 b for a RAW right-hand side (no M
    premultiply): the refinement core of :func:`banded_si_apply`,
    needed on its own by the non-modal analyses (adjoint propagator
    steps in :mod:`lsafw_tpu.transient`).

    Truncated complex GCR(m): each correction's image is
    orthogonalized against the last ``m`` kept images, so the residual
    is minimized over a Krylov window instead of a single direction —
    the budget-TRUNCATED band PCs at 500k+ DOFs contract too slowly
    for one-direction minimal residual (same upgrade as
    ``newton._banded_mr``).

    ``proj``: optional ``(vr, vi, Mvr, Mvi)`` (M-normalized) — solve
    the Jacobi-Davidson PROJECTED system (I - Mv v^H) C (I - v v^H M)
    with iterates kept M-orthogonal to v (search directions are
    right-projected after the band PC, images left-projected).  Needed
    by :func:`nested_eigenpair`: without the projection an exact solve
    of C t = r returns t = v exactly and the correction annihilates."""
    br, bi = b

    if proj is not None:
        pvr, pvi, pMr, pMi = proj

        def _pright(dr, di):
            # d -= v (v^H M d);  v^H M d = (M v)^H d for symmetric M
            c_re = ddot(pMr, dr) + ddot(pMi, di)
            c_im = ddot(pMr, di) - ddot(pMi, dr)
            return dr - (c_re * pvr - c_im * pvi), \
                di - (c_re * pvi + c_im * pvr)

        def _pleft(wr, wi):
            # w -= Mv (v^H w)
            c_re = ddot(pvr, wr) + ddot(pvi, wi)
            c_im = ddot(pvr, wi) - ddot(pvi, wr)
            return wr - (c_re * pMr - c_im * pMi), \
                wi - (c_re * pMi + c_im * pMr)
    else:
        def _pright(dr, di):
            return dr, di

        def _pleft(wr, wi):
            return wr, wi

    # pluggable operator/PC (``apply_fn``/``pc_fn``): lets callers run
    # this GCR on operators that are never materialized — e.g. the
    # Galerkin coarse apply P^T C_f P of TwoGridSIPC (a BCSR of the
    # Galerkin pattern planned at 1.2% fill / 6.6 GB; the sandwich
    # through the existing fine blocks costs nothing)
    applyC = apply_fn if apply_fn is not None else (
        lambda ar, ai: _si_apply_C(op, ar, ai))
    pcsolve = pc_fn if pc_fn is not None else (
        lambda ar, ai: op.blu.solve_pair(ar, ai))

    bnorm = jnp.sqrt(ddot(br, br) + ddot(bi, bi))
    floor = jnp.maximum(bnorm, 1e-300)
    if x0_zero:
        # JD correction solves: a WEAK PC's first apply can have
        # ||C x0 - b|| > ||b||, and GCR (monotone only from its own
        # start) then never gets back under ||b|| within the window —
        # start from zero so every iterate beats the zero correction
        xr = jnp.zeros_like(br)
        xi = jnp.zeros_like(bi)
        rr, ri = br, bi
    else:
        xr, xi = _pright(*pcsolve(br, bi))
        Cr, Ci = _pleft(*applyC(xr, xi))
        rr, ri = br - Cr, bi - Ci
    n = br.shape[0]
    Dr = jnp.zeros((m, n))
    Di = jnp.zeros((m, n))
    CDr = jnp.zeros((m, n))
    CDi = jnp.zeros((m, n))

    def cond(st):
        _, _, rr, ri, *_, k = st
        rn = jnp.sqrt(ddot(rr, rr) + ddot(ri, ri))
        return jnp.isfinite(rn) & (rn > tol * floor) & (k < max_its)

    def body(st):
        xr, xi, rr, ri, Dr, Di, CDr, CDi, k = st
        dr, di = _pright(*pcsolve(rr, ri))
        Cdr, Cdi = _pleft(*applyC(dr, di))
        # complex CGS against the kept (orthonormal) images
        b_re = CDr @ Cdr + CDi @ Cdi
        b_im = CDr @ Cdi - CDi @ Cdr
        Cdr = Cdr - (CDr.T @ b_re - CDi.T @ b_im)
        Cdi = Cdi - (CDr.T @ b_im + CDi.T @ b_re)
        dr = dr - (Dr.T @ b_re - Di.T @ b_im)
        di = di - (Dr.T @ b_im + Di.T @ b_re)
        nrm = jnp.maximum(jnp.sqrt(ddot(Cdr, Cdr) + ddot(Cdi, Cdi)), 1e-300)
        dr, di, Cdr, Cdi = dr / nrm, di / nrm, Cdr / nrm, Cdi / nrm
        # alpha = <Cd, r> (images orthonormal)
        ar = ddot(Cdr, rr) + ddot(Cdi, ri)
        ai = ddot(Cdr, ri) - ddot(Cdi, rr)
        xr = xr + (ar * dr - ai * di)
        xi = xi + (ar * di + ai * dr)
        rr = rr - (ar * Cdr - ai * Cdi)
        ri = ri - (ar * Cdi + ai * Cdr)
        slot = jnp.mod(k, m)
        Dr = jax.lax.dynamic_update_index_in_dim(Dr, dr, slot, 0)
        Di = jax.lax.dynamic_update_index_in_dim(Di, di, slot, 0)
        CDr = jax.lax.dynamic_update_index_in_dim(CDr, Cdr, slot, 0)
        CDi = jax.lax.dynamic_update_index_in_dim(CDi, Cdi, slot, 0)
        return xr, xi, rr, ri, Dr, Di, CDr, CDi, k + 1

    xr, xi, *_ = jax.lax.while_loop(
        cond, body, (xr, xi, rr, ri, Dr, Di, CDr, CDi, jnp.int32(0)))
    return xr, xi


@jax.tree_util.register_pytree_node_class
@dataclass
class TwoGridSIPC:
    """Additive two-grid preconditioner for shift-invert inner solves
    past the exact-factor memory wall (500k+ DOFs):

        z = fine_blu^{-1} r  +  P C_coarse^{-1} R r

    The budget-TRUNCATED fine band smooths the high-frequency error it
    still resolves; the COARSE-mesh shift-invert (exact device band at
    ~175k + its own GCR refinement) corrects the smooth components the
    truncation destroys — the two failure modes are complementary
    (measured: the B=8/30 truncated band alone has contraction 1.12 at
    500k and every inner solve stalls at ~1e-2).  ``P`` is the
    barycentric mixed-state prolongation in padded ELL form over FINE
    rows (``solver.baseflow.interpolation_matrix``); the restriction is
    P^T applied as a scatter-add through the SAME narrow ELL — storing
    P^T row-wise is (nc, ~600)-wide on production meshes and its gather
    temporaries alone OOM'd the 500k correction program.

    Duck-typed as a ``blu``: ``BandedSIOp(blu=TwoGridSIPC(...))`` slots
    into :func:`banded_solve_raw` / :func:`nested_eigenpair` unchanged.
    """

    coarse_op: object  # BandedSIOp at the coarse mesh (exact band)
    fine_blu: object  # fine smoother: truncated BandedLU / DiagSIPC / None
    P_data: jnp.ndarray  # (nf, wp) f64
    P_cols: jnp.ndarray  # (nf, wp) int32 -> coarse indices
    Cop: object | None = None  # fine C apply -> MULTIPLICATIVE composition
    cproj: tuple | None = None  # (xr, xi, Mxr, Mxi) coarse eigvec deflation
    sig0_re: jnp.ndarray | None = None  # FIXED shift of the coarse solve
    sig0_im: jnp.ndarray | None = None
    nc: int = 0  # coarse dimension (static)
    coarse_tol: float = 1e-6
    coarse_its: int = 20
    smooth_steps: int = 1
    omega: float = 1.0

    def tree_flatten(self):
        return (
            (self.coarse_op, self.fine_blu, self.P_data, self.P_cols,
             self.Cop, self.cproj, self.sig0_re, self.sig0_im),
            (self.nc, self.coarse_tol, self.coarse_its, self.smooth_steps,
             self.omega),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @staticmethod
    def coarse_deflation(x_c, M_c):
        """Build the ``cproj`` tuple from the coarse eigenvector and
        coarse mass matrix: the coarse solve runs DEFLATED against its
        own eigenpair.  C_c is factored ~|sigma - lambda_c| from its
        eigenvalue, so an undeflated solve amplifies the x_c direction
        by 1/|sigma - lambda_c| (~165x on the 500k flagship) — and what
        that amplifies is the INTERPOLATION ERROR of P x_c, junk the JD
        projection cannot remove (measured: corrections rejected even
        at damp 1/64).  With x_c deflated the coarse correction returns
        the smooth non-eigen components the truncated fine term cannot
        represent, which is its actual job."""
        x_c = np.asarray(x_c, dtype=np.complex128)
        Mx = M_c.to_scipy() @ x_c
        nrm = np.sqrt(max(np.real(np.vdot(x_c, Mx)), 1e-300))
        x_c, Mx = x_c / nrm, Mx / nrm
        return (jnp.asarray(np.ascontiguousarray(x_c.real)),
                jnp.asarray(np.ascontiguousarray(x_c.imag)),
                jnp.asarray(np.ascontiguousarray(Mx.real)),
                jnp.asarray(np.ascontiguousarray(Mx.imag)))

    def _restrict(self, v):
        contrib = (self.P_data * v[:, None]).reshape(-1)
        return jnp.zeros(self.nc, v.dtype).at[
            self.P_cols.reshape(-1)].add(contrib)

    def _prolong(self, v):
        return (self.P_data * v[self.P_cols]).sum(1)

    def _coarse_apply(self, zr, zi):
        """G z = P^T (C_f (P z)) — the Galerkin coarse operator applied
        as a sandwich through the FINE value blocks.  Materializing G
        as BCSR planned at 1.2% fill (832M stored blocks, 6.6 GB at the
        175k PC grid); the sandwich reuses ``self.Cop`` for free and
        inherits its traced shift."""
        import dataclasses

        Cop = self.Cop
        if self.sig0_re is not None and hasattr(Cop, "sig_re"):
            # the coarse solve must stay at the FIXED factor shift: the
            # outer retargets Cop to theta, and as theta converges to
            # lambda the Galerkin system G(theta) becomes arbitrarily
            # singular (lambda_G tracks lambda_f to interpolation error)
            Cop = dataclasses.replace(
                Cop, sig_re=self.sig0_re, sig_im=self.sig0_im)
        Cr, Ci = Cop.matvec_pair(self._prolong(zr), self._prolong(zi))
        return self._restrict(Cr), self._restrict(Ci)

    def solve_pair(self, br, bi):
        rc_r = self._restrict(br)
        rc_i = self._restrict(bi)
        if self.coarse_op is not None and hasattr(self.coarse_op, "blu"):
            zc_r, zc_i = banded_solve_raw(
                self.coarse_op, (rc_r, rc_i),
                tol=self.coarse_tol, max_its=self.coarse_its,
                proj=self.cproj)
        else:
            # ``coarse_op`` is a bare band factor (the Galerkin-data
            # band): GCR on the sandwich apply preconditioned by it
            zc_r, zc_i = banded_solve_raw(
                None, (rc_r, rc_i),
                tol=self.coarse_tol, max_its=self.coarse_its,
                proj=self.cproj, apply_fn=self._coarse_apply,
                pc_fn=self.coarse_op.solve_pair)
        z_r = self._prolong(zc_r)
        z_i = self._prolong(zc_i)
        if self.fine_blu is None:
            return z_r, z_i
        if self.Cop is None:
            # additive: coarse + fine terms fight over the components
            # both resolve (kept for PC-only fine terms w/o a C apply)
            f_r, f_i = self.fine_blu.solve_pair(br, bi)
            return z_r + f_r, z_i + f_i
        # multiplicative: smooth the POST-COARSE residual — the fine
        # term only ever sees what the coarse correction left behind
        # (measured on the 500k NS shift: additive corrections were
        # rejected even at damp 1/16 with ~3%/outer contraction).
        # ``Cop`` lives INSIDE this pytree so the caller's BandedSIOp
        # must NOT duplicate it (XLA buffer assignment double-counts
        # repeated multi-GB leaves); _si_apply_C falls back to blu.Cop.
        for _ in range(self.smooth_steps):
            Cz_r, Cz_i = self.Cop.matvec_pair(z_r, z_i)
            s_r, s_i = self.fine_blu.solve_pair(br - Cz_r, bi - Cz_i)
            z_r = z_r + self.omega * s_r
            z_i = z_i + self.omega * s_i
        return z_r, z_i


@jax.tree_util.register_pytree_node_class
@dataclass
class DiagSIPC:
    """Regularized complex Jacobi of C = A - sigma M: a MEMORY-FREE
    fine-grid term for :class:`TwoGridSIPC` when even a truncated band
    does not fit next to the coarse factor (500k+: the B=2-of-30 band
    cost 2.8 GB for 256 of 3768 bandwidth).  A pure coarse-grid PC is
    structurally unable to converge (GCR search directions stay in
    range(P)); Jacobi spans the full space and roughly scales the
    high-frequency rows, which is all the additive fine term needs at
    eta-grade inner tolerances."""

    inv_re: jnp.ndarray
    inv_im: jnp.ndarray

    def tree_flatten(self):
        return ((self.inv_re, self.inv_im), ())

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @classmethod
    def from_pair(cls, A, M, sigma: complex, *,
                  press_reg: float = 1.0) -> "DiagSIPC":
        """``press_reg``: regularized magnitude (in units of the RMS
        diagonal) substituted on zero-diagonal saddle rows.  The band
        factor uses 1e-3 (elimination only needs a nonzero pivot), but
        as a JACOBI inverse that would AMPLIFY pressure residuals ~1e3x
        relative to the typical row — and the NS mass matrix has a ZERO
        pressure block, so neither the M-normalization nor the JD
        projection of :func:`nested_eigenpair` can see (or control) the
        injected pressure junk.  O(1) keeps pressure residuals on the
        same footing as velocity rows (measured: the 1e-3 default sent
        the 500k two-grid correction to rel ~1.0 in one step)."""
        ds = A.pattern.diag_slots
        dre = A.data[ds] - sigma.real * M.data[ds]
        dim_ = (-sigma.imag) * M.data[ds]
        mag2 = dre * dre + dim_ * dim_
        scale = jnp.sqrt(jnp.maximum(jnp.mean(mag2), 1e-300))
        # saddle rows (zero pressure diagonal): bounded inverse
        bad = mag2 < (1e-10 * scale) ** 2
        dre = jnp.where(bad, -press_reg * scale, dre)
        mag2 = jnp.where(bad, (press_reg * scale) ** 2, mag2)
        return cls(dre / mag2, -dim_ / mag2)

    def solve_pair(self, br, bi):
        return (self.inv_re * br - self.inv_im * bi,
                self.inv_re * bi + self.inv_im * br)


def ell_of_csr(S):
    """Padded-ELL (data, cols) of a scipy CSR (helper for the P/R
    operators of :class:`TwoGridSIPC`)."""
    S = S.tocsr()
    S.sort_indices()
    n = S.shape[0]
    cnt = np.diff(S.indptr)
    w = max(1, int(cnt.max()) if cnt.size else 1)
    r = np.repeat(np.arange(n, dtype=np.int64), cnt)
    p = np.arange(S.nnz, dtype=np.int64) - np.repeat(
        S.indptr[:-1].astype(np.int64), cnt)
    cols = np.zeros((n, w), np.int32)
    dat = np.zeros((n, w))
    cols[r, p] = S.indices
    dat[r, p] = S.data
    return jnp.asarray(dat), jnp.asarray(cols)


def galerkin_pair(P, A, M):
    """Galerkin coarse pair ``(P^T A P, P^T M P)`` as CSRMatrices on
    ONE shared (union) pattern — the coarse operator of the two-grid
    shift-invert (its near-null direction under the shift is the
    prolonged fine eigendirection; the re-assembled coarse operator's
    is discretization noise — ``scripts/dev_tg_repro.py``).  scipy
    spgemm prunes explicit zeros, so the two products are merged onto
    their union pattern by key search."""
    import scipy.sparse as sp

    P = P.tocsr()
    Ag = (P.T @ (A.to_scipy() @ P)).tocsr()
    Mg = (P.T @ (M.to_scipy() @ P)).tocsr()
    # always include the diagonal: band/BCSR planning and the saddle
    # regularization key on diag slots, and spgemm pruning can drop a
    # structurally-zero diagonal (e.g. pressure rows)
    U = (Ag + Mg + sp.identity(Ag.shape[0], format="csr")).tocsr()
    U.sort_indices()
    n, ncol = U.shape
    rowsU = np.repeat(np.arange(n, dtype=np.int64), np.diff(U.indptr))
    keyU = rowsU * ncol + U.indices

    def put(S):
        S = S.tocsr()
        S.sort_indices()
        rowsS = np.repeat(np.arange(n, dtype=np.int64), np.diff(S.indptr))
        pos = np.searchsorted(keyU, rowsS * ncol + S.indices)
        out = np.zeros(U.nnz)
        out[pos] = S.data
        return out

    Au = sp.csr_matrix((put(Ag), U.indices.copy(), U.indptr.copy()),
                       shape=U.shape)
    A_g = CSRMatrix.from_scipy(Au)
    M_g = CSRMatrix(A_g.pattern, jnp.asarray(put(Mg)))
    return A_g, M_g


def _with_sigma(op: BandedSIOp, sr, si):
    """Retarget the SI operator at a (traced) new shift.  Element-based
    C operators bake sigma into their values and CANNOT be retargeted —
    drop them so ``_si_apply_C`` falls back to the CSR pair (which
    applies the traced ``sig_re/sig_im``)."""
    import dataclasses

    Cop = op.Cop
    if Cop is not None:
        if hasattr(Cop, "sig_re"):
            Cop = dataclasses.replace(Cop, sig_re=sr, sig_im=si)
        else:
            Cop = None
    blu = op.blu
    if (Cop is None and getattr(blu, "Cop", None) is not None
            and hasattr(blu.Cop, "sig_re")):
        # multiplicative TwoGridSIPC: the single shared C apply lives
        # inside the PC — retarget it IN PLACE in the tree (promoting a
        # retargeted copy to op.Cop would put the multi-GB value blocks
        # in the program parameters twice)
        blu = dataclasses.replace(
            blu, Cop=dataclasses.replace(blu.Cop, sig_re=sr, sig_im=si))
    return op._replace(sig_re=sr, sig_im=si, Cop=Cop, blu=blu)


@jax.jit
def _nested_prepare(op: BandedSIOp, vr, vi, th_re, th_im):
    """Normalize, Rayleigh-update, and form the residual (the small
    program of one nested step; the correction solve is a SEPARATE jit
    — one monolithic step program hard-crashed the TPU worker at 500k,
    the same large-program class the non-fused Arnoldi policy avoids)."""
    # M-normalize
    Mvr, Mvi = _si_apply_M(op, vr, vi)
    nrm = jnp.sqrt(jnp.maximum(ddot(vr, Mvr) + ddot(vi, Mvi), 1e-300))
    vr, vi, Mvr, Mvi = vr / nrm, vi / nrm, Mvr / nrm, Mvi / nrm
    # residual at the incoming theta
    opt = _with_sigma(op, th_re, th_im)
    rr, ri = _si_apply_C(opt, vr, vi)  # (A - theta M) v
    rnorm0 = jnp.sqrt(ddot(rr, rr) + ddot(ri, ri))
    scale0 = jnp.sqrt(
        rnorm0**2
        + (th_re**2 + th_im**2) * (ddot(Mvr, Mvr) + ddot(Mvi, Mvi)))
    rel0 = rnorm0 / jnp.maximum(scale0, 1e-300)
    # Rayleigh update GATED on a small residual: a rough guess's
    # high-mode noise dominates v^H A v (measured: 5% l2 noise sent the
    # membrane quotient 19.7 -> 2935), so until the correction steps
    # have smoothed v the caller's sigma0 is the better shift
    upd = (rel0 < 0.1).astype(jnp.float64)
    dre = upd * (ddot(vr, rr) + ddot(vi, ri))
    dim_ = upd * (ddot(vr, ri) - ddot(vi, rr))
    th_re, th_im = th_re + dre, th_im + dim_
    rr = rr - (dre * Mvr - dim_ * Mvi)
    ri = ri - (dre * Mvi + dim_ * Mvr)
    rnorm = jnp.sqrt(ddot(rr, rr) + ddot(ri, ri))
    # scale: ||A v|| ~ sqrt(||r||^2 + |theta|^2 ||M v||^2)
    scale = jnp.sqrt(
        rnorm**2 + (th_re**2 + th_im**2) * (ddot(Mvr, Mvr) + ddot(Mvi, Mvi)))
    rel = rnorm / jnp.maximum(scale, 1e-300)
    return vr, vi, Mvr, Mvi, rr, ri, th_re, th_im, rel


@partial(jax.jit, static_argnames=("inner_tol", "inner_its", "m"))
def _nested_correct(op: BandedSIOp, vr, vi, Mvr, Mvi, rr, ri,
                    th_re, th_im, *, inner_tol: float, inner_its: int,
                    m: int):
    """Jacobi-Davidson correction: solve the PROJECTED system against
    the SHRINKING residual (this is what makes eta-grade inner solves
    converge geometrically — and without the projection an exact solve
    returns t = v and the correction annihilates).  Returns the raw
    correction t; the caller owns the (possibly damped) update v - t."""
    opt = _with_sigma(op, th_re, th_im)
    tr, ti = banded_solve_raw(
        opt, (rr, ri), tol=inner_tol, max_its=inner_its, m=m,
        proj=(vr, vi, Mvr, Mvi), x0_zero=True)
    # diagnostic: the achieved linear (projected) residual — the
    # correction's quality is invisible without it (an eta-grade outer
    # contraction REQUIRES roughly eta-grade inner solves)
    Cr, Ci = _si_apply_C(opt, tr, ti)
    c_re = ddot(vr, Cr) + ddot(vi, Ci)
    c_im = ddot(vr, Ci) - ddot(vi, Cr)
    Cr = Cr - (c_re * Mvr - c_im * Mvi)
    Ci = Ci - (c_re * Mvi + c_im * Mvr)
    lin = jnp.sqrt(ddot(rr - Cr, rr - Cr) + ddot(ri - Ci, ri - Ci))
    lin = lin / jnp.maximum(jnp.sqrt(ddot(rr, rr) + ddot(ri, ri)), 1e-300)
    tnorm = jnp.sqrt(ddot(tr, tr) + ddot(ti, ti))
    return tr, ti, lin, tnorm


def nested_eigenpair(
    op: BandedSIOp,
    v0: np.ndarray,
    sigma0: complex,
    *,
    tol: float = 1e-8,
    max_outer: int = 20,
    inner_tol: float = 1e-3,
    inner_its: int = 300,
    m: int = 8,
    bc_mask: np.ndarray | None = None,
    resid_op: BandedSIOp | None = None,
):
    """Refine an eigenpair GUESS (typically interpolated from a coarser
    mesh) to solver grade with INEXACT correction solves — the
    production eigen path past the exact-factor memory wall (500k+
    DOFs, where the complex band truncates too hard for shift-invert
    Arnoldi).

    The guess must satisfy the homogeneous Dirichlet rows (where C has
    identity rows and M near-zero ones, any boundary component creates
    a spurious Rayleigh quotient); pass ``bc_mask`` to zero them
    defensively.

    Each outer step updates the Rayleigh quotient, forms the residual
    r = (A - theta M) v, and solves the correction equation
    C(theta) t = r through :func:`banded_solve_raw` (truncated-band GCR
    preconditioner factored ONCE at ``sigma0``, operator applied at the
    traced theta).  Because the solve targets the shrinking residual,
    an eta-grade inner solve contracts the eigen residual by ~eta per
    step: eta = 1e-3 reaches 1e-10 from an interpolation-grade guess in
    ~3-4 steps.  Nested-mesh analog of the reference's
    ``EPS.setInitialSpace`` warm starts (``Solver/eigen.py``), extended
    to WORK where no exact fine factor exists.

    ``resid_op``: optional f64-grade operator for the once-per-outer
    residual/Rayleigh evaluation (``_nested_prepare``) when ``op``
    carries memory-reduced f32-grade matvecs (hi-only BCSR at 500k+:
    eta-grade correction solves tolerate 1e-7 applies, the FINAL
    residual does not).

    Returns ``(theta, v, rel_residual, n_outer)`` with ``v`` complex.
    """
    rop = op if resid_op is None else resid_op
    v0 = np.asarray(v0, dtype=np.complex128)
    if bc_mask is not None:
        v0 = np.where(np.asarray(bc_mask), 0.0, v0)
    vr = jnp.asarray(np.ascontiguousarray(v0.real))
    vi = jnp.asarray(np.ascontiguousarray(v0.imag))
    th_re = jnp.asarray(float(np.real(sigma0)))
    th_im = jnp.asarray(float(np.imag(sigma0)))
    prep = _nested_prepare(rop, vr, vi, th_re, th_im)
    rel = float(prep[-1])
    if not np.isfinite(rel):
        raise FloatingPointError("nested refinement diverged")
    it = 0
    for it in range(1, max_outer + 1):
        vr, vi, Mvr, Mvi, rr, ri, th_re, th_im, _ = prep
        logger.info("nested_eigenpair: outer %d rel resid %.2e theta %.6f%+.6fj",
                    it, rel, float(th_re), float(th_im))
        if rel < tol:
            break
        tr, ti, lin, tnorm = _nested_correct(
            op, vr, vi, Mvr, Mvi, rr, ri, th_re, th_im,
            inner_tol=inner_tol, inner_its=inner_its, m=m)
        logger.info(
            "nested_eigenpair: inner solve rel %.2e, |t| %.2e",
            float(lin), float(tnorm))
        # damped acceptance: an ill-conditioned correction solve (weak
        # PC near the shift) can return a t that CORRUPTS v — e.g. the
        # 500k saddle-point run where pressure junk (invisible to the
        # M-norm and the JD projection) pinned the residual at ~1.
        # Accept the largest damp in {1, 1/4, 1/16, 1/64} that reduces
        # the true residual; if none does, keep the best iterate and
        # stop instead of wandering.
        damp, accepted = 1.0, False
        for _ in range(4):
            cand = _nested_prepare(rop, vr - damp * tr, vi - damp * ti,
                                   th_re, th_im)
            rel_c = float(cand[-1])
            if np.isfinite(rel_c) and rel_c < rel:
                prep, rel, accepted = cand, rel_c, True
                break
            logger.info(
                "nested_eigenpair: correction rejected at damp %.3g "
                "(rel %.2e -> %.2e)", damp, rel, rel_c)
            damp *= 0.25
        if not accepted:
            logger.warning(
                "nested_eigenpair: no damp improved the residual at outer "
                "%d (rel %.2e); stopping with the best iterate", it, rel)
            break
    else:
        vr, vi, *_, th_re, th_im, _ = prep
    v = np.asarray(vr) + 1j * np.asarray(vi)
    v /= np.linalg.norm(v)
    return complex(float(th_re), float(th_im)), v, rel, it


class ShiftInvertOperator:
    """y = (A - sigma M)^-1 (M v) with real A, M and complex sigma.

    ``method="lu"``: one host complex SuperLU factorization, many
    triangular solves (the reference's ST-KSP PREONLY + LU,
    ``Solver/eigen2.py:104-162``).
    ``method="banded"``: device-resident f32 blocked band LU
    (:mod:`lsafw_tpu.solver.band`) + f64 iterative refinement — the
    TPU-native direct path; supports the fused per-restart Arnoldi.
    ``method="gmres"``: device-resident inexact inner solve on the
    equivalent real 2n system [[C, S], [-S, C]], C = A - Re(sigma) M,
    S = Im(sigma) M, with block-Jacobi preconditioning.
    """

    def __init__(
        self,
        A: CSRMatrix,
        M: CSRMatrix | None,
        sigma: complex,
        *,
        method: str = "lu",
        inner_tol: float = 1e-10,
        inner_maxiter: int = 2000,
        elements=None,
        antishift: complex | None = None,
        skip_calibration: bool = False,
    ) -> None:
        """``elements``: optional ``(ctx, A_el, M_el, bc_mask)`` — the
        per-cell element matrices of (A, M); enables the matrix-free
        refinement matvecs in the banded method.  ``antishift``: when
        given, apply the Cayley transform (A - sigma M)^-1 (A + nu M)
        instead of plain shift-invert (same factorization)."""
        self.A = A
        self.M = M
        self.sigma = complex(sigma)
        self.antishift = complex(antishift) if antishift is not None else None
        self.method = method
        self._n = A.shape[0]
        self._elements = elements
        if method == "lu":
            As = A.to_scipy().astype(np.complex128)
            if M is not None:
                Ms = M.to_scipy()
                C = (As - self.sigma * Ms).tocsc()
            else:
                C = (As - self.sigma * sp.identity(self._n, format="csc")).tocsc()
            self._lu = SparseLU(C)
        elif method == "banded":
            blu = self._factor_banded(inner_tol)
            Cop = Mop = self._bcsr_plan = None
            mv_kind = os.environ.get("LSAFW_SI_MATVEC", "bcsr")
            if mv_kind == "bcsr":
                band_bytes = int(sum(
                    l.nbytes for l in jax.tree_util.tree_leaves(blu)
                    if hasattr(l, "nbytes")))
                Cop, Mop = self._build_bcsr_ops(band_bytes)
            if Cop is None and self._elements is not None:
                from lsafw_tpu.ops.elementop import CElementOperator, ElementOperator

                dofs, A_el, M_el, bc_mask = self._elements
                Cop = CElementOperator(
                    El_re=A_el - self.sigma.real * M_el,
                    El_im=(-self.sigma.imag) * M_el,
                    cell_dofs=dofs,
                    n=self._n,
                    bc_mask=jnp.asarray(bc_mask),
                    bc_diag_re=1.0, bc_diag_im=0.0,
                )
                Mop = ElementOperator(
                    Ael=M_el, cell_dofs=dofs, n=self._n,
                    bc_mask=jnp.asarray(bc_mask), bc_diag=0.0,
                )
            nu_re = nu_im = None
            if self.antishift is not None:
                nu_re = jnp.asarray(self.antishift.real)
                nu_im = jnp.asarray(self.antishift.imag)
            self.device_op = BandedSIOp(
                A, M, blu,
                jnp.asarray(self.sigma.real), jnp.asarray(self.sigma.imag),
                Cop, Mop, nu_re, nu_im,
            )
            if skip_calibration:
                # nested_eigenpair drives the op with eta-grade inner
                # solves and does NOT need the rho gate (which would
                # degrade heavily-truncated 500k+ bands to host LU)
                self._inner_tol = inner_tol
                self.refine_its = 300
                return
            # calibrate refinement depth from the measured contraction
            # (jitted: the eager op chain allocates intermediates one at
            # a time with far worse peak behavior next to multi-GB
            # operators — observed RESOURCE_EXHAUSTED at 175k)
            rng = np.random.default_rng(11)
            b0 = rng.standard_normal(self._n)
            b0 /= np.linalg.norm(b0)

            @jax.jit
            def _calibrate(op, br, bi):
                xr, xi = op.blu.solve_pair(br, bi)
                Cr, Ci = _si_apply_C(op, xr, xi)
                rr, ri = br - Cr, bi - Ci
                return jnp.sqrt(ddot(rr, rr) + ddot(ri, ri))

            rho = float(_calibrate(
                self.device_op, jnp.asarray(b0), jnp.zeros(self._n)))
            if not np.isfinite(rho):
                # pivot-free f32 factor overflowed on this operator:
                # degrade to the host LU (the reference's
                # MUMPS -> SuperLU degradation chain)
                logger.warning(
                    "Banded factor is not usable (non-finite calibration); "
                    "falling back to host complex LU."
                )
                self.method = "lu"
                self.device_op = None  # keep krylov_schur off the fused path
                As = A.to_scipy().astype(np.complex128)
                Ms = M.to_scipy() if M is not None else sp.identity(self._n)
                self._lu = SparseLU((As - self.sigma * Ms).tocsc())
                return
            # The refinement loop exits early once the residual meets
            # inner_tol; max_its is a safety cap.  Size the cap from the
            # measured contraction (MR refinement contracts at least as
            # fast as Richardson, so the bound is conservative) and
            # refuse to run silently inexact: if even the generous cap
            # cannot reach inner_tol, degrade to host LU instead of
            # returning ~rho^cap accuracy while reporting convergence
            # (ADVICE round 2).
            rho_c = min(max(rho, 1e-14), 0.999)
            needed = int(2 * np.ceil(np.log(inner_tol) / np.log(rho_c)))
            # the refinement is GCR(m), whose Krylov window converges at
            # least as fast as the Richardson bound 'needed'; the raised
            # cap keeps budget-TRUNCATED bands (500k+: B=8 of 30) on the
            # device path instead of degrading to an intractable host LU
            _CAP = 300
            if needed > _CAP:
                logger.warning(
                    "Banded factor preconditions too weakly (contraction "
                    "%.2e needs ~%d refinement its for tol %.0e, cap %d); "
                    "falling back to host complex LU.",
                    rho, needed, inner_tol, _CAP,
                )
                self.method = "lu"
                self.device_op = None
                As = A.to_scipy().astype(np.complex128)
                Ms = M.to_scipy() if M is not None else sp.identity(self._n)
                self._lu = SparseLU((As - self.sigma * Ms).tocsc())
                return
            self._inner_tol = inner_tol
            self.refine_its = int(np.clip(needed, 4, _CAP))
            logger.info(
                "Banded shift-invert: contraction %.2e -> refinement cap %d "
                "for tol %.0e", rho, self.refine_its, inner_tol,
            )
        elif method == "gmres":
            # inexact shift-invert: GMRES on the equivalent real 2n
            # system, preconditioned by the f32 banded factorization of
            # the full complex C = A - sigma M.  (Round-1's block-Jacobi
            # preconditioner stalls on saddle-point operators — VERDICT
            # weak item 2; the banded PC converges in a handful of
            # iterations.)
            sr = self.sigma.real
            if M is not None:
                if M.pattern is A.pattern:
                    C = A.axpy(-sr, M)
                else:
                    # matrices loaded from files carry separate patterns:
                    # form the union on the host (one-time setup cost)
                    C = CSRMatrix.from_scipy(
                        (A.to_scipy() - sr * M.to_scipy()).tocsr()
                    )
            else:
                C = CSRMatrix(A.pattern, A.data.at[A.dev.diag_slots].add(-sr), A.dev)
            self._C = C
            Cz = A.to_scipy().astype(np.complex128)
            Cz = Cz - self.sigma * (M.to_scipy() if M is not None else sp.identity(self._n))
            self._blu = BandedLU.from_complex_csr(Cz.tocsr(), delta=1e-7)
            self._inner_tol = inner_tol
            self._inner_maxiter = inner_maxiter
        else:
            raise ValueError(method)

    def _build_bcsr_ops(self, band_bytes: int = 0):
        """BCSR refinement matvecs (default): slice-gathered block SpMV
        (:mod:`lsafw_tpu.ops.bcsr`) — ~2 orders of magnitude over the
        scalar-gather ELL path on TPU, and sharing the band's RCM.

        Memory-aware: the blocks must coexist with the band factor, so
        the budget is min(``LSAFW_BCSR_MEM_GB``, HBM headroom left by
        the factor); bc steps down through the packed-lane sizes (each
        ~halves the storage at a modest gather-count cost) before
        falling back to the element-op/CSR paths."""
        from lsafw_tpu.ops.bcsr import (
            BCSRPairOperator, BCSRShiftedOp, default_block_shape,
            plan_for_pattern,
        )

        A, M = self.A, self.M
        if M is not None and M.pattern is not A.pattern:
            return None, None
        n_ops = 2  # (A, M) value blocks — sigma is a traced scalar
        hbm = float(os.environ.get("LSAFW_HBM_GB", "15")) * 1e9
        budget = min(
            float(os.environ.get("LSAFW_BCSR_MEM_GB", "6")) * 1e9,
            hbm - float(band_bytes) - 3.5e9,  # workspace + fragmentation margin
        )
        br, bc0 = default_block_shape()
        plan = None
        for bc in [b for b in (bc0, 16, 8) if b <= bc0]:
            try:
                cand = plan_for_pattern(A, br=br, bc=bc)
            except Exception as e:  # planning is best-effort
                logger.warning("BCSR planning failed (%s); falling back.", e)
                return None, None
            if cand.bytes_per_matrix * n_ops <= budget:
                plan = cand
                break
            logger.info(
                "BCSR blocks bc=%d (%.1f GB) over budget %.1f GB.",
                bc, cand.bytes_per_matrix * n_ops / 1e9, budget / 1e9,
            )
        if plan is None:
            return None, None
        if M is not None:
            Cop = BCSRShiftedOp.from_csr(A, M, self.sigma, plan)
            # Mop stays None: _si_apply_M routes through Cop.mass_pair —
            # a mass-view adapter here would re-list Cop's value blocks
            # as a second multi-GB jit parameter (counted twice by XLA).
            Mop = None
        else:
            diag = A.dev.diag_slots
            c_re = A.data.at[diag].add(-self.sigma.real)
            c_im = jnp.zeros_like(A.data).at[diag].add(-self.sigma.imag)
            Cop = BCSRPairOperator.from_csr_pair(
                CSRMatrix(A.pattern, c_re), c_im, plan)
            Mop = None
        logger.info(
            "BCSR refinement matvecs: br=%d bc=%d KB=%d, %.2f GB x %d ops",
            plan.br, plan.bc, plan.KB, plan.bytes_per_matrix / 1e9, n_ops,
        )
        self._bcsr_plan = plan
        return Cop, Mop

    def _factor_banded(self, inner_tol: float) -> BandedLU:
        """Factor C = A - sigma M on device.

        When A and M share a pattern, C's data is formed by device
        arithmetic on the shared pattern (no host round-trip, no scipy
        zero-pruning) and the :class:`BandPlan` is cached per pattern —
        a sigma sweep refactorizes with one scatter + scan.  Rows with
        (numerically) zero diagonals — the pressure block of
        saddle-point operators — get a small negative regularization
        ``-gamma * diag_scale`` before factoring: the classic stabilized
        saddle-point trick; without it the pivot-free elimination
        overflows f32 at production sizes (measured at 167k DOFs).
        """
        from lsafw_tpu.solver.band import factor_auto, plan_for_csr

        A, M = self.A, self.M
        if M is not None and M.pattern is A.pattern:
            if self.sigma.imag == 0.0:
                # real shift of real operators: single-channel band
                plan = plan_for_csr(A, real=True)
                dre = A.data - self.sigma.real * M.data
                blu, _ = factor_auto(plan, dre, diag_slots=A.pattern.diag_slots)
                return blu
            plan = plan_for_csr(A)
            dre = A.data - self.sigma.real * M.data
            dim = (-self.sigma.imag) * M.data
        else:
            As = A.to_scipy().astype(np.complex128)
            Ms = M.to_scipy() if M is not None else sp.identity(self._n, format="csr")
            C = (As - self.sigma * Ms).tocsr()
            # guarantee diagonal slots: scipy arithmetic prunes exact
            # zeros, and the saddle regularization below needs the
            # (numerically zero) pressure-diagonal slots to exist.
            # 1e-300 survives pruning and casts to 0.0f in the band fill.
            C = (C + sp.diags(np.full(self._n, 1e-300))).tocsr()
            C.sort_indices()
            Cc = CSRMatrix.from_scipy(C)  # re-pattern after pruning
            plan = plan_for_csr(Cc)
            dre = jnp.asarray(np.ascontiguousarray(C.data.real))
            dim = jnp.asarray(np.ascontiguousarray(C.data.imag))
            A = Cc  # diag slots below come from this pattern
        blu, _ = factor_auto(plan, dre, dim, diag_slots=A.pattern.diag_slots)
        return blu

    def traced_apply(self, op: BandedSIOp, v: CVec) -> CVec:
        """Jit-traceable apply for the fused per-restart Arnoldi
        (banded method only; the op pytree arrives as a jit argument)."""
        return banded_si_apply(op, v, tol=self._inner_tol, max_its=self.refine_its)

    def apply(self, v: CVec) -> CVec:
        """One shift-invert Arnoldi apply (``Solver/eigen2.py:164-201``)."""
        if self.method == "banded":
            # jit the whole apply: on high-latency runtimes (the axon
            # tunnel adds ~150 ms per dispatch) the eager op-by-op form
            # costs tens of seconds per apply
            if not hasattr(self, "_japply"):
                self._japply = jax.jit(
                    partial(
                        banded_si_apply,
                        tol=self._inner_tol,
                        max_its=self.refine_its,
                    )
                )
            return self._japply(self.device_op, v)
        if self.M is not None:
            br, bi = spmv_pair(self.M, v[0], v[1])
        else:
            br, bi = v
        if self.antishift is not None:
            # Cayley RHS: A v + nu M v
            Ar, Ai = spmv_pair(self.A, v[0], v[1])
            nu = self.antishift
            br, bi = (
                Ar + (nu.real * br - nu.imag * bi),
                Ai + (nu.real * bi + nu.imag * br),
            )
        if self.method == "lu":
            z = self._lu.solve(np.asarray(br) + 1j * np.asarray(bi))
            return jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy())
        res = _si_gmres_2n(
            self._C, self.M, jnp.concatenate([br, bi]), self._blu,
            self.sigma.imag, tol=self._inner_tol, maxiter=self._inner_maxiter,
        )
        return res.x[: self._n], res.x[self._n :]

    def solve_raw(self, b: CVec) -> CVec:
        """x = (A - sigma M)^-1 b for a raw right-hand side (no M
        premultiply, no Cayley RHS) — the building block of the
        non-modal analyses (:mod:`lsafw_tpu.transient`)."""
        if self.method == "banded":
            if not hasattr(self, "_jsolve_raw"):
                self._jsolve_raw = jax.jit(
                    partial(
                        banded_solve_raw,
                        tol=self._inner_tol,
                        max_its=self.refine_its,
                    )
                )
            return self._jsolve_raw(self.device_op, b)
        if self.method == "lu":
            z = self._lu.solve(np.asarray(b[0]) + 1j * np.asarray(b[1]))
            return jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy())
        raise NotImplementedError(f"solve_raw for method {self.method!r}")

    def back_transform(self, theta: np.ndarray) -> np.ndarray:
        """theta -> lambda = sigma + 1/theta (``Solver/eigen2.py:210``);
        Cayley: lambda = (sigma theta + nu) / (theta - 1)."""
        if self.antishift is not None:
            den = theta - 1.0
            den = np.where(np.abs(den) < 1e-300, 1e-300, den)
            return (self.sigma * theta + self.antishift) / den
        return self.sigma + 1.0 / theta


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _si_gmres_2n(C, M, b2n, blu, si, *, tol, maxiter):
    """Inexact shift-invert inner solve on the equivalent real 2n system
    [[C, S], [-S, C]], C = A - Re(sigma) M, S = Im(sigma) M,
    preconditioned by the f32 banded factorization of the complex
    operator — all operands jit arguments."""
    from lsafw_tpu.solver.linear import gmres as _gmres

    n = C.shape[0]

    def matvec2n(z):
        xr, xi = z[:n], z[n:]
        Cr, Ci = spmv_pair(C, xr, xi)
        if M is not None:
            Sxr, Sxi = spmv_pair(M, xr, xi)
        else:
            Sxr, Sxi = xr, xi
        return jnp.concatenate([Cr + si * Sxi, Ci - si * Sxr])

    def pc2n(z):
        xr, xi = blu.solve_pair(z[:n], z[n:])
        return jnp.concatenate([xr, xi])

    return _gmres(matvec2n, b2n, tol=tol, restart=40, maxiter=maxiter, M=pc2n)


class ChebyshevFilterOperator:
    """Chebyshev polynomial spectral filter (parity: the STFILTER role,
    ``/root/reference/Solver/utils.py:131-149``): amplifies the
    eigenvalues of a Hermitian operator below ``cutoff`` (or above, for
    LARGEST) without any factorization — degree-``d`` Chebyshev
    T_d(g(A)) with the unwanted spectral window affinely mapped onto
    [-1, 1], so wanted eigenvalues land where |T_d| grows like
    cosh(d arccosh |g|).  Eigenvalues are NOT recoverable from the
    filter's Ritz values; the caller recovers them as Rayleigh
    quotients of the converged vectors.

    Standard Hermitian problems only (M = None); generalized pairs go
    through SINVERT/CAYLEY instead.
    """

    def __init__(
        self,
        A: CSRMatrix,
        cutoff: float,
        *,
        degree: int = 30,
        smallest: bool = True,
        bound_its: int = 30,
    ) -> None:
        self.A = A
        self.degree = int(degree)
        n = A.shape[0]
        # spectral bound via power iteration on the host-facing apply
        rng = np.random.default_rng(5)
        v = jnp.asarray(rng.standard_normal(n))
        lam_max = 0.0
        for _ in range(bound_its):
            w = spmv(A, v)
            lam_max = float(jnp.linalg.norm(w))
            v = w / lam_max
        lam_max *= 1.05  # safety margin on the Rayleigh estimate
        lam_min = -lam_max  # symmetric-safe lower bound
        if smallest:
            lo, hi = float(cutoff), lam_max
        else:
            lo, hi = lam_min, float(cutoff)
        # affine map g(x) = (2x - (hi+lo)) / (hi-lo): unwanted -> [-1,1]
        self._e = (hi + lo) / 2.0
        self._c = (hi - lo) / 2.0

    def apply(self, v: CVec) -> CVec:
        """T_d(g(A)) v by the three-term recurrence (d matvecs)."""
        from lsafw_tpu.ops.sparse import spmv_pair

        e, c, d = self._e, self._c, self.degree
        A = self.A

        def g(xr, xi):
            wr, wi = spmv_pair(A, xr, xi)
            return (wr - e * xr) / c, (wi - e * xi) / c

        t0r, t0i = v
        t1r, t1i = g(t0r, t0i)
        for _ in range(d - 1):
            wr, wi = g(t1r, t1i)
            t2r = 2.0 * wr - t0r
            t2i = 2.0 * wi - t0i
            t0r, t0i, t1r, t1i = t1r, t1i, t2r, t2i
        # NOTE: no per-apply normalization — that would make the
        # operator nonlinear and corrupt the Arnoldi relation.  The
        # caller bounds the degree so T_d magnitudes stay inside f64.
        return t1r, t1i

    def back_transform(self, theta: np.ndarray) -> np.ndarray:
        raise RuntimeError(
            "filter Ritz values carry no eigenvalue information; use "
            "Rayleigh quotients (EigenSolver handles this)"
        )


class ShellOperator:
    """User-defined spectral transform (SLEPc STSHELL role): wraps the
    caller's transformed apply and eigenvalue back-transform."""

    def __init__(self, apply_fn, back_fn) -> None:
        self._apply = apply_fn
        self._back = back_fn

    def apply(self, v: CVec) -> CVec:
        return self._apply(v)

    def back_transform(self, theta: np.ndarray) -> np.ndarray:
        return np.asarray([self._back(t) for t in np.asarray(theta)])


class PlainOperator:
    """op v = A v (optionally M^-1 A v via LU) for non-transformed solves."""

    def __init__(self, A: CSRMatrix, M: CSRMatrix | None = None) -> None:
        self.A = A
        self._lu = SparseLU(M.to_scipy().astype(np.complex128)) if M is not None else None

    def apply(self, v: CVec) -> CVec:
        wr, wi = spmv_pair(self.A, v[0], v[1])
        if self._lu is None:
            return wr, wi
        z = self._lu.solve(np.asarray(wr) + 1j * np.asarray(wi))
        return jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy())

    def back_transform(self, theta: np.ndarray) -> np.ndarray:
        return theta


# ---------------------------------------------------------------------------
# Krylov-Schur
# ---------------------------------------------------------------------------


@dataclass
class KrylovSchurResult:
    eigenvalues: np.ndarray  # (nconv,) complex, sorted by selection
    eigenvectors: np.ndarray  # (nconv, n) complex
    residuals: np.ndarray  # Ritz residual estimates |beta e_m^T y|
    iterations: int
    converged: bool
    nconv: int = 0  # pairs meeting the solver's own convergence test


def _sort_key(which: EpsWhich, target: complex | None):
    """Scalar sort key (ascending = more wanted) for each selection."""
    t = target or 0.0
    if which is EpsWhich.LARGEST_MAGNITUDE:
        return lambda z: -np.abs(z)
    if which is EpsWhich.SMALLEST_MAGNITUDE:
        return lambda z: np.abs(z)
    if which is EpsWhich.LARGEST_REAL:
        return lambda z: -np.real(z)
    if which is EpsWhich.SMALLEST_REAL:
        return lambda z: np.real(z)
    if which is EpsWhich.TARGET_MAGNITUDE:
        return lambda z: np.abs(z - t)
    if which is EpsWhich.TARGET_REAL:
        return lambda z: np.abs(np.real(z) - np.real(t))
    raise ValueError(which)


def _select_order(theta: np.ndarray, which: EpsWhich, target: complex | None) -> np.ndarray:
    return np.argsort(_sort_key(which, target)(theta), kind="stable")


def _use_fused_expand(n: int, device_op=None) -> bool:
    """Whole-restart fusion policy: env override LSAFW_FUSED_EXPAND,
    else fused everywhere except large TPU problems on the legacy
    (non-BCSR) refinement matvecs.

    Round-3 root cause of the old >100k gate: the monolithic f64
    reductions of the refinement C applies materialized vals-sized
    temporaries, and XLA buffer assignment for the fused per-restart
    program wanted 24 GB HBM at 175k (surfacing as compile OOMs / the
    round-1/2 worker "kernel faults").  The chunked-scan BCSR operators
    bound live temporaries, so fusion is back on when the op rides
    BCSR; the krylov_schur loop additionally falls back to the
    per-step path at runtime if the fused compile still exhausts
    resources."""
    import os

    env = os.environ.get("LSAFW_FUSED_EXPAND")
    if env is not None:
        return env not in ("0", "false", "no")
    if jax.default_backend() != "tpu" or n < 100_000:
        return True
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp

    # device_op may be a BandedSIOp (Cop field), a sharded CSR operator
    # (no Cop), or None — only the BCSR-backed banded SI is known-safe
    return isinstance(getattr(device_op, "Cop", None), BCSRShiftedOp)


def _make_fused_expand(ncv: int, traced_apply, dtype):
    """One jitted program per restart cycle: expand the Arnoldi
    factorization from k to ncv entirely on device (op applies + CGS2 +
    H accumulation), so a restart costs a single dispatch instead of
    ~2(ncv - k) round-trips (the round-1 host-chatter bottleneck; only
    the ncv x ncv Schur bookkeeping stays on host)."""

    def expand(op, Vr, Vi, Hr, Hi, k):
        def body(j, st):
            Vr, Vi, Hr, Hi = st
            wr, wi = traced_apply(op, (Vr[j], Vi[j]))
            mask = (jnp.arange(ncv + 1) <= j).astype(Vr.dtype)
            h1 = basis_project(Vr, Vi, (wr, wi), mask)
            wr, wi = basis_subtract(Vr, Vi, (wr, wi), h1)
            h2 = basis_project(Vr, Vi, (wr, wi), mask)
            wr, wi = basis_subtract(Vr, Vi, (wr, wi), h2)
            hr, hi = h1[0] + h2[0], h1[1] + h2[1]
            beta = jnp.sqrt(ddot(wr, wr) + ddot(wi, wi))
            scale = 1.0 / jnp.maximum(beta, 1e-300)
            Vr = Vr.at[j + 1].set(wr * scale)
            Vi = Vi.at[j + 1].set(wi * scale)
            Hr = Hr.at[:, j].set(hr.at[j + 1].set(beta))
            Hi = Hi.at[:, j].set(hi.at[j + 1].set(0.0))
            return Vr, Vi, Hr, Hi

        return jax.lax.fori_loop(k, ncv, body, (Vr, Vi, Hr, Hi))

    return jax.jit(expand, donate_argnums=(1, 2, 3, 4))


def _make_arnoldi_step(n: int, ncv: int, dtype):
    """Jitted CGS2 Arnoldi expansion: orthogonalize w against V[0..j]."""

    def step(Vr, Vi, wr, wi, j):
        mask = (jnp.arange(ncv + 1) <= j).astype(Vr.dtype)
        h1 = basis_project(Vr, Vi, (wr, wi), mask)
        wr, wi = basis_subtract(Vr, Vi, (wr, wi), h1)
        h2 = basis_project(Vr, Vi, (wr, wi), mask)
        wr, wi = basis_subtract(Vr, Vi, (wr, wi), h2)
        hr, hi = h1[0] + h2[0], h1[1] + h2[1]
        beta = jnp.sqrt(ddot(wr, wr) + ddot(wi, wi))
        scale = 1.0 / jnp.maximum(beta, 1e-300)
        Vr = Vr.at[j + 1].set(wr * scale)
        Vi = Vi.at[j + 1].set(wi * scale)
        return Vr, Vi, hr, hi, beta

    return jax.jit(step, donate_argnums=(0, 1))


def krylov_schur(
    apply_op: Callable[[CVec], CVec],
    n: int,
    *,
    nev: int,
    ncv: int | None = None,
    which: EpsWhich = EpsWhich.LARGEST_MAGNITUDE,
    target: complex | None = None,
    tol: float = 1e-10,
    max_restarts: int = 200,
    v0: np.ndarray | None = None,
    seed: int = 7,
    dtype=jnp.float64,
    device_op=None,
    traced_apply=None,
    basis_sharding=None,
) -> KrylovSchurResult:
    """Krylov-Schur iteration (parity: the SLEPc default solver,
    ``README.md:43`` "Krylov-Schur"; restart scheme per Stewart 2002,
    re-implemented from the published algorithm).

    When ``device_op``/``traced_apply`` are given (a pytree operator
    plus a traceable apply), each restart's Arnoldi expansion runs as
    ONE jitted device program; otherwise ``apply_op`` is called eagerly
    per step (required for host-LU operators).

    ``basis_sharding``: optional ``NamedSharding`` for the (ncv+1, n)
    Krylov basis (``P(None, "dof")`` over a device mesh) — the
    distributed-eigensolve layout (SURVEY section 2.3 item 4): XLA
    inserts the psum reductions of CGS2 and the gather of the operator
    apply over the mesh."""
    ncv = ncv or min(max(2 * nev + 1, 20), n)
    ncv = min(ncv, n)
    if ncv <= nev:
        raise ValueError(f"ncv={ncv} must exceed nev={nev}")

    rng = np.random.default_rng(seed)
    if v0 is None:
        v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    v0 = np.asarray(v0, dtype=np.complex128)
    v0 /= np.linalg.norm(v0)

    if basis_sharding is not None:
        V0r = np.zeros((ncv + 1, n))
        V0i = np.zeros((ncv + 1, n))
        V0r[0] = v0.real
        V0i[0] = v0.imag
        Vr = jax.device_put(V0r, basis_sharding).astype(dtype)
        Vi = jax.device_put(V0i, basis_sharding).astype(dtype)
    else:
        Vr = jnp.zeros((ncv + 1, n), dtype=dtype)
        Vi = jnp.zeros((ncv + 1, n), dtype=dtype)
        Vr = Vr.at[0].set(jnp.asarray(v0.real))
        Vi = Vi.at[0].set(jnp.asarray(v0.imag))
    H = np.zeros((ncv + 1, ncv), dtype=np.complex128)

    fused = device_op is not None and traced_apply is not None
    if fused and not _use_fused_expand(n, device_op):
        # legacy-matvec programs above 100k on TPU exceed HBM at
        # compile time (see _use_fused_expand); one jitted apply per
        # step — at that scale the ~2 dispatches/step are negligible
        fused = False
    japply = arnoldi_step = None
    if fused:
        expand = _make_fused_expand(ncv, traced_apply, dtype)
    else:
        arnoldi_step = _make_arnoldi_step(n, ncv, dtype)

    def _expand_stepwise(Vr, Vi, H, k):
        nonlocal japply, arnoldi_step
        if japply is None:
            if device_op is not None and traced_apply is not None:
                jt = jax.jit(lambda op, v: traced_apply(op, v))
                japply = lambda v: jt(device_op, v)
            else:
                japply = apply_op
        if arnoldi_step is None:
            arnoldi_step = _make_arnoldi_step(n, ncv, dtype)
        for j in range(k, ncv):
            wr, wi = japply((Vr[j], Vi[j]))
            Vr, Vi, hr, hi, beta = arnoldi_step(Vr, Vi, wr, wi, j)
            H[: ncv + 1, j] = np.asarray(hr) + 1j * np.asarray(hi)
            H[j + 1, j] = float(beta)
            H[j + 2 :, j] = 0.0
        return Vr, Vi, H

    k = 0  # current restart size (leading Schur block carried over)
    n_ops = 0
    for restart in range(max_restarts):
        # --- expand the Arnoldi factorization from k to ncv ---
        if fused:
            Hr = jnp.asarray(np.ascontiguousarray(H.real))
            Hi = jnp.asarray(np.ascontiguousarray(H.imag))
            try:
                Vr, Vi, Hr, Hi = expand(device_op, Vr, Vi, Hr, Hi, k)
                H = np.asarray(Hr) + 1j * np.asarray(Hi)
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e) and "Ran out of memory" not in str(e):
                    raise
                # fused program didn't fit this problem+operator
                # footprint: degrade to the per-step path for the rest
                # of the solve (self-healing replacement of the old
                # size gate)
                logger.warning(
                    "Fused Arnoldi expand exhausted device memory; "
                    "falling back to per-step applies."
                )
                fused = False
                Vr, Vi, H = _expand_stepwise(Vr, Vi, H, k)
        else:
            Vr, Vi, H = _expand_stepwise(Vr, Vi, H, k)
        n_ops += ncv - k

        Hm = H[:ncv, :ncv]
        beta_m = H[ncv, ncv - 1].real

        # --- sorted Schur form: wanted values to the leading block.
        # LAPACK's reordering re-derives eigenvalues with different
        # rounding, so the selection predicate must be a *threshold* on
        # the sort key (robust), not an exact value match.
        theta_all = sla.eigvals(Hm)
        order = _select_order(theta_all, which, target)
        keep = min(max(nev + (ncv - nev) // 2, nev + 1), ncv - 1)
        key_fn = _sort_key(which, target)
        keys = key_fn(theta_all)
        sorted_keys = np.sort(keys)
        thresh = (
            0.5 * (sorted_keys[keep - 1] + sorted_keys[keep])
            if keep < ncv
            else sorted_keys[-1] + 1.0
        )

        def _sorter(z):
            return bool(key_fn(np.asarray([z]))[0] <= thresh)

        T, Q, sdim = sla.schur(Hm, output="complex", sort=_sorter)
        if sdim == 0:  # degenerate clustering; fall back to unsorted
            T, Q = sla.schur(Hm, output="complex")
            sdim = keep
        sdim = min(sdim, ncv - 1)

        b = beta_m * Q[ncv - 1, :]  # residual coupling row

        # --- Ritz pairs of the selected block, explicitly ordered.
        # (The Schur sort only *partitions*: the selected block is not
        # internally ordered by the key, so diagonalize the whole block
        # and order the Ritz values ourselves.)
        Tm = T[:sdim, :sdim]
        evals_s, evecs_s = sla.eig(Tm)
        ord_s = _select_order(evals_s, which, target)
        evals_s = evals_s[ord_s]
        Y = Q[:, :sdim] @ evecs_s[:, ord_s]  # (ncv, sdim), unit columns up to eig scaling
        Y = Y / np.linalg.norm(Y, axis=0, keepdims=True)
        resid = np.abs(beta_m) * np.abs(Y[ncv - 1, :])
        conv_mask = resid <= tol * np.maximum(np.abs(evals_s), 1e-30)
        nconv = 0
        for ok in conv_mask:
            if ok:
                nconv += 1
            else:
                break

        if nconv >= nev or restart == max_restarts - 1:
            m_ext = min(max(nconv, nev), sdim)
            vecs = []
            for i in range(m_ext):
                xr, xi = basis_combine(
                    Vr[:ncv], Vi[:ncv],
                    jnp.asarray(Y[:, i].real.copy()), jnp.asarray(Y[:, i].imag.copy()),
                )
                z = np.asarray(xr) + 1j * np.asarray(xi)
                nz = np.linalg.norm(z)
                vecs.append(z / (nz if nz > 0 else 1.0))
            logger.info(
                "Krylov-Schur: %d/%d converged after %d restarts (%d op applies)",
                nconv, nev, restart + 1, n_ops,
            )
            return KrylovSchurResult(
                eigenvalues=evals_s[:m_ext],
                eigenvectors=np.asarray(vecs),
                residuals=resid[:m_ext],
                iterations=n_ops,
                converged=nconv >= nev,
                nconv=nconv,
            )

        # --- Krylov-Schur restart: keep the leading sdim-block ---
        k = min(max(sdim, nconv + 1), ncv - 1)
        Qk = Q[:, :k]  # (ncv, k)
        Vr_new, Vi_new = _restart_basis(Vr, Vi, Qk, ncv)
        Vr = Vr_new.at[k].set(Vr[ncv])
        Vi = Vi_new.at[k].set(Vi[ncv])
        H[:, :] = 0.0
        H[:k, :k] = T[:k, :k]
        H[k, :k] = b[:k]

    raise RuntimeError("Krylov-Schur failed to converge (unreachable)")


def _restart_basis(Vr, Vi, Qk: np.ndarray, ncv: int):
    """V_new[:k] = Qk^T V[:ncv] (complex basis rotation, device matmul)."""
    Qr = jnp.asarray(Qk.real.copy().T)  # (k, ncv)
    Qi = jnp.asarray(Qk.imag.copy().T)
    newr = Qr @ Vr[:ncv] - Qi @ Vi[:ncv]
    newi = Qr @ Vi[:ncv] + Qi @ Vr[:ncv]
    k = Qk.shape[1]
    Vr = Vr.at[:k].set(newr)
    Vi = Vi.at[:k].set(newi)
    Vr = Vr.at[k + 1 :].set(0.0)
    Vi = Vi.at[k + 1 :].set(0.0)
    return Vr, Vi


# ---------------------------------------------------------------------------
# EigenSolver front-end (parity: Solver/eigen.py:64-155)
# ---------------------------------------------------------------------------


class EigenSolver:
    """Generalized eigensolver front-end over (A, M)
    (parity: ``EigenSolver``, ``Solver/eigen.py:64-155``)."""

    def __init__(
        self,
        A: CSRMatrix,
        M: CSRMatrix | None,
        config: EigensolverConfig | None = None,
        *,
        check_hermitian: bool = False,
    ) -> None:
        self.A = A
        self.M = M
        self.config = config or EigensolverConfig()
        if A.shape[0] != A.shape[1]:
            raise ValueError("A must be square.")
        if M is not None and M.shape != A.shape:
            raise ValueError("A and M must have matching shapes.")
        if check_hermitian:
            self._warn_if_not_hermitian()
        self._st_type = STType.SHIFT
        self._target: complex | None = None
        self._antishift: complex | None = None
        self._which = EpsWhich.LARGEST_MAGNITUDE
        self._si_method = "lu"
        self._elements = None
        self._filter_degree = 30
        self._shell: tuple | None = None
        self._v0: np.ndarray | None = None

    def _warn_if_not_hermitian(self) -> None:
        """(parity: Hermiticity validation warnings, ``Solver/eigen.py:88-108``)."""
        As = self.A.to_scipy()
        if abs(As - As.T).max() > 1e-10:
            logger.warning("Operator A is not numerically symmetric/Hermitian.")
        if self.M is not None:
            Ms = self.M.to_scipy()
            if abs(Ms - Ms.T).max() > 1e-10:
                logger.warning("Operator M is not numerically symmetric/Hermitian.")

    # --- configuration (parity: iEpsSolver setters, Solver/utils.py:240-266) ---
    def set_st_type(self, st: STType | str) -> None:
        self._st_type = STType(st) if isinstance(st, str) else st

    def set_target(self, target: complex) -> None:
        self._target = complex(target)

    def set_cayley_antishift(self, nu: complex) -> None:
        """Antishift for the CAYLEY transform (parity: SLEPc
        ``ST.setCayleyAntishift``; defaults to the target)."""
        self._antishift = complex(nu)

    def set_st_shell(self, apply, back_transform=None) -> None:
        """User-defined spectral transform (parity: SLEPc STSHELL,
        ``Solver/utils.py:131-149``): ``apply((vr, vi)) -> (wr, wi)``
        is the transformed operator; ``back_transform(theta)`` maps its
        eigenvalues back (identity when omitted).  Implies
        ``STType.SHELL``."""
        self._shell = (apply, back_transform or (lambda t: t))
        self._st_type = STType.SHELL

    def set_which_eigenpairs(self, which: EpsWhich | str) -> None:
        self._which = EpsWhich(which) if isinstance(which, str) else which

    def set_st_pc_type(self, pc) -> None:
        """LU -> host factorization; "banded" -> device blocked band LU
        + refinement (the TPU-resident direct path, fused Arnoldi);
        anything else -> inexact GMRES inner solves."""
        name = getattr(pc, "value", str(pc)).lower()
        self._si_method = name if name in ("lu", "banded") else "gmres"

    def set_elements(self, ctx, A_el, M_el, bc_mask, dofs=None) -> None:
        """Provide the per-cell element matrices of (A, M) (e.g.
        ``LinearizedNavierStokesAssembler.element_matrices()``) so the
        banded shift-invert uses matrix-free refinement matvecs.
        ``dofs`` defaults to the context's mixed cell DOF map; pass the
        extended map when facet blocks are appended."""
        if dofs is None:
            dofs = ctx.mixed_cell_dofs
        self._elements = (dofs, A_el, M_el, bc_mask)

    def set_filter_degree(self, degree: int) -> None:
        """Chebyshev filter polynomial degree (FILTER transform)."""
        self._filter_degree = int(degree)

    def set_initial_vector(self, v0: np.ndarray) -> None:
        """Warm-start the Krylov iteration (parity: SLEPc
        ``EPS.setInitialSpace``).  Passing the previous parameter
        point's eigenvector during a continuation sweep typically
        halves the Arnoldi work."""
        self._v0 = np.asarray(v0, dtype=np.complex128).copy()

    def _solve_filtered(self, cfg, t0):
        """FILTER path: Krylov-Schur on the Chebyshev-filtered
        operator, eigenvalues recovered as Rayleigh quotients (filter
        Ritz values carry no spectral information).  Hermitian standard
        problems; the target plays SLEPc's interval-boundary (cutoff)
        role."""
        if self.M is not None:
            raise ValueError(
                "FILTER supports standard Hermitian problems; "
                "generalized pairs go through SINVERT/CAYLEY."
            )
        smallest = self._which in (
            EpsWhich.SMALLEST_REAL, EpsWhich.SMALLEST_MAGNITUDE,
            EpsWhich.LARGEST_MAGNITUDE,  # default selection -> smallest window
        )
        op = ChebyshevFilterOperator(
            self.A, float(np.real(self._target)),
            degree=self._filter_degree, smallest=smallest,
        )
        n = self.A.shape[0]
        result = krylov_schur(
            op.apply, n,
            nev=cfg.num_eig, ncv=min(cfg.ncv, n),
            which=EpsWhich.LARGEST_MAGNITUDE,
            tol=cfg.atol, max_restarts=cfg.max_it,
        )
        As = self.A.to_scipy()
        pairs = []
        for x in result.eigenvectors:
            xn = x / np.linalg.norm(x)
            lam = complex(np.vdot(xn, As @ xn))
            pairs.append((lam, xn))
        pairs.sort(key=lambda p: p[0].real if smallest else -p[0].real)
        logger.info("Filtered eigensolve completed in %.2f s.", time.time() - t0)
        return pairs[: cfg.num_eig]

    def solve(self) -> list[tuple[complex, np.ndarray]]:
        """Run the eigensolve, return eigenpairs sorted by selection
        (parity: ``EigenSolver.solve``, ``Solver/eigen.py:125-155``)."""
        cfg = self.config
        n = self.A.shape[0]
        t0 = time.time()

        def _run(target: complex | None):
            if self._st_type in (STType.SINVERT, STType.CAYLEY, STType.PRECOND):
                nu = None
                if self._st_type is STType.CAYLEY:
                    # SLEPc semantics: antishift defaults to the shift
                    nu = self._antishift if self._antishift is not None else target
                method = self._si_method
                if self._st_type is STType.PRECOND:
                    # STPRECOND: inexact shift-invert with an iterative,
                    # preconditioned inner solve by definition
                    method = "gmres"
                op = ShiftInvertOperator(
                    self.A, self.M, target, method=method,
                    inner_tol=min(cfg.atol * 1e-2, 1e-10),
                    elements=self._elements,
                    antishift=nu,
                )
                which = EpsWhich.LARGEST_MAGNITUDE  # largest theta = closest
            elif self._st_type is STType.SHELL:
                op = ShellOperator(*self._shell)
                which = self._which
            else:
                op = PlainOperator(self.A, self.M)
                which = self._which
            dev_op = getattr(op, "device_op", None)
            result = krylov_schur(
                op.apply, n,
                nev=cfg.num_eig, ncv=min(cfg.ncv, n),
                which=which, tol=cfg.atol, max_restarts=cfg.max_it,
                v0=self._v0,
                device_op=dev_op,
                traced_apply=op.traced_apply if dev_op is not None else None,
            )
            return op, result

        if self._st_type is STType.SHELL and self._shell is None:
            raise ValueError("SHELL requires set_st_shell(apply, back_transform).")
        if (
            self._st_type not in (STType.SHIFT, STType.SHELL)
            and self._target is None
        ):
            raise ValueError(f"{self._st_type.name} requires a target (set_target).")
        if self._st_type is STType.FILTER:
            return self._solve_filtered(cfg, t0)
        op, result = _run(self._target)
        lam = op.back_transform(result.eigenvalues)

        if self._st_type in (STType.SINVERT, STType.CAYLEY, STType.PRECOND):
            # If the shift coincides with an exact eigenvalue the
            # factorization is numerically singular: eigenvalues look
            # perfect but eigenvectors are polluted.  Detect via true
            # residuals and retry once with an offset shift.
            pairs0 = list(zip([complex(v) for v in lam], result.eigenvectors))
            true_res = eigen_residuals(self.A, self.M, pairs0)
            scale = np.abs(lam) + 1.0
            if (true_res / scale > 10.0 * max(cfg.atol, 1e-12)).any():
                offset = 1e-3 * (1.0 + abs(self._target))
                logger.info(
                    "Shift-invert eigenvectors polluted (target on an exact "
                    "eigenvalue?); retrying with offset shift %.1e.", offset,
                )
                op, result = _run(self._target + offset)
                lam = op.back_transform(result.eigenvalues)
        if not result.converged:
            # report the solver's own convergence count, not a recomputed
            # criterion that can disagree with it (ADVICE round 1)
            logger.warning(
                "Eigensolver returned %d converged of %d requested.",
                result.nconv, cfg.num_eig,
            )
        logger.info("Eigensolve completed in %.2f s.", time.time() - t0)
        pairs = list(zip([complex(v) for v in lam], result.eigenvectors))
        # order by the *user's* selection on the transformed eigenvalues
        if self._st_type in (STType.SINVERT, STType.CAYLEY, STType.PRECOND):
            order = np.argsort(np.abs(lam - self._target))
            pairs = [pairs[i] for i in order]
        return pairs[: cfg.num_eig]


def eigen_residuals(
    A: CSRMatrix, M: CSRMatrix | None, pairs: list[tuple[complex, np.ndarray]]
) -> np.ndarray:
    """||A x - lambda M x|| / ||x|| quality check (parity:
    ``Solver/eigen2.py:48,244-264`` residual QC)."""
    As = A.to_scipy().astype(np.complex128)
    Ms = M.to_scipy().astype(np.complex128) if M is not None else None
    out = []
    for lam, x in pairs:
        r = As @ x - lam * (Ms @ x if Ms is not None else x)
        out.append(np.linalg.norm(r) / max(np.linalg.norm(x), 1e-300))
    return np.asarray(out)
