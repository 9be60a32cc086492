"""Smoothed-aggregation algebraic multigrid (the PETSc GAMG role).

The reference reaches GAMG/hypre through ``PreconditionerType``
(``/root/reference/Solver/utils.py:84-88``).  The geometric options in
this repo (structured GMG, unstructured P2->P1 PMG) need mesh/space
information; SA-AMG works on the bare assembled matrix — the only
multigrid available for operators loaded from ``.mtx`` files.

Design: classical smoothed aggregation (Vanek-Mandel-Brezina).
Setup is host-side scipy (strength graph -> greedy aggregation ->
piecewise-constant tentative prolongator -> one Jacobi smoothing pass
-> Galerkin coarse operators, recursively); the V-cycle apply is one
jitted device program per application — damped-Jacobi smoothers,
CSR residual/transfer products, dense inverse on the coarsest level.
All level operators ride the pytree-argument contract (never closed
over at a jit boundary).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _strength_graph(S: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Symmetric strength-of-connection filter:
    keep |a_ij| > theta * sqrt(|a_ii a_jj|)."""
    C = S.tocoo()
    d = np.abs(S.diagonal())
    d = np.where(d > 0, d, 1.0)
    keep = (C.row != C.col) & (
        np.abs(C.data) > theta * np.sqrt(d[C.row] * d[C.col])
    )
    return sp.csr_matrix(
        (np.ones(int(keep.sum())), (C.row[keep], C.col[keep])), shape=S.shape
    )


def _aggregate(G: sp.csr_matrix) -> np.ndarray:
    """Greedy aggregation over the strength graph (two passes:
    seed disjoint root neighborhoods, then attach leftovers to a
    strongly-connected aggregate, isolated nodes become singletons)."""
    n = G.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices = G.indptr, G.indices
    next_id = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i]: indptr[i + 1]]
        if np.all(agg[nbrs] < 0):
            agg[i] = next_id
            agg[nbrs] = next_id
            next_id += 1
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i]: indptr[i + 1]]
        joined = nbrs[agg[nbrs] >= 0]
        if joined.size:
            agg[i] = agg[joined[0]]
        else:
            agg[i] = next_id
            next_id += 1
    return agg


@dataclass(eq=False)
class AMGLevel:
    A: CSRMatrix
    P: CSRMatrix | None  # prolongator to THIS (finer) level, None on finest? see hierarchy
    R: CSRMatrix | None  # restriction = P^T
    dinv: jnp.ndarray  # damped-Jacobi smoother diag


@dataclass(eq=False)
class AMGHierarchy:
    levels: list  # [AMGLevel] finest..coarsest-1; level l's P/R map l<->l+1
    coarse_inv: jnp.ndarray  # dense inverse of the coarsest operator
    omega: float
    smooth_steps: int


def _spectral_radius_dinv_a(S: sp.csr_matrix, iters: int = 12) -> float:
    """Power-iteration estimate of rho(D^-1 A) (host, small cost)."""
    n = S.shape[0]
    d = S.diagonal()
    d = np.where(np.abs(d) > 0, d, 1.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    x /= np.linalg.norm(x)
    lam = 1.0
    for _ in range(iters):
        y = (S @ x) / d
        lam = float(np.linalg.norm(y))
        if lam == 0:
            return 1.0
        x = y / lam
    return lam


def build_amg(
    A: CSRMatrix,
    *,
    theta: float = 0.08,
    coarse_size: int = 200,
    max_levels: int = 12,
    omega: float = 0.7,
    smooth_steps: int = 2,
) -> AMGHierarchy:
    """Build the SA-AMG hierarchy from a bare CSR operator."""
    S = A.to_scipy().tocsr()
    levels = []
    Af = A
    for _ in range(max_levels):
        n = S.shape[0]
        if n <= coarse_size:
            break
        G = _strength_graph(S, theta)
        agg = _aggregate(G)
        nagg = int(agg.max()) + 1
        if nagg >= n or nagg == 0:
            break  # aggregation stalled; stop coarsening here
        # tentative piecewise-constant prolongator, column-normalized
        counts = np.bincount(agg, minlength=nagg).astype(np.float64)
        P0 = sp.csr_matrix(
            (1.0 / np.sqrt(counts[agg]), (np.arange(n), agg)), shape=(n, nagg)
        )
        # one Jacobi smoothing pass: P = (I - w D^-1 A) P0
        d = S.diagonal()
        d = np.where(np.abs(d) > 0, d, 1.0)
        rho = _spectral_radius_dinv_a(S)
        w = (4.0 / 3.0) / max(rho, 1e-12)
        Dinv = sp.diags(1.0 / d)
        P = (sp.identity(n) - w * (Dinv @ S)) @ P0
        P = sp.csr_matrix(P)
        R = sp.csr_matrix(P.T)
        Sc = sp.csr_matrix(R @ S @ P)
        Sc.sort_indices()

        dj = np.where(np.abs(S.diagonal()) > 0, S.diagonal(), 1.0)
        levels.append(
            AMGLevel(
                A=Af,
                P=CSRMatrix.from_scipy(P),
                R=CSRMatrix.from_scipy(R),
                dinv=jnp.asarray(1.0 / dj),
            )
        )
        S = Sc
        Af = CSRMatrix.from_scipy(S)
    logger.info(
        "SA-AMG: %d levels, coarsest n=%d (finest n=%d)",
        len(levels) + 1, S.shape[0], A.shape[0],
    )
    coarse_inv = jnp.asarray(np.linalg.pinv(S.toarray()))
    return AMGHierarchy(
        levels=levels, coarse_inv=coarse_inv, omega=omega,
        smooth_steps=smooth_steps,
    )


def _vcycle(levels_flat, coarse_inv, r, *, omega, smooth_steps, nlev):
    """One V-cycle over the flattened level list (traced)."""
    from lsafw_tpu.ops.sparse import spmv

    def smooth(A, dinv, r, x):
        # lax.scan keeps the program one sweep deep (XLA:CPU compiles
        # unrolled gather-op chains pathologically — see solver/ilu.py)
        x, _ = jax.lax.scan(
            lambda x, _: (x + omega * dinv * (r - spmv(A, x)), None),
            x, None, length=smooth_steps)
        return x

    def cycle(l, r):
        if l == nlev:
            return coarse_inv @ r
        A, P, R, dinv = levels_flat[l]
        x = smooth(A, dinv, r, jnp.zeros_like(r))
        rc = spmv(R, r - spmv(A, x))
        x = x + spmv(P, cycle(l + 1, rc))
        return smooth(A, dinv, r, x)

    return cycle(0, r)


def amg_preconditioner(A: CSRMatrix, **kw):
    """SA-AMG V-cycle preconditioner closure (parity: the GAMG/hypre
    roles, ``Solver/utils.py:84-88``)."""
    hier = build_amg(A, **kw)
    nlev = len(hier.levels)
    flat = tuple((lv.A, lv.P, lv.R, lv.dinv) for lv in hier.levels)

    @jax.jit
    def apply(flat, coarse_inv, r):
        return _vcycle(
            flat, coarse_inv, r,
            omega=hier.omega, smooth_steps=hier.smooth_steps, nlev=nlev,
        )

    return lambda r: apply(flat, hier.coarse_inv, r)
