"""Jit-compiled Krylov linear solvers.

TPU-native counterpart of PETSc KSP reached through ``LinearSolver``
(``Solver/linear.py:27-362``) and the ``KSPType`` enum
(``Solver/utils.py:96-128``): CG, restarted GMRES/FGMRES/LGMRES/GCR,
BiCG/BiCGStab/CGS, MINRES, LSQR, Richardson, Chebyshev, QCG and
PREONLY as ``lax.while_loop`` algorithms over a user matvec closure
(the full reference menu; BICG/LSQR take an ``rmatvec`` transpose
apply, e.g. ``CSRMatrix.transpose()``).  GMRES keeps
its Krylov basis as a (restart+1, n) matrix so orthogonalization is a
single (m, n) x (n,) matmul per step — MXU work, with all reductions
fused by XLA (the analog of PETSc's MPI allreduce dot products,
SURVEY.md section 2.3).

Solvers are dtype-generic (f32/f64) and return a :class:`SolveResult`
carrying the iteration count and final residual for observability
(parity: KSP residual-history monitors, ``Solver/linear.py:280-304``).
"""

from __future__ import annotations

from enum import Enum
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from lsafw_tpu.ops.dots import ddot

Matvec = Callable[[jnp.ndarray], jnp.ndarray]


class KSPType(Enum):
    """Solver types (parity: ``Solver/utils.py:96-128``; the subset
    that is TPU-meaningful — direct LU lives in
    :mod:`lsafw_tpu.solver.direct`)."""

    CG = "cg"
    GMRES = "gmres"
    FGMRES = "fgmres"
    BICGSTAB = "bcgs"
    MINRES = "minres"
    RICHARDSON = "richardson"
    CHEBYSHEV = "chebyshev"
    PREONLY = "preonly"
    BICG = "bicg"
    CGS = "cgs"
    GCR = "gcr"
    LGMRES = "lgmres"
    LSQR = "lsqr"
    QCG = "qcg"

    @classmethod
    def from_string(cls, value: str) -> "KSPType":
        return cls(value.lower().strip())


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar
    residual: jnp.ndarray  # final |r| / |b|
    converged: jnp.ndarray  # bool scalar
    history: jnp.ndarray | None = None  # per-cycle/iteration residuals
    # (parity: KSP residual-history monitors, Solver/linear.py:280-304;
    # fixed-length, padded with the final residual)


def _identity(x):
    return x


# ---------------------------------------------------------------------------
# CG
# ---------------------------------------------------------------------------


def cg(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Preconditioned conjugate gradients (parity: ``cg_solve``,
    ``Solver/linear.py:170-192``)."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)

    r = b - matvec(x)
    z = M(r)
    p = z
    rz = ddot(r, z)

    def cond(st):
        x, r, z, p, rz, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter)

    def body(st):
        x, r, z, p, rz, k = st
        Ap = matvec(p)
        alpha = rz / ddot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = ddot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = lax.while_loop(cond, body, (x, r, z, p, rz, jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


# ---------------------------------------------------------------------------
# GMRES(restart)
# ---------------------------------------------------------------------------


def gmres(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    restart: int = 30,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Left-preconditioned restarted GMRES (parity: ``gmres_solve``,
    ``Solver/linear.py:194-218``; restart default matches PETSc's 30).

    One restart cycle = ``restart`` Arnoldi steps with CGS2
    reorthogonalization expressed as dense (m+1, n) matmuls, then a
    small on-device least-squares solve.  Convergence is checked on the
    true residual at each cycle boundary.
    """
    M = M or _identity
    n = b.shape[0]
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    Mb = M(b)
    bnorm = jnp.linalg.norm(Mb)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    m = restart
    max_cycles = -(-maxiter // m)
    eps_floor = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    def arnoldi_cycle(x):
        r = M(b - matvec(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype=dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps_floor))
        H = jnp.zeros((m + 1, m), dtype=dtype)

        def step(j, carry):
            V, H = carry
            w = M(matvec(V[j]))
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            # classical Gram-Schmidt, twice (CGS2): two dense matmuls
            # projections via row-reductions, not MXU dots (ops/dots.py)
            h1 = (V * w).sum(axis=1) * mask
            w = w - V.T @ h1
            h2 = (V * w).sum(axis=1) * mask
            w = w - V.T @ h2
            h = h1 + h2
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, eps_floor))
            H = H.at[:, j].set(h)
            H = H.at[j + 1, j].set(hj1)
            return (V, H)

        V, H = lax.fori_loop(0, m, step, (V, H))
        # least squares: min || beta e1 - H y ||  via QR of (m+1, m) H
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        Q, R = jnp.linalg.qr(H, mode="reduced")
        rhs = Q.T @ g
        # guard zero diagonal (breakdown / exact solution mid-cycle)
        diag = jnp.diagonal(R)
        safe = jnp.where(jnp.abs(diag) > eps_floor, diag, 1.0)
        Rsafe = R + jnp.diag(safe - diag)
        y = jax.scipy.linalg.solve_triangular(Rsafe, rhs, lower=False)
        return x + V[:m].T @ y

    def cond(st):
        x, k, res, hist = st
        return (res > tol) & (k < max_cycles)

    def body(st):
        x, k, _, hist = st
        x = arnoldi_cycle(x)
        res = jnp.linalg.norm(M(b - matvec(x))) / bnorm
        hist = hist.at[k].set(res)
        return (x, k + 1, res, hist)

    res0 = jnp.linalg.norm(M(b - matvec(x))) / bnorm
    hist0 = jnp.full(max_cycles, res0, dtype=bnorm.dtype)
    x, k, res, hist = lax.while_loop(cond, body, (x, jnp.int32(0), res0, hist0))
    hist = jnp.where(jnp.arange(max_cycles) < k, hist, res)
    return SolveResult(x, k * m, res, res <= tol, hist)


# ---------------------------------------------------------------------------
# FGMRES (right-preconditioned, flexible)
# ---------------------------------------------------------------------------


def fgmres(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    restart: int = 30,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Flexible (right-preconditioned) restarted GMRES (parity:
    PETSc ``fgmres``, ``Solver/utils.py:96-128``).

    Unlike :func:`gmres` (left preconditioning), the residual minimized
    — and reported — is the TRUE residual ``||b - A x|| / ||b||``, so
    convergence is meaningful even under severely ill-conditioned
    preconditioners (e.g. regularized saddle-point factors), and ``M``
    may change between iterations (flexible).  Costs one extra stored
    basis ``Z``.
    """
    M = M or _identity
    n = b.shape[0]
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    m = restart
    max_cycles = -(-maxiter // m)
    eps_floor = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    def cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype=dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps_floor))
        Z = jnp.zeros((m, n), dtype=dtype)
        H = jnp.zeros((m + 1, m), dtype=dtype)

        def step(j, carry):
            V, Z, H = carry
            z = M(V[j])
            w = matvec(z)
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h1 = (V * w).sum(axis=1) * mask
            w = w - V.T @ h1
            h2 = (V * w).sum(axis=1) * mask
            w = w - V.T @ h2
            h = h1 + h2
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, eps_floor))
            Z = Z.at[j].set(z)
            H = H.at[:, j].set(h)
            H = H.at[j + 1, j].set(hj1)
            return (V, Z, H)

        V, Z, H = lax.fori_loop(0, m, step, (V, Z, H))
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        Q, R = jnp.linalg.qr(H, mode="reduced")
        rhs = Q.T @ g
        diag = jnp.diagonal(R)
        safe = jnp.where(jnp.abs(diag) > eps_floor, diag, 1.0)
        Rsafe = R + jnp.diag(safe - diag)
        y = jax.scipy.linalg.solve_triangular(Rsafe, rhs, lower=False)
        return x + Z.T @ y

    def cond(st):
        x, k, res, hist = st
        return (res > tol) & (k < max_cycles)

    def body(st):
        x, k, _, hist = st
        x = cycle(x)
        res = jnp.linalg.norm(b - matvec(x)) / bnorm
        hist = hist.at[k].set(res)
        return (x, k + 1, res, hist)

    res0 = jnp.linalg.norm(b - matvec(x)) / bnorm
    hist0 = jnp.full(max_cycles, res0, dtype=bnorm.dtype)
    x, k, res, hist = lax.while_loop(cond, body, (x, jnp.int32(0), res0, hist0))
    hist = jnp.where(jnp.arange(max_cycles) < k, hist, res)
    return SolveResult(x, k * m, res, res <= tol, hist)


# ---------------------------------------------------------------------------
# BiCGStab
# ---------------------------------------------------------------------------


def bicgstab(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Preconditioned BiCGStab (parity: KSPType.BCGS, ``Solver/utils.py:105``)."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    r = b - matvec(x)
    rhat = r
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)

    def cond(st):
        x, r, rho, alpha, omega, v, p, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter)

    def body(st):
        x, r, rho, alpha, omega, v, p, k = st
        rho_new = ddot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = matvec(phat)
        alpha = rho_new / ddot(rhat, v)
        s = r - alpha * v
        shat = M(s)
        t = matvec(shat)
        omega = ddot(t, s) / ddot(t, t)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, rho_new, alpha, omega, v, p, k + 1)

    x, r, *_, k = lax.while_loop(cond, body, (x, r, rho, alpha, omega, v, p, jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


# ---------------------------------------------------------------------------
# MINRES (symmetric indefinite; the saddle-point-native Krylov method)
# ---------------------------------------------------------------------------


def minres(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Preconditioned MINRES (Paige-Saunders) as one ``lax.while_loop``.

    For symmetric indefinite operators (Stokes/NS saddle points) with
    an SPD preconditioner.  The monitored residual is the
    M-preconditioned norm ``phibar`` (relative to its start), the
    standard MINRES estimate.
    """
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    r1 = b - matvec(x)
    y = M(r1)
    beta1 = jnp.sqrt(jnp.maximum(ddot(r1, y), 0.0))
    floor = jnp.maximum(beta1, 1e-300)

    zero = jnp.zeros((), b.dtype)
    st0 = (
        x, r1, r1, y,
        zero,            # oldb
        beta1,           # beta
        zero, zero,      # dbar, epsln
        beta1,           # phibar
        -jnp.ones((), b.dtype), zero,  # cs, sn
        jnp.zeros_like(b), jnp.zeros_like(b),  # w, w2
        jnp.int32(0),
    )

    def cond(st):
        phibar, k = st[8], st[13]
        return (phibar > tol * floor) & (k < maxiter)

    def body(st):
        (x, r1, r2, y, oldb, beta, dbar, epsln, phibar, cs, sn, w, w2, k) = st
        v = y / jnp.maximum(beta, 1e-300)
        y2 = matvec(v)
        y2 = jnp.where(k >= 1, y2 - (beta / jnp.maximum(oldb, 1e-300)) * r1, y2)
        alfa = ddot(v, y2)
        y2 = y2 - (alfa / jnp.maximum(beta, 1e-300)) * r2
        r1n, r2n = r2, y2
        yn = M(r2n)
        oldbn = beta
        betan = jnp.sqrt(jnp.maximum(ddot(r2n, yn), 0.0))
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsn = sn * betan
        dbarn = -cs * betan
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + betan * betan), 1e-300)
        csn, snn = gbar / gamma, betan / gamma
        phi = csn * phibar
        phibarn = snn * phibar
        w1 = w2
        w2n = w
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        xn = x + phi * wn
        return (xn, r1n, r2n, yn, oldbn, betan, dbarn, epsn, phibarn,
                csn, snn, wn, w2n, k + 1)

    st = lax.while_loop(cond, body, st0)
    x, k, phibar = st[0], st[13], st[8]
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    res = jnp.linalg.norm(b - matvec(x)) / bnorm
    return SolveResult(x, k, res, phibar <= tol * floor)


# ---------------------------------------------------------------------------
# Richardson / Chebyshev (the PETSc smoother-type KSPs)
# ---------------------------------------------------------------------------


def richardson(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    omega: float = 1.0,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Damped preconditioned Richardson: ``x += omega M(b - A x)``."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)

    def cond(st):
        x, r, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter)

    def body(st):
        x, r, k = st
        x = x + omega * M(r)
        return x, b - matvec(x), k + 1

    r0 = b - matvec(x)
    x, r, k = lax.while_loop(cond, body, (x, r0, jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


def chebyshev(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    lmin: float,
    lmax: float,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Chebyshev iteration on the (preconditioned) spectrum
    ``[lmin, lmax]`` — the matvec-only smoother/solver (no inner
    products beyond the stopping check), ideal for multigrid smoothing
    and for avoiding reduction latency on device meshes."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    d = 0.5 * (lmax + lmin)
    c = 0.5 * (lmax - lmin)

    r0 = b - matvec(x)
    st0 = (x, r0, jnp.zeros_like(b), jnp.zeros((), b.dtype), jnp.int32(0))

    def cond(st):
        x, r, p, alpha, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter)

    def body(st):
        x, r, p, alpha, k = st
        z = M(r)
        beta = jnp.where(
            k == 0, 0.0,
            jnp.where(k == 1, 0.5 * (c * alpha) ** 2, (0.5 * c * alpha) ** 2),
        )
        alpha_n = jnp.where(k == 0, 1.0 / d, 1.0 / (d - beta / alpha))
        p = z + beta * p
        x = x + alpha_n * p
        r = r - alpha_n * matvec(p)
        return x, r, p, alpha_n, k + 1

    x, r, _, _, k = lax.while_loop(cond, body, st0)
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


# ---------------------------------------------------------------------------
# KSP breadth tail (parity: the remaining KSPType members,
# Solver/utils.py:96-128)
# ---------------------------------------------------------------------------


def bicg(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    rmatvec: Matvec,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Preconditioned BiCG (parity: KSPType.BICG, ``Solver/utils.py:103``).

    ``rmatvec`` applies the transpose operator; the preconditioner is
    assumed symmetric (true for the diagonal/block-diagonal PCs here),
    so the adjoint chain reuses ``M``."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    r = b - matvec(x)
    rt = r
    z, zt = M(r), M(rt)
    p, pt = z, zt
    rho = ddot(z, rt)

    def cond(st):
        x, r, rt, p, pt, rho, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter)

    def body(st):
        x, r, rt, p, pt, rho, k = st
        q = matvec(p)
        qt = rmatvec(pt)
        alpha = rho / ddot(pt, q)
        x = x + alpha * p
        r = r - alpha * q
        rt = rt - alpha * qt
        z, zt = M(r), M(rt)
        rho_new = ddot(z, rt)
        beta = rho_new / rho
        p = z + beta * p
        pt = zt + beta * pt
        return x, r, rt, p, pt, rho_new, k + 1

    x, r, *_, k = lax.while_loop(cond, body, (x, r, rt, p, pt, rho, jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


def cgs(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Conjugate gradient squared — transpose-free BiCG variant
    (parity: KSPType.CGS, ``Solver/utils.py:115``)."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    r = b - matvec(x)
    rt = r
    rho = jnp.asarray(1.0, b.dtype)
    u = p = q = jnp.zeros_like(b)

    def cond(st):
        x, r, u, p, q, rho, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter)

    def body(st):
        x, r, u, p, q, rho, k = st
        rho_new = ddot(rt, r)
        beta = jnp.where(k == 0, 0.0, rho_new / rho)
        u = r + beta * q
        p = u + beta * (q + beta * p)
        phat = M(p)
        v = matvec(phat)
        alpha = rho_new / ddot(rt, v)
        q = u - alpha * v
        uq = M(u + q)
        x = x + alpha * uq
        r = r - alpha * matvec(uq)
        return x, r, u, p, q, rho_new, k + 1

    x, r, *_, k = lax.while_loop(cond, body, (x, r, u, p, q, rho, jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


def _gcr_cycle(matvec, M, x, r, seeds, restart):
    """One GCR cycle: minimize ||r|| over ``restart`` directions.

    Directions are ``seeds`` rows while their flags are set (subspace
    augmentation), then preconditioned residuals.  Stored as
    (restart, n) D / AD with AD rows orthonormal, so per-step
    orthogonalization is one (m, n) x (n,) matmul — MXU work, same
    shape as the GMRES basis product."""
    n = r.shape[0]
    D = jnp.zeros((restart, n), r.dtype)
    AD = jnp.zeros((restart, n), r.dtype)
    seed_vecs, nseed = seeds

    def step(j, carry):
        x, r, D, AD = carry
        d = jnp.where(j < nseed, seed_vecs[jnp.minimum(j, seed_vecs.shape[0] - 1)], M(r))
        Ad = matvec(d)
        # two-pass (CGS2) projection against the stored AD rows
        for _ in range(2):
            c = AD @ Ad
            d = d - c @ D
            Ad = Ad - c @ AD
        nrm = jnp.sqrt(ddot(Ad, Ad))
        ok = nrm > 1e-300
        inv = jnp.where(ok, 1.0 / jnp.maximum(nrm, 1e-300), 0.0)
        d, Ad = d * inv, Ad * inv
        alpha = ddot(Ad, r)
        x = x + alpha * d
        r = r - alpha * Ad
        D = D.at[j].set(d)
        AD = AD.at[j].set(Ad)
        return x, r, D, AD

    return lax.fori_loop(0, restart, step, (x, r, D, AD))[:2]


def gcr(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    restart: int = 30,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """Restarted generalized conjugate residual (parity: KSPType.GCR,
    ``Solver/utils.py:117``).  Flexible — the preconditioner may vary
    between applications, same as FGMRES."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    r = b - matvec(x)
    no_seed = (jnp.zeros((1, b.shape[0]), b.dtype), jnp.int32(0))
    max_cycles = max(1, -(-maxiter // restart))

    def cond(st):
        x, r, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < max_cycles)

    def body(st):
        x, r, k = st
        x, r = _gcr_cycle(matvec, M, x, r, no_seed, restart)
        return x, r, k + 1

    x, r, k = lax.while_loop(cond, body, (x, r, jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k * restart, res, res <= tol)


def lgmres(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    restart: int = 30,
    aug: int = 2,
    maxiter: int = 1000,
    M: Matvec | None = None,
) -> SolveResult:
    """LGMRES-style augmented restart (parity: KSPType.LGMRES,
    ``Solver/utils.py:127``): each cycle's subspace is seeded with the
    previous ``aug`` cycles' error approximations z = x_new - x_old,
    which restores the cross-restart directions plain GMRES forgets
    (Baker-Jessup-Manteuffel).  Implemented in GCR (residual-minimizing,
    flexible) form so augmentation is just extra seed directions —
    the same (restart+1, n)-buffer MXU layout as the GMRES basis."""
    M = M or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    r = b - matvec(x)
    Z = jnp.zeros((max(aug, 1), b.shape[0]), b.dtype)
    max_cycles = max(1, -(-maxiter // restart))

    def cond(st):
        x, r, Z, nz, k = st
        return (jnp.linalg.norm(r) / bnorm > tol) & (k < max_cycles)

    def body(st):
        x, r, Z, nz, k = st
        x_new, r_new = _gcr_cycle(matvec, M, x, r, (Z, nz), restart)
        z = x_new - x
        Z = jnp.roll(Z, 1, axis=0).at[0].set(z)
        nz = jnp.minimum(nz + 1, jnp.int32(max(aug, 1)))
        return x_new, r_new, Z, nz, k + 1

    x, r, _, _, k = lax.while_loop(cond, body, (x, r, Z, jnp.int32(0), jnp.int32(0)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k * restart, res, res <= tol)


def lsqr(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    rmatvec: Matvec,
    tol: float = 1e-10,
    maxiter: int = 1000,
) -> SolveResult:
    """LSQR — Golub-Kahan bidiagonalization least-squares solver
    (parity: KSPType.LSQR, ``Solver/utils.py:125``; unpreconditioned,
    as is PETSc's default)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    u = b - matvec(x)
    beta = jnp.sqrt(ddot(u, u))
    u = u / jnp.maximum(beta, 1e-300)
    v = rmatvec(u)
    alpha = jnp.sqrt(ddot(v, v))
    v = v / jnp.maximum(alpha, 1e-300)
    w = v
    phibar, rhobar = beta, alpha

    def cond(st):
        x, u, v, w, alpha, phibar, rhobar, k = st
        return (phibar / bnorm > tol) & (k < maxiter)

    def body(st):
        x, u, v, w, alpha, phibar, rhobar, k = st
        u = matvec(v) - alpha * u
        beta = jnp.sqrt(ddot(u, u))
        u = u / jnp.maximum(beta, 1e-300)
        v_new = rmatvec(u) - beta * v
        alpha_new = jnp.sqrt(ddot(v_new, v_new))
        v_new = v_new / jnp.maximum(alpha_new, 1e-300)
        rho = jnp.sqrt(rhobar**2 + beta**2)
        c, s = rhobar / rho, beta / rho
        theta = s * alpha_new
        rhobar_new = -c * alpha_new
        phi = c * phibar
        phibar_new = s * phibar
        x = x + (phi / rho) * w
        w = v_new - (theta / rho) * w
        return x, u, v_new, w, alpha_new, phibar_new, rhobar_new, k + 1

    x, *_, phibar, _, k = lax.while_loop(
        cond, body, (x, u, v, w, alpha, phibar, rhobar, jnp.int32(0)))
    r = b - matvec(x)
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


def qcg(
    matvec: Matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Matvec | None = None,
    radius: float | None = None,
) -> SolveResult:
    """Trust-region preconditioned CG (parity: KSPType.QCG,
    ``Solver/utils.py:113``): plain PCG until the iterate would leave
    the trust ball ||x|| <= radius, then step exactly to the boundary
    and stop (Steihaug-Toint).  ``radius=None`` behaves as CG."""
    M = M or _identity
    rad = jnp.asarray(float("inf") if radius is None else float(radius), b.dtype)
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-300)
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = ddot(r, z)

    def cond(st):
        x, r, p, rz, k, on_boundary = st
        return (
            (jnp.linalg.norm(r) / bnorm > tol) & (k < maxiter) & (~on_boundary)
        )

    def body(st):
        x, r, p, rz, k, _ = st
        Ap = matvec(p)
        alpha = rz / ddot(p, Ap)
        # boundary intersection: smallest tau > 0 with ||x + tau p|| = rad
        xx, xp, pp = ddot(x, x), ddot(x, p), ddot(p, p)
        disc = jnp.maximum(xp**2 + pp * (rad**2 - xx), 0.0)
        tau = (-xp + jnp.sqrt(disc)) / jnp.maximum(pp, 1e-300)
        crosses = jnp.isfinite(rad) & (alpha > tau)
        step = jnp.where(crosses, tau, alpha)
        x = x + step * p
        r = r - step * Ap
        z = M(r)
        rz_new = ddot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, p, rz_new, k + 1, crosses

    x, r, _, _, k, _ = lax.while_loop(
        cond, body, (x, r, p, rz, jnp.int32(0), jnp.asarray(False)))
    res = jnp.linalg.norm(r) / bnorm
    return SolveResult(x, k, res, res <= tol)


# ---------------------------------------------------------------------------
# Unified front-end (parity: LinearSolver.solve, Solver/linear.py:38-87)
# ---------------------------------------------------------------------------


def solve(
    matvec: Matvec,
    b: jnp.ndarray,
    *,
    ksp_type: KSPType | str = KSPType.GMRES,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-10,
    maxiter: int = 1000,
    restart: int = 30,
    M: Matvec | None = None,
    rmatvec: Matvec | None = None,
    lmin: float | None = None,
    lmax: float | None = None,
    radius: float | None = None,
) -> SolveResult:
    ksp_type = KSPType.from_string(ksp_type) if isinstance(ksp_type, str) else ksp_type
    if ksp_type is KSPType.CG:
        return cg(matvec, b, x0, tol=tol, maxiter=maxiter, M=M)
    if ksp_type is KSPType.FGMRES:
        return fgmres(matvec, b, x0, tol=tol, restart=restart, maxiter=maxiter, M=M)
    if ksp_type is KSPType.GMRES:
        return gmres(matvec, b, x0, tol=tol, maxiter=maxiter, restart=restart, M=M)
    if ksp_type is KSPType.BICGSTAB:
        return bicgstab(matvec, b, x0, tol=tol, maxiter=maxiter, M=M)
    if ksp_type is KSPType.MINRES:
        return minres(matvec, b, x0, tol=tol, maxiter=maxiter, M=M)
    if ksp_type is KSPType.RICHARDSON:
        return richardson(matvec, b, x0, tol=tol, maxiter=maxiter, M=M)
    if ksp_type is KSPType.CHEBYSHEV:
        if lmin is None or lmax is None:
            raise ValueError("CHEBYSHEV requires lmin/lmax spectrum bounds.")
        return chebyshev(matvec, b, x0, lmin=lmin, lmax=lmax, tol=tol,
                         maxiter=maxiter, M=M)
    if ksp_type is KSPType.CGS:
        return cgs(matvec, b, x0, tol=tol, maxiter=maxiter, M=M)
    if ksp_type is KSPType.GCR:
        return gcr(matvec, b, x0, tol=tol, restart=restart, maxiter=maxiter, M=M)
    if ksp_type is KSPType.LGMRES:
        return lgmres(matvec, b, x0, tol=tol, restart=restart, maxiter=maxiter, M=M)
    if ksp_type is KSPType.QCG:
        return qcg(matvec, b, x0, tol=tol, maxiter=maxiter, M=M, radius=radius)
    if ksp_type in (KSPType.BICG, KSPType.LSQR):
        if rmatvec is None:
            raise ValueError(f"{ksp_type.name} requires rmatvec (transpose apply).")
        if ksp_type is KSPType.BICG:
            return bicg(matvec, b, x0, rmatvec=rmatvec, tol=tol, maxiter=maxiter, M=M)
        return lsqr(matvec, b, x0, rmatvec=rmatvec, tol=tol, maxiter=maxiter)
    if ksp_type is KSPType.PREONLY:
        if M is None:
            raise ValueError("PREONLY requires a preconditioner.")
        x = M(b)
        r = jnp.linalg.norm(b - matvec(x)) / jnp.maximum(jnp.linalg.norm(b), 1e-300)
        return SolveResult(x, jnp.int32(1), r, r < 1.0)
    raise ValueError(ksp_type)


@partial(
    jax.jit,
    static_argnames=("ksp_type", "pc_kind", "tol", "maxiter", "restart"),
)
def solve_csr(
    A,
    b: jnp.ndarray,
    pc_arr: jnp.ndarray | None = None,
    *,
    ksp_type: str = "gmres",
    pc_kind: str = "none",
    tol: float = 1e-10,
    maxiter: int = 1000,
    restart: int = 30,
) -> SolveResult:
    """Jitted sparse solve with the operator and preconditioner arrays as
    arguments (the TPU compilation contract — never close over matrix
    data at a jit/while_loop boundary)."""
    from lsafw_tpu.ops.sparse import spmv
    from lsafw_tpu.solver.precond import apply_pc

    M = None if pc_kind == "none" else (lambda x: apply_pc(pc_kind, pc_arr, x))
    return solve(
        lambda v: spmv(A, v), b,
        ksp_type=KSPType.from_string(ksp_type), tol=tol, maxiter=maxiter,
        restart=restart, M=M,
    )
