"""Device-resident shift-invert inverse iteration over stencil operators.

The fully-jitted eigensolver path: outer inverse iteration and the
inner CG solve both live inside one XLA program (no per-step host
dispatch — essential on high-latency runtimes, see bench.py), with the
operator applies being gather-free stencil FMAs.  This is the
"time-to-leading-eigenpair on TPU" building block; the general
Krylov-Schur (``solver/eigen.py``) remains the multi-eigenvalue
workhorse.

Requires SPD (K - sigma M) — i.e. sigma below the smallest eigenvalue
for SPD pencils like the membrane EVP (``models/membrane.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from lsafw_tpu.ops.stencil import StencilOperator


class PowerResult(NamedTuple):
    eigenvalue: jnp.ndarray
    eigenvector: jnp.ndarray  # packed layout
    iterations: jnp.ndarray
    residual: jnp.ndarray  # |K x - lam M x| / |x|


def _cg_fixed(matvec, b, x0, iters: int, inv_diag):
    """Fixed-iteration preconditioned CG (jit-friendly inner solve)."""

    def body(i, st):
        x, r, z, p, rz = st
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new)

    r0 = b - matvec(x0)
    z0 = inv_diag * r0
    st = (x0, r0, z0, z0, jnp.vdot(r0, z0))
    x, *_ = lax.fori_loop(0, iters, body, st)
    return x


@jax.jit
def lobpcg_smallest(
    K: StencilOperator,
    M: StencilOperator,
    x0: jnp.ndarray,
    inv_diag: jnp.ndarray,
    tol: float = 1e-10,
    max_iter: int = 500,
) -> PowerResult:
    """Smallest eigenpair of the SPD pencil K x = lam M x by
    single-vector LOBPCG (locally optimal preconditioned CG): each
    iteration Rayleigh-Ritzes over span{x, T r, p} — two operator
    applies per iteration instead of a full inner solve, an order of
    magnitude fewer matvecs than inverse iteration."""

    def rayleigh(x):
        return jnp.vdot(x, K.matvec(x)) / jnp.vdot(x, M.matvec(x))

    def rr3(S):
        """Rayleigh-Ritz on the (n, 3) subspace S: smallest Ritz pair."""
        KS = jnp.stack([K.matvec(S[:, i]) for i in range(3)], axis=1)
        MS = jnp.stack([M.matvec(S[:, i]) for i in range(3)], axis=1)
        A3 = S.T @ KS
        B3 = S.T @ MS
        # robust generalized 3x3 solve: whiten B3 (guard rank loss)
        lb, Q = jnp.linalg.eigh(0.5 * (B3 + B3.T))
        # deflate rank-deficient directions to +inf: duplicated/null
        # columns must never masquerade as small Ritz values
        valid = lb > 1e-10 * jnp.max(lb)
        W = Q * jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, lb, 1.0)), 0.0)[None, :]
        Aw = W.T @ (0.5 * (A3 + A3.T)) @ W + jnp.diag(jnp.where(valid, 0.0, 1e30))
        lam3, Y = jnp.linalg.eigh(Aw)
        y = W @ Y[:, 0]
        return lam3[0], y, S @ y, KS @ y, MS @ y

    x = x0 / jnp.linalg.norm(x0)
    lam = rayleigh(x)
    p = jnp.zeros_like(x)

    def cond(st):
        x, lam, p, res, it = st
        return (res > tol) & (it < max_iter)

    def body(st):
        x, lam, p, _, it = st
        r = K.matvec(x) - lam * M.matvec(x)
        w = inv_diag * r
        w = w / jnp.linalg.norm(w)
        pn = jnp.where(jnp.linalg.norm(p) > 0, p, w)
        S = jnp.stack([x, w, pn], axis=1)
        lam_new, y, x_new, Kx, Mx = rr3(S)
        nrm = jnp.linalg.norm(x_new)
        x_new = x_new / nrm
        # locally-optimal recurrence: p carries the (w, p) components
        p_new = (S[:, 1:] @ y[1:]) / nrm
        res = jnp.linalg.norm(Kx - lam_new * Mx) / jnp.maximum(jnp.linalg.norm(Mx), 1e-30)
        return (x_new, lam_new, p_new, res, it + 1)

    x, lam, p, res, it = lax.while_loop(cond, body, (x, lam, p, jnp.inf, 0))
    return PowerResult(eigenvalue=lam, eigenvector=x, iterations=it, residual=res)


@jax.jit
def lobpcg_smallest_pc(
    K: StencilOperator,
    M: StencilOperator,
    x0: jnp.ndarray,
    pc,
    tol: float = 1e-10,
    max_iter: int = 500,
) -> PowerResult:
    """LOBPCG with a general preconditioner pytree exposing
    ``pc.apply(r)`` (e.g. :class:`lsafw_tpu.solver.multigrid.MultigridPC`)."""

    def rayleigh(x):
        return jnp.vdot(x, K.matvec(x)) / jnp.vdot(x, M.matvec(x))

    def rr3(S):
        KS = jnp.stack([K.matvec(S[:, i]) for i in range(3)], axis=1)
        MS = jnp.stack([M.matvec(S[:, i]) for i in range(3)], axis=1)
        A3 = S.T @ KS
        B3 = S.T @ MS
        lb, Q = jnp.linalg.eigh(0.5 * (B3 + B3.T))
        # deflate rank-deficient directions to +inf: duplicated/null
        # columns must never masquerade as small Ritz values
        valid = lb > 1e-10 * jnp.max(lb)
        W = Q * jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, lb, 1.0)), 0.0)[None, :]
        Aw = W.T @ (0.5 * (A3 + A3.T)) @ W + jnp.diag(jnp.where(valid, 0.0, 1e30))
        lam3, Y = jnp.linalg.eigh(Aw)
        y = W @ Y[:, 0]
        return lam3[0], y, S @ y, KS @ y, MS @ y

    x = x0 / jnp.linalg.norm(x0)
    lam = rayleigh(x)
    p = jnp.zeros_like(x)

    def cond(st):
        x, lam, p, res, it = st
        return (res > tol) & (it < max_iter)

    def body(st):
        x, lam, p, _, it = st
        r = K.matvec(x) - lam * M.matvec(x)
        w = pc.apply(r)
        w = w / jnp.linalg.norm(w)
        pn = jnp.where(jnp.linalg.norm(p) > 0, p, w)
        S = jnp.stack([x, w, pn], axis=1)
        lam_new, y, x_new, Kx, Mx = rr3(S)
        nrm = jnp.linalg.norm(x_new)
        x_new = x_new / nrm
        # locally-optimal recurrence: p carries the (w, p) components
        p_new = (S[:, 1:] @ y[1:]) / nrm
        res = jnp.linalg.norm(Kx - lam_new * Mx) / jnp.maximum(jnp.linalg.norm(Mx), 1e-30)
        return (x_new, lam_new, p_new, res, it + 1)

    x, lam, p, res, it = lax.while_loop(cond, body, (x, lam, p, jnp.inf, 0))
    return PowerResult(eigenvalue=lam, eigenvector=x, iterations=it, residual=res)


@jax.jit
def shift_invert_power(
    K: StencilOperator,
    M: StencilOperator,
    sigma,
    x0: jnp.ndarray,
    inv_diag: jnp.ndarray,
    tol: float = 1e-10,
    max_outer: int = 100,
    cg_iters: int = 200,
) -> PowerResult:
    """Leading eigenpair of K x = lam M x nearest ``sigma``.

    All operands are jit arguments; K and M must share their stencil
    structure (same sparsity pattern), so (K - sigma M) is an
    elementwise coefficient combination.
    """
    C = StencilOperator(K.structure, K.coeffs - sigma * M.coeffs, K.bc_mask, K.bc_diag)

    def rayleigh(x):
        Kx = K.matvec(x)
        Mx = M.matvec(x)
        return jnp.vdot(x, Kx) / jnp.vdot(x, Mx), Kx, Mx

    def cond(st):
        x, lam, dl, it = st
        return (dl > tol) & (it < max_outer)

    def body(st):
        x, lam, _, it = st
        b = M.matvec(x)
        y = _cg_fixed(C.matvec, b, x, cg_iters, inv_diag)
        y = y / jnp.linalg.norm(y)
        lam_new, _, _ = rayleigh(y)
        return (y, lam_new, jnp.abs(lam_new - lam), it + 1)

    x0 = x0 / jnp.linalg.norm(x0)
    lam0, _, _ = rayleigh(x0)
    x, lam, dl, it = lax.while_loop(cond, body, (x0, lam0, jnp.inf, 0))
    _, Kx, Mx = rayleigh(x)
    res = jnp.linalg.norm(Kx - lam * Mx)
    return PowerResult(eigenvalue=lam, eigenvector=x, iterations=it, residual=res)
