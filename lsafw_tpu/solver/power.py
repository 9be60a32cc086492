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

from lsafw_tpu.ops.dots import ddot
from lsafw_tpu.ops.stencil import StencilOperator


class PowerResult(NamedTuple):
    eigenvalue: jnp.ndarray
    eigenvector: jnp.ndarray  # packed layout
    iterations: jnp.ndarray
    residual: jnp.ndarray  # |K x - lam M x| / |x|


def _eigh_small(A: jnp.ndarray, sweeps: int = 8):
    """Symmetric kxk eigendecomposition by cyclic Jacobi rotations.

    The TPU backend's ``jnp.linalg.eigh`` under emulated f64 carries
    ~1e-7 residuals (measured; CPU gives 1e-15), which wrecks LOBPCG's
    Rayleigh-Ritz.  Plain f64 arithmetic on TPU is accurate, so cyclic
    explicit Jacobi sweeps recover full precision.  Returns (w, V)
    with eigenvalues ascending.  Intended for the small Ritz blocks
    (k = 3 for single-vector LOBPCG, 3m for the blocked solver); the
    scan is k(k-1)/2 * sweeps steps of kxk matmuls.

    TPU's emulated f64 carries the f32 exponent range, so tau**2
    overflows around |tau| ~ 1e19; for large |tau| the rotation is
    t ~ 1/(2 tau), which the guarded branch below uses instead.
    """
    k = A.shape[0]
    V = jnp.eye(k, dtype=A.dtype)

    def rotate(AV, pq):
        A, V = AV
        p, q = pq
        apq = A[p, q]
        tau = (A[q, q] - A[p, p]) / (2.0 * jnp.where(apq == 0, 1.0, apq))
        tau_c = jnp.clip(tau, -1e15, 1e15)
        t = jnp.sign(tau_c) / (jnp.abs(tau_c) + jnp.sqrt(1.0 + tau_c * tau_c))
        t = jnp.where(jnp.abs(tau) > 1e15, 0.5 / tau, t)
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        R = jnp.eye(k, dtype=A.dtype)
        R = R.at[p, p].set(c).at[q, q].set(c).at[p, q].set(s).at[q, p].set(-s)
        return (R.T @ A @ R, V @ R), None

    pairs = [(p, q) for p in range(k) for q in range(p + 1, k)] * sweeps
    (A, V), _ = lax.scan(rotate, (A, V), jnp.asarray(pairs))
    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]


def _eigh3(A: jnp.ndarray):
    """3x3 case of :func:`_eigh_small` (kept as the single-vector
    LOBPCG's Ritz solve)."""
    return _eigh_small(A, sweeps=8)


def _cg_fixed(matvec, b, x0, iters: int, inv_diag):
    """Fixed-iteration preconditioned CG (jit-friendly inner solve)."""

    def body(i, st):
        x, r, z, p, rz = st
        Ap = matvec(p)
        alpha = rz / ddot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = ddot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new)

    r0 = b - matvec(x0)
    z0 = inv_diag * r0
    st = (x0, r0, z0, z0, ddot(r0, z0))
    x, *_ = lax.fori_loop(0, iters, body, st)
    return x


def _lobpcg_core(K, M, x0, apply_pc, tol, max_iter) -> PowerResult:
    """Single-vector LOBPCG over span{x, T r, p} with basis
    M-orthonormalization (the Hetmaniuk-Lehoucq stabilization).

    The textbook formulation whitens the 3x3 Gram matrix B3 = S^T M S,
    which near convergence is nearly singular; the 1/sqrt(lb) scaling
    then amplifies any 3x3-eigensolver error by the condition number —
    on TPU's emulated f64 (eigh residual ~1e-13) that floors the
    eigenresidual at ~1e-7..1e-4 (measured).  Orthonormalizing
    [x, w, p] in the M inner product at the *vector* level (CGS2,
    n-vector arithmetic at ~1e-15) makes B3 = I to roundoff, so the
    Ritz problem is a well-conditioned standard 3x3 solve.

    K*/M* products are recomputed FRESH on the final orthonormalized
    columns every iteration.  Tracking them linearly through the
    projections (the cheap variant) is unstable: near convergence the
    w column is renormalized by 1/nw ~ 1e9, which amplifies the
    tracked-product rounding into a drift between the carried Kx and
    the true K @ x, and the iteration stalls on a spurious fixed point
    (measured: eigenresidual floor 1e-7 on TPU) or diverges after
    convergence (measured on CPU).  Fresh products make A3 the exact
    Gram matrix of the actual basis, so Ritz values are true Rayleigh
    quotients and the iteration is unconditionally monotone.  Cost:
    3 K + 5 M matvecs per iteration instead of 1 + 1 — negligible next
    to the preconditioner V-cycle.
    """

    def mdot(a, Mb):
        return ddot(a, Mb)

    def mnorm(v, Mv):
        return jnp.sqrt(jnp.maximum(mdot(v, Mv), 0.0))

    def orthonormalize(v, against):
        """M-orthonormalize v against M-orthonormal (u, Ku, Mu) columns.

        CGS2 with tracked Mv for the projection coefficients, then
        FRESH K v / M v matvecs on the normalized vector, plus one
        fresh-product touch-up pass (coefficients ~eps, so no
        amplification).  Returns (v, Kv, Mv, ok); dead columns
        (rank-deficient after projection) come back as zeros with
        ok=False.
        """
        Mv = M.matvec(v)
        n0 = mnorm(v, Mv)
        for _ in range(2):
            for u, Ku, Mu in against:
                a = mdot(u, Mv)
                v, Mv = v - a * u, Mv - a * Mu
        n1 = mnorm(v, Mv)
        ok = n1 > 1e-8 * n0
        s = jnp.where(ok, 1.0 / jnp.where(ok, n1, 1.0), 0.0)
        v = v * s
        Kv = K.matvec(v)
        Mv = M.matvec(v)
        for u, Ku, Mu in against:
            a = mdot(u, Mv)
            v, Kv, Mv = v - a * u, Kv - a * Ku, Mv - a * Mu
        n2 = mnorm(v, Mv)
        ok = ok & (n2 > 0.5)
        s2 = jnp.where(ok, 1.0 / jnp.where(ok, n2, 1.0), 0.0)
        return v * s2, Kv * s2, Mv * s2, ok

    x = x0
    Kx = K.matvec(x)
    Mx = M.matvec(x)
    nx = mnorm(x, Mx)
    x, Kx, Mx = x / nx, Kx / nx, Mx / nx
    lam = mdot(x, Kx)
    z = jnp.zeros_like(x)

    # stop on tol, max_iter, or stagnation: on TPU's emulated f64 the
    # reachable residual floor (~1e-9 at 5e5 DOFs) can sit above a
    # 1e-10 tol, and burning the remaining iterations at the floor
    # costs more time than the whole convergent phase.  Tuned to be
    # conservative: 25 iterations with <2% improvement on the best
    # residual, armed only within 4 decades of tol — a slow
    # condition-bound run (Jacobi PC at kappa ~ 1e5 improves ~6%/iter
    # with oscillations) must never be mistaken for the floor.
    def cond(st):
        x, Kx, Mx, lam, p, res, it, best, stall = st
        stagnated = (stall >= 25) & (res <= 1e4 * tol)
        return (res > tol) & (it < max_iter) & ~stagnated

    def body(st):
        x, Kx, Mx, lam, p, _, it, best, stall = st
        r = Kx - lam * Mx
        w = apply_pc(r)
        w, Kw, Mw, ok_w = orthonormalize(w, [(x, Kx, Mx)])
        p, Kp, Mp, ok_p = orthonormalize(p, [(x, Kx, Mx), (w, Kw, Mw)])

        # --- standard 3x3 Ritz problem (B3 = I to roundoff) ---
        # Gram entries via explicit vdots, NOT a stacked (n,3) matmul:
        # on TPU the emulated-f64 matmul reduction carries ~2^-24-level
        # relative error for ill-scaled data (measured: A3[0,0] off by
        # 1.2e-7 while vdot on the same vectors is exact to 1e-12),
        # which floors the eigenvalue accuracy at f32 grade.
        a00 = ddot(x, Kx)
        a01 = ddot(x, Kw)
        a02 = ddot(x, Kp)
        a11 = ddot(w, Kw)
        a12 = ddot(w, Kp)
        a22 = ddot(p, Kp)
        A3 = jnp.asarray([[a00, a01, a02], [a01, a11, a12], [a02, a12, a22]])
        dead = jnp.asarray([False, ~ok_w, ~ok_p])
        A3 = A3 + jnp.diag(jnp.where(dead, 1e30, 0.0))
        lam3, Y = _eigh3(A3)
        y = Y[:, 0]

        p_new = w * y[1] + p * y[2]
        x_new = x * y[0] + p_new
        Kx_new = K.matvec(x_new)
        Mx_new = M.matvec(x_new)
        nrm = mnorm(x_new, Mx_new)
        x_new, Kx_new, Mx_new = x_new / nrm, Kx_new / nrm, Mx_new / nrm
        # the returned eigenvalue is the FRESH Rayleigh quotient of the
        # new iterate, not the 3x3 Ritz value: the Ritz solve only
        # picks the direction, so any residual error in A3 cannot leak
        # into the eigenvalue or the convergence test
        lam_new = mdot(x_new, Kx_new)
        res = jnp.linalg.norm(Kx_new - lam_new * Mx_new) / jnp.maximum(
            jnp.linalg.norm(Mx_new), 1e-30
        )
        improved = res < 0.98 * best
        best_new = jnp.minimum(best, res)
        stall_new = jnp.where(improved, 0, stall + 1)
        return (x_new, Kx_new, Mx_new, lam_new, p_new, res, it + 1, best_new, stall_new)

    st0 = (x, Kx, Mx, lam, z, jnp.inf, 0, jnp.inf, 0)
    x, Kx, Mx, lam, p, res, it, _, _ = lax.while_loop(cond, body, st0)
    return PowerResult(eigenvalue=lam, eigenvector=x, iterations=it, residual=res)


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
    return _lobpcg_core(K, M, x0, lambda r: inv_diag * r, tol, max_iter)


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
    return _lobpcg_core(K, M, x0, pc.apply, tol, max_iter)


class BlockPowerResult(NamedTuple):
    eigenvalues: jnp.ndarray  # (m,) ascending Ritz values
    eigenvectors: jnp.ndarray  # (m, n) packed rows
    iterations: jnp.ndarray
    residuals: jnp.ndarray  # (m,) |K x - lam M x| / |M x|


def _orthonormalize_col(K, M, v, against):
    """M-orthonormalize ``v`` against M-orthonormal ``(u, Ku, Mu)``
    columns — the blocked counterpart of the nested helper in
    :func:`_lobpcg_core` (same CGS2 + fresh-product design, see the
    rationale there).  Dead columns (rank-deficient after projection)
    come back as zeros with ok=False; zeros project to zero so dead
    columns are safe to keep in ``against`` lists."""

    def mdot(a, Mb):
        return ddot(a, Mb)

    Mv = M.matvec(v)
    n0 = jnp.sqrt(jnp.maximum(mdot(v, Mv), 0.0))
    for _ in range(2):
        for u, Ku, Mu in against:
            a = mdot(u, Mv)
            v, Mv = v - a * u, Mv - a * Mu
    n1 = jnp.sqrt(jnp.maximum(mdot(v, Mv), 0.0))
    ok = n1 > 1e-8 * n0
    s = jnp.where(ok, 1.0 / jnp.where(ok, n1, 1.0), 0.0)
    v = v * s
    Kv = K.matvec(v)
    Mv = M.matvec(v)
    for u, Ku, Mu in against:
        a = mdot(u, Mv)
        v, Kv, Mv = v - a * u, Kv - a * Ku, Mv - a * Mu
    n2 = jnp.sqrt(jnp.maximum(mdot(v, Mv), 0.0))
    ok = ok & (n2 > 0.5)
    s2 = jnp.where(ok, 1.0 / jnp.where(ok, n2, 1.0), 0.0)
    return v * s2, Kv * s2, Mv * s2, ok


def _lobpcg_block_core(K, M, X0, apply_pc, tol, max_iter) -> BlockPowerResult:
    """Blocked (multi-pair) LOBPCG: Rayleigh-Ritz over the 3m-column
    basis [X, W, P] per iteration.

    Numerical design is inherited from the hardened single-vector core
    (:func:`_lobpcg_core`): vector-level CGS2 M-orthonormalization of
    the whole basis (so the Ritz problem is a *standard* 3m x 3m
    eigenproblem, B = I to roundoff), FRESH K/M products on the final
    orthonormalized columns, Gram entries via explicit VPU ddots (the
    emulated-f64 MXU matmul reduction drops the low word), and the
    full-precision Jacobi :func:`_eigh_small` for the Ritz solve.
    Dead basis columns (converged W directions, the first iteration's
    zero P) are masked with a 1e30 diagonal so they sort past every
    live Ritz value.

    Convergence is on the max per-pair residual; the stagnation guard
    matches the single-vector core (TPU emulated-f64 residual floor).

    Parity: SLEPc's LOBPCG/Krylov-Schur multi-pair paths for the
    membrane/elasticity SPD pencils
    (/root/reference/Solver/eigen.py EPS with nev>1).
    """
    m = X0.shape[0]

    # --- initial M-orthonormal block + Rayleigh quotients ---
    cols = []
    for i in range(m):
        v, Kv, Mv, _ok = _orthonormalize_col(K, M, X0[i], cols)
        cols.append((v, Kv, Mv))
    X = jnp.stack([c[0] for c in cols])
    KX = jnp.stack([c[1] for c in cols])
    MX = jnp.stack([c[2] for c in cols])
    lams = jnp.stack([ddot(c[0], c[1]) for c in cols])
    P = jnp.zeros_like(X)
    res0 = jnp.full((m,), jnp.inf, dtype=X.dtype)

    def cond(st):
        X, KX, MX, lams, P, res, it, best, stall = st
        maxres = jnp.max(res)
        stagnated = (stall >= 25) & (maxres <= 1e4 * tol)
        return (maxres > tol) & (it < max_iter) & ~stagnated

    def body(st):
        X, KX, MX, lams, P, _, it, best, stall = st
        basis = []  # (v, Kv, Mv) triples, M-orthonormal
        dead = []
        for i in range(m):
            v, Kv, Mv, ok = _orthonormalize_col(K, M, X[i], basis)
            basis.append((v, Kv, Mv))
            dead.append(~ok)
        for i in range(m):
            r = KX[i] - lams[i] * MX[i]
            w = apply_pc(r)
            v, Kv, Mv, ok = _orthonormalize_col(K, M, w, basis)
            basis.append((v, Kv, Mv))
            dead.append(~ok)
        for i in range(m):
            v, Kv, Mv, ok = _orthonormalize_col(K, M, P[i], basis)
            basis.append((v, Kv, Mv))
            dead.append(~ok)

        k = 3 * m
        A = jnp.zeros((k, k), dtype=X.dtype)
        for i in range(k):
            for j in range(i, k):
                a = ddot(basis[i][0], basis[j][1])
                A = A.at[i, j].set(a).at[j, i].set(a)
        A = A + jnp.diag(jnp.where(jnp.stack(dead), 1e30, 0.0))
        _lam_all, Y = _eigh_small(A)

        Xn, KXn, MXn = [], [], []
        lamn, resn, Pn = [], [], []
        for j in range(m):
            y = Y[:, j]
            p_new = sum(y[i] * basis[i][0] for i in range(m, k))
            x_new = sum(y[i] * basis[i][0] for i in range(m)) + p_new
            Kx = K.matvec(x_new)
            Mx = M.matvec(x_new)
            nrm = jnp.sqrt(jnp.maximum(ddot(x_new, Mx), 1e-30))
            x_new, Kx, Mx = x_new / nrm, Kx / nrm, Mx / nrm
            # fresh Rayleigh quotient, not the Ritz value (see
            # _lobpcg_core: the Ritz solve only picks directions)
            lam = ddot(x_new, Kx)
            res = jnp.linalg.norm(Kx - lam * Mx) / jnp.maximum(
                jnp.linalg.norm(Mx), 1e-30
            )
            Xn.append(x_new)
            KXn.append(Kx)
            MXn.append(Mx)
            lamn.append(lam)
            resn.append(res)
            Pn.append(p_new)
        resv = jnp.stack(resn)
        maxres = jnp.max(resv)
        improved = maxres < 0.98 * best
        best_new = jnp.minimum(best, maxres)
        stall_new = jnp.where(improved, 0, stall + 1)
        return (
            jnp.stack(Xn), jnp.stack(KXn), jnp.stack(MXn), jnp.stack(lamn),
            jnp.stack(Pn), resv, it + 1, best_new, stall_new,
        )

    st0 = (X, KX, MX, lams, P, res0, 0, jnp.inf, 0)
    X, KX, MX, lams, P, res, it, _, _ = lax.while_loop(cond, body, st0)
    order = jnp.argsort(lams)
    return BlockPowerResult(
        eigenvalues=lams[order], eigenvectors=X[order],
        iterations=it, residuals=res[order],
    )


@jax.jit
def lobpcg_block(
    K: StencilOperator,
    M: StencilOperator,
    X0: jnp.ndarray,
    inv_diag: jnp.ndarray,
    tol: float = 1e-10,
    max_iter: int = 500,
) -> BlockPowerResult:
    """Smallest m eigenpairs of the SPD pencil K x = lam M x by blocked
    LOBPCG with a Jacobi preconditioner.  ``X0`` is (m, n) — m packed
    start vectors as rows."""
    return _lobpcg_block_core(K, M, X0, lambda r: inv_diag * r, tol, max_iter)


@jax.jit
def lobpcg_block_pc(
    K: StencilOperator,
    M: StencilOperator,
    X0: jnp.ndarray,
    pc,
    tol: float = 1e-10,
    max_iter: int = 500,
) -> BlockPowerResult:
    """Blocked LOBPCG with a general preconditioner pytree exposing
    ``pc.apply(r)`` (e.g. :class:`lsafw_tpu.solver.multigrid.MultigridPC`)."""
    return _lobpcg_block_core(K, M, X0, pc.apply, tol, max_iter)


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
        return ddot(x, Kx) / ddot(x, Mx), Kx, Mx

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
