"""Complex linear algebra over (real, imag) pairs of real arrays.

This TPU exposes no complex dtype, so complex vectors are (re, im)
pairs of real jnp arrays and complex matvecs/dots are fused real
operations.  This is the principled, device-native version of the
reference's real-build complex emulation (``iComplexPETScVector``,
``FEM/utils.py:911-1244``) — and it is *faster* than a native complex
dtype would be on this hardware, because every operation lowers to
real VPU/MXU work with no complex-arithmetic emulation layer.

Conventions: a "cvec" is a tuple (re, im); a complex scalar is a
Python complex or a (re, im) scalar pair.
"""

from __future__ import annotations

import jax.numpy as jnp

from lsafw_tpu.ops.dots import ddot

CVec = tuple[jnp.ndarray, jnp.ndarray]


def czeros(n: int, dtype=jnp.float64) -> CVec:
    return jnp.zeros(n, dtype), jnp.zeros(n, dtype)


def cdot(x: CVec, y: CVec) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Conjugating inner product <x, y> = x^H y (parity:
    ``iComplexPETScVector.dot``, ``FEM/utils.py:1194``).

    Scalar reductions use :func:`lsafw_tpu.ops.dots.ddot` — the TPU's
    MXU dot path drops the f64 low word (see ops/dots.py)."""
    xr, xi = x
    yr, yi = y
    return ddot(xr, yr) + ddot(xi, yi), ddot(xr, yi) - ddot(xi, yr)


def cnorm(x: CVec) -> jnp.ndarray:
    xr, xi = x
    return jnp.sqrt(ddot(xr, xr) + ddot(xi, xi))


def cscale(alpha: complex | tuple, x: CVec) -> CVec:
    """alpha * x with complex alpha (``FEM/utils.py:1214`` scale)."""
    ar, ai = (alpha.real, alpha.imag) if isinstance(alpha, complex) else alpha
    xr, xi = x
    return ar * xr - ai * xi, ar * xi + ai * xr


def caxpy(alpha: complex | tuple, x: CVec, y: CVec) -> CVec:
    """y + alpha x."""
    sr, si = cscale(alpha, x)
    return y[0] + sr, y[1] + si


def to_numpy(x: CVec):
    import numpy as np

    return np.asarray(x[0]) + 1j * np.asarray(x[1])


def from_numpy(z) -> CVec:
    import numpy as np

    z = np.asarray(z)
    return jnp.asarray(np.real(z).copy()), jnp.asarray(np.imag(z).copy())


# ---------------------------------------------------------------------------
# Batched basis operations for Arnoldi (the hot path)
# ---------------------------------------------------------------------------


def basis_project(Vr: jnp.ndarray, Vi: jnp.ndarray, w: CVec, mask: jnp.ndarray):
    """h = V^H w over the masked rows of a (m, n) complex basis.

    Returns (hr, hi) of shape (m,).  Batched row-reductions per
    component — the TPU-friendly formulation of Gram-Schmidt
    (SURVEY.md section 5: orthogonalization = batched matvec + psum).
    Uses elementwise multiply + row-sum instead of (m, n) x (n,)
    matmuls: both read the same bytes (HBM-bound either way), but the
    MXU dot path drops the emulated-f64 low word (ops/dots.py) and the
    projection coefficients land in H, where f32-grade error would
    shift the Ritz values.
    """
    wr, wi = w
    hr = ((Vr * wr) + (Vi * wi)).sum(axis=1) * mask
    hi = ((Vr * wi) - (Vi * wr)).sum(axis=1) * mask
    return hr, hi


def basis_subtract(Vr: jnp.ndarray, Vi: jnp.ndarray, w: CVec, h) -> CVec:
    """w - V^T h (complex accumulation of basis columns)."""
    hr, hi = h
    wr, wi = w
    wr = wr - (Vr.T @ hr - Vi.T @ hi)
    wi = wi - (Vr.T @ hi + Vi.T @ hr)
    return wr, wi


def basis_combine(Vr: jnp.ndarray, Vi: jnp.ndarray, cr: jnp.ndarray, ci: jnp.ndarray) -> CVec:
    """x = V^T c for complex coefficient vector c — used to form Ritz
    vectors and Krylov-Schur restarts."""
    return Vr.T @ cr - Vi.T @ ci, Vr.T @ ci + Vi.T @ cr
