"""Accuracy-safe inner products for the TPU backend.

On this TPU's emulated f64 (float32-pair arithmetic), ``jnp.vdot`` /
``jnp.dot`` lower to the MXU dot path, which drops the low word of the
result: the absolute error is one *float32* ulp of the accumulated
magnitude (measured: 8e-3 on a positive-dominated dot summing to 8e4,
while elementwise multiply + ``sum`` gives 6e-11 on the same data).
For positive-dominated dots — Rayleigh quotients x.K x, Gram matrix
diagonals, CG's p.Ap — that is a catastrophic f32-grade relative
error, and it floored the MG-LOBPCG eigenresidual at 1e-7 instead of
1e-11 before this was found.

``ddot`` uses elementwise multiply + reduce, which stays on the VPU in
full pair precision at identical asymptotic cost (both paths are
HBM-bandwidth-bound).  Use it for every accuracy-critical scalar
reduction on f64 data; plain ``jnp.sum`` / ``jnp.linalg.norm`` are
safe as-is (measured clean at 1e6 elements).
"""

from __future__ import annotations

import jax.numpy as jnp


def ddot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Real inner product via multiply+reduce (TPU-accurate, see module
    docstring).  Flattens like ``jnp.vdot`` for real inputs."""
    return (a.reshape(-1) * b.reshape(-1)).sum()


def dnorm(a: jnp.ndarray) -> jnp.ndarray:
    """2-norm via multiply+reduce (TPU-accurate)."""
    a = a.reshape(-1)
    return jnp.sqrt((a * a).sum())
