"""Exact f64 scatter-add via fixed-point f32 channels.

On this TPU, XLA lowers f32/int32 scatter-adds efficiently but the
emulated-f64 scatter path is ~20x slower (measured: 3.76 s for the
520k-DOF linearized-NS assembly, 3.45 s of it in the f64
``segment_sum``; the f32 scatter of the same entries takes 12 ms).
This module recovers f64-exact results at f32-scatter cost: the role
of PETSc's MatSetValues accumulation loop in the reference
(``FEM/operators.py:483-486`` reaches it through FFCx assembly).

Scheme: decompose each value into ``num_chunks`` fixed-point chunks of
``CHUNK_BITS`` bits on a *global* power-of-two grid anchored at the
input's maximum exponent.  Each chunk is a round-to-nearest integer
with ``|chunk| <= 2^(CHUNK_BITS-1)``, exactly representable in f32;
sums of up to ``MAX_ADDENDS = 2^(24 - CHUNK_BITS + 1)`` addends stay
below 2^24 and are therefore
*exact* in f32.  Recombination multiplies each chunk sum by its
(power-of-two) quantum and adds in f64 — the only rounding in the whole
pipeline is the final ``num_chunks - 1`` f64 additions.

Precision: the decomposition keeps ``16 * num_chunks`` bits below the
global maximum exponent.  With the default 4 chunks that is 64 bits —
more than an f64 mantissa — so any value within 2^11 of the maximum is
captured to full f64 precision, and a value 2^k smaller than the
maximum retains ``64 - 11 - k`` mantissa bits (graceful degradation
confined to relatively negligible entries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CHUNK_BITS = 16
# Chunks are round-to-nearest, so |chunk| <= 2^(CHUNK_BITS-1); f32 sums
# of such integer addends are exact while below 2^24: 512 addends.
MAX_ADDENDS = 2 ** (24 - CHUNK_BITS + 1)


def gather_f64_fast(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """f64 gather as two f32 gathers (hi/lo split) on TPU.

    The emulated-f64 gather path shares the f64 scatter's slowness
    (measured: 355 ms for the 520k x 45 ELL x-gather vs ~tens of ms in
    f32, BENCH_r01.json); splitting x into ``hi = f32(x)`` and
    ``lo = f32(x - hi)`` makes both gathers f32-fast and loses at most
    2^-48 relative per element (|x - hi| <= 2^-24 |x|, rounded once
    more at 2^-24) — far below Krylov tolerances.
    """
    if x.dtype != jnp.float64 or jax.default_backend() != "tpu":
        return x[idx]
    return _gather_split(x, idx)


def _gather_split(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi[idx].astype(jnp.float64) + lo[idx].astype(jnp.float64)


def segment_sum_fast(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Backend-adaptive segment sum: exact f32-channel decomposition on
    TPU (where the f64 scatter path is ~20x slower), plain
    ``jax.ops.segment_sum`` elsewhere.  The backend check runs at trace
    time (host Python), so jitted callers specialize cleanly."""
    if values.dtype == jnp.float64 and jax.default_backend() == "tpu":
        return segment_sum_exact(values, segment_ids, num_segments)
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def fixed_point_channels(
    values: jnp.ndarray, num_chunks: int = 4,
    max_abs: jnp.ndarray | None = None,
):
    """Decompose f64 ``values`` into ``num_chunks`` exactly-summable f32
    fixed-point channels on a global power-of-two grid.

    Returns ``(channels, quanta)``: ``channels[k]`` has the same shape
    as ``values`` with integer entries ``|c| <= 2^(CHUNK_BITS-1)``;
    ``values == sum_k channels[k] * quanta[k]`` up to the f64 tail
    beyond ``16 * num_chunks`` bits below the global max exponent.
    Sums of up to :data:`MAX_ADDENDS` channel entries are exact in f32
    — the invariant behind both :func:`segment_sum_exact` and the
    one-hot row-assembly reduction (:mod:`lsafw_tpu.fem.rowassembly`).
    """
    if max_abs is None:
        max_abs = jnp.max(jnp.abs(values))
    E = jnp.ceil(jnp.log2(jnp.maximum(max_abs, 1e-300))) + 1.0
    E = jnp.clip(E, -56.0, 110.0)  # see segment_sum_exact
    chans = []
    quanta = []
    r = values
    for k in range(num_chunks):
        q = jnp.exp2(E - CHUNK_BITS * (k + 1))
        qinv = jnp.exp2(CHUNK_BITS * (k + 1) - E)
        ck = jnp.floor(r * qinv + 0.5)
        r = r - ck * q
        chans.append(ck.astype(jnp.float32))
        quanta.append(q)
    return chans, quanta


def segment_sum_exact(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    num_chunks: int = 4,
    max_abs: float | jnp.ndarray | None = None,
) -> jnp.ndarray:
    """f64 ``jax.ops.segment_sum`` replacement at f32-scatter cost.

    Args:
        values: (m,) float64 addends.
        segment_ids: (m,) int32 destinations.
        num_segments: number of output slots.
        num_chunks: fixed-point channels (4 = 64 bits: full f64).
        max_abs: static or traced upper bound on ``|values|``; traced
            values cost one extra device reduction when omitted.

    Each segment must receive at most :data:`MAX_ADDENDS` contributions
    (FEM patterns: the number of cells sharing a DOF pair — single
    digits; facet/vector scatters are similarly bounded).
    """
    if values.dtype != jnp.float64:
        return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    if max_abs is None:
        max_abs = jnp.max(jnp.abs(values))
    # global grid anchor one bit above max exponent (the +1 absorbs a
    # possible downward log2 rounding at exact powers of two, keeping
    # chunk magnitudes strictly below 2^CHUNK_BITS); robust to 0 input
    E = jnp.ceil(jnp.log2(jnp.maximum(max_abs, 1e-300))) + 1.0
    # clamp the anchor so every quantum and its reciprocal stay inside
    # the f32 exponent range: this TPU's emulated f64 is an f32 pair,
    # so exp2(|p| > ~126) flushes to 0/inf (measured), and an all-zero
    # input would otherwise hit 0 * inf = NaN.  The window [-56, 110]
    # keeps 2^(E - 16*chunks) and 2^(16*chunks - E) representable;
    # values outside ~[2^-120, 2^110] are beyond FEM data anyway.
    E = jnp.clip(E, -56.0, 110.0)

    out = jnp.zeros(num_segments, dtype=jnp.float64)
    r = values
    for k in range(num_chunks):
        # multiply by the exact power-of-two reciprocal: emulated-f64
        # division is an order of magnitude pricier than multiply
        q = jnp.exp2(E - CHUNK_BITS * (k + 1))
        qinv = jnp.exp2(CHUNK_BITS * (k + 1) - E)
        # nearest-integer quantization (floor(x+1/2)): symmetric for
        # all non-tie values — exactly cancelling pairs keep cancelling
        # — and |ck| <= 2^(CHUNK_BITS-1), doubling the exact-summation
        # headroom vs floor
        ck = jnp.floor(r * qinv + 0.5)
        r = r - ck * q  # exact: ck*q exact, result representable
        sk = jax.ops.segment_sum(
            ck.astype(jnp.float32), segment_ids, num_segments=num_segments
        )
        out = out + sk.astype(jnp.float64) * q
    return out
