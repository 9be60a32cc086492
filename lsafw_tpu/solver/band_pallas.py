"""Pallas TPU kernels for the banded triangular solves.

The XLA scan formulation of the band substitution is loop-latency
bound (~0.2 ms/block-row; the per-step compute is a handful of
(B*nb, nb) matvecs while the band row DMA is ~1.7 MB).  These kernels
run the whole substitution as ONE Pallas program: the carry window
lives in VMEM, band rows stream from HBM with double-buffered async
copies, and the RHS/solution vectors sit wholly in VMEM (<1 MB).

Used as the fast path of :func:`lsafw_tpu.solver.band._solve_banded`
on the TPU backend; the XLA scan remains the portable fallback (CPU,
interpret tests, and any Mosaic regression).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _fwd_kernel(band_re, band_im, br, bi, yr_out, yi_out,
                scr_r, scr_i, sem_r, sem_i, *, B, nb, rows_total):
    """Forward substitution y_K = b_K - sum_t L[K,t] @ y_{K-B+t}."""
    from jax.experimental.pallas import tpu as pltpu

    def dma(slot, k):
        # Mosaic memref slicing wants i32 indices (x64 mode would make
        # Python/fori indices i64)
        k = jnp.asarray(k, jnp.int32)
        slot = jnp.asarray(slot, jnp.int32)
        return (
            pltpu.make_async_copy(band_re.at[k, 0:B], scr_r.at[slot], sem_r.at[slot]),
            pltpu.make_async_copy(band_im.at[k, 0:B], scr_i.at[slot], sem_i.at[slot]),
        )

    d0r, d0i = dma(0, 0)
    d0r.start()
    d0i.start()

    one = jnp.int32(1)
    two = jnp.int32(2)
    last = jnp.int32(rows_total - 1)

    def body(k, carry):
        Yr, Yi = carry  # (B, nb) f32 carries in registers/VMEM values
        # lax ops with explicit i32 scalars: jnp's dtype promotion
        # recurses under the Mosaic tracer in this jax build
        slot = jax.lax.rem(k, two)
        nxt = jax.lax.rem(jax.lax.add(k, one), two)
        # double buffering: prefetch the next row (index clamped — the
        # final redundant fetch is harmless and avoids predication)
        pr, pi_ = dma(nxt, jax.lax.min(jax.lax.add(k, one), last))
        pr.start()
        pi_.start()
        dr, di = dma(slot, k)
        dr.wait()
        di.wait()
        Lr = scr_r[slot]  # (B, nb, nb)
        Li = scr_i[slot]
        # VPU broadcast-multiply + reduce (Mosaic's tpu.matmul cannot
        # express the batched (t, j) contraction)
        Yrb = Yr[:, None, :]
        Yib = Yi[:, None, :]
        sr = (Lr * Yrb - Li * Yib).sum(axis=(0, 2))
        si = (Lr * Yib + Li * Yrb).sum(axis=(0, 2))
        ykr = br[k] - sr
        yki = bi[k] - si
        yr_out[k, :] = ykr
        yi_out[k, :] = yki
        Yr = jnp.concatenate([Yr[1:], ykr[None]], axis=0)
        Yi = jnp.concatenate([Yi[1:], yki[None]], axis=0)
        return Yr, Yi

    z = jnp.zeros((B, nb), jnp.float32)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(rows_total), body, (z, z))
    # drain the dangling final prefetch so no DMA outlives the kernel
    dr, di = dma(rows_total % 2, rows_total - 1)
    dr.wait()
    di.wait()


@partial(jax.jit, static_argnames=("B", "nb"))
def fwd_substitute_pallas(band_re, band_im, br, bi, *, B, nb):
    """(rows_total, nb) forward substitution through the factored band's
    L part, as a single Pallas program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_total = band_re.shape[0]
    kernel = partial(_fwd_kernel, B=B, nb=nb, rows_total=rows_total)
    yr, yi = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, nb), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # band stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, nb, nb), jnp.float32),
            pltpu.VMEM((2, B, nb, nb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(band_re, band_im, br, bi)
    return yr, yi
