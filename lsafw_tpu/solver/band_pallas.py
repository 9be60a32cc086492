"""Pallas TPU kernels for the banded triangular solves.

The XLA scan formulation of the band substitution is loop-latency
bound (~0.2 ms/block-row; the per-step compute is a handful of
(B*nb, nb) matvecs while the band row DMA is ~1.7 MB).  These kernels
run the whole substitution as ONE Pallas program: the carry window
lives in VMEM, band rows stream from HBM with double-buffered async
copies, and the RHS/solution vectors sit wholly in VMEM.

Production wiring: :meth:`lsafw_tpu.solver.band.BandedLU.solve_pair`
dispatches to :func:`solve_banded_pallas` (forward + backward + Dinv)
when ``LSAFW_PALLAS_BAND=1`` is set, the factor lives on a real TPU,
and the kernel's VMEM budget fits (see ``band._pallas_ok``).  The path
is opt-in for now: standalone the kernels beat the XLA scan, but
embedded inside jitted refinement loops they trigger multi-minute
remote compiles on the axon toolchain (see ``_pallas_ok``); the XLA
scan remains the production default and the portable fallback (CPU,
virtual-device meshes, oversized windows).
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
        Lr = scr_r[slot].astype(jnp.float32)  # (B, nb, nb)
        Li = scr_i[slot].astype(jnp.float32)
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
            pltpu.VMEM((2, B, nb, nb), band_re.dtype),
            pltpu.VMEM((2, B, nb, nb), band_im.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(band_re, band_im, br, bi)
    return yr, yi


def _bwd_kernel(band_re, band_im, dinv_r, dinv_i, yr, yi, xr_out, xi_out,
                scr_r, scr_i, dscr_r, dscr_i, sem_r, sem_i, dsem_r, dsem_i,
                *, B, nb, rows_total):
    """Backward substitution with the diagonal-inverse application:
    x_K = Dinv_K (y_K - sum_t U[K, B+1+t] @ x_{K+1+t}), K descending."""
    from jax.experimental.pallas import tpu as pltpu

    def dma(slot, k):
        k = jnp.asarray(k, jnp.int32)
        slot = jnp.asarray(slot, jnp.int32)
        return (
            pltpu.make_async_copy(
                band_re.at[k, B + 1 : 2 * B + 1], scr_r.at[slot], sem_r.at[slot]
            ),
            pltpu.make_async_copy(
                band_im.at[k, B + 1 : 2 * B + 1], scr_i.at[slot], sem_i.at[slot]
            ),
            pltpu.make_async_copy(dinv_r.at[k], dscr_r.at[slot], dsem_r.at[slot]),
            pltpu.make_async_copy(dinv_i.at[k], dscr_i.at[slot], dsem_i.at[slot]),
        )

    last = jnp.int32(rows_total - 1)
    one = jnp.int32(1)
    two = jnp.int32(2)
    for c in dma(0, last):
        c.start()

    def body(i, carry):
        Xr, Xi = carry  # (B, nb): x rows K+1..K+B
        k = jax.lax.sub(last, i)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(jax.lax.add(i, one), two)
        # prefetch the next (descending) row, clamped at 0
        for c in dma(nxt, jax.lax.max(jax.lax.sub(k, one), jnp.int32(0))):
            c.start()
        cur = dma(slot, k)
        for c in cur:
            c.wait()
        Ur = scr_r[slot].astype(jnp.float32)  # (B, nb, nb)
        Ui = scr_i[slot].astype(jnp.float32)
        Xrb = Xr[:, None, :]
        Xib = Xi[:, None, :]
        sr = (Ur * Xrb - Ui * Xib).sum(axis=(0, 2))
        si = (Ur * Xib + Ui * Xrb).sum(axis=(0, 2))
        zr = yr[k] - sr
        zi = yi[k] - si
        Dr = dscr_r[slot]  # (nb, nb)
        Di = dscr_i[slot]
        xkr = (Dr * zr[None, :] - Di * zi[None, :]).sum(axis=1)
        xki = (Dr * zi[None, :] + Di * zr[None, :]).sum(axis=1)
        xr_out[k, :] = xkr
        xi_out[k, :] = xki
        Xr = jnp.concatenate([xkr[None], Xr[:-1]], axis=0)
        Xi = jnp.concatenate([xki[None], Xi[:-1]], axis=0)
        return Xr, Xi

    z = jnp.zeros((B, nb), jnp.float32)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(rows_total), body, (z, z))
    # drain the dangling final prefetch
    for c in dma(rows_total % 2, 0):
        c.wait()


@partial(jax.jit, static_argnames=("B", "nb"))
def bwd_substitute_pallas(band_re, band_im, dinv_r, dinv_i, yr, yi, *, B, nb):
    """(rows_total, nb) backward substitution + Dinv application as a
    single Pallas program.  ``dinv`` rows beyond its first dimension are
    never touched (the padded lookahead rows of the band are identity
    and produce x = y there via the XLA path; here the caller passes
    dinv padded to rows_total)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_total = band_re.shape[0]
    kernel = partial(_bwd_kernel, B=B, nb=nb, rows_total=rows_total)
    xr, xi = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, nb), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, nb, nb), band_re.dtype),
            pltpu.VMEM((2, B, nb, nb), band_im.dtype),
            pltpu.VMEM((2, nb, nb), jnp.float32),
            pltpu.VMEM((2, nb, nb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(band_re, band_im, dinv_r, dinv_i, yr, yi)
    return xr, xi


def pallas_vmem_bytes(B: int, nb: int, rows_total: int) -> int:
    """VMEM footprint estimate of the substitution kernels: the larger
    (backward) kernel's scratch + resident vectors."""
    scr = 2 * 2 * B * nb * nb * 4 + 2 * 2 * nb * nb * 4
    vecs = 4 * rows_total * nb * 4
    return scr + vecs


@partial(jax.jit, static_argnames=("B", "nb"))
def solve_banded_pallas(band_re, band_im, dinv_r, dinv_i, br, bi, *, B, nb):
    """Full banded solve (forward + backward) through the Pallas
    kernels.  Same contract as ``band._solve_banded``: (nblk, nb) RHS
    blocks in, (nblk, nb) solution blocks out; the B padded lookahead
    rows are handled by padding the RHS and Dinv with identities."""
    rows_total = band_re.shape[0]
    nblk = dinv_r.shape[0]
    pad = rows_total - nblk
    zb = jnp.zeros((pad, nb), br.dtype)
    brp = jnp.concatenate([br, zb], axis=0)
    bip = jnp.concatenate([bi, zb], axis=0)
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=dinv_r.dtype), (pad, nb, nb))
    dvr = jnp.concatenate([dinv_r, eye], axis=0)
    dvi = jnp.concatenate([dinv_i, jnp.zeros((pad, nb, nb), dinv_i.dtype)], axis=0)
    yr, yi = fwd_substitute_pallas(band_re, band_im, brp, bip, B=B, nb=nb)
    xr, xi = bwd_substitute_pallas(band_re, band_im, dvr, dvi, yr, yi, B=B, nb=nb)
    return xr[:nblk], xi[:nblk]
