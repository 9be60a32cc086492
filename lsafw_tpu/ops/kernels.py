"""Pallas TPU kernels for the sparse hot path.

XLA lowers the ELL gather of :func:`lsafw_tpu.ops.sparse.spmv` through
generic dynamic-gather HLO; this module provides a hand-blocked Pallas
variant that keeps the *operand vector resident in VMEM* (FEM operand
vectors fit: 2M f32 DOFs = 8 MB < 16 MB VMEM) while streaming the ELL
data/column blocks from HBM, so every gather is VMEM-latency instead of
HBM-latency.

The kernels degrade gracefully: :func:`spmv_ell_pallas` falls back to
the XLA formulation off-TPU (and under ``interpret=True`` is used for
CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsafw_tpu.ops.sparse import CSRMatrix


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def spmv_ell_pallas(
    data_ell: jnp.ndarray,
    cols_ell: jnp.ndarray,
    x: jnp.ndarray,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A x with A in padded ELL layout ((n, w) data/cols).

    Grid over row blocks; x is mapped whole into VMEM, each grid step
    DMAs one (block_rows, w) tile of data/cols and reduces on the VPU.
    """
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        vmem = None

    n, w = data_ell.shape
    nb = _cdiv(n, block_rows)
    npad = nb * block_rows
    if npad != n:
        data_ell = jnp.pad(data_ell, ((0, npad - n), (0, 0)))
        cols_ell = jnp.pad(cols_ell, ((0, npad - n), (0, 0)))

    def kernel(x_ref, d_ref, c_ref, y_ref):
        xv = x_ref[:]
        cols = c_ref[:]
        gathered = xv[cols]  # VMEM gather
        y_ref[:] = (d_ref[:] * gathered).sum(axis=1)

    specs = dict(memory_space=vmem) if vmem is not None else {}
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad,), x.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((x.shape[0],), lambda i: (0,), **specs),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), **specs),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), **specs),
        ],
        out_specs=pl.BlockSpec((block_rows,), lambda i: (i,), **specs),
        interpret=interpret,
    )(x, data_ell, cols_ell)
    return y[:n]


def spmv_pallas(A: CSRMatrix, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Pallas ELL SpMV on a CSRMatrix (falls back to XLA off-TPU)."""
    data_ell = jnp.where(A.dev.ell_map >= 0, A.data[A.dev.ell_map], 0.0)
    platform = next(iter(x.devices())).platform if hasattr(x, "devices") else "cpu"
    if not interpret and platform != "tpu":
        from lsafw_tpu.ops.sparse import spmv

        return spmv(A, x)
    return spmv_ell_pallas(data_ell, A.dev.ell_cols, x, interpret=interpret)
