"""Row-gather FEM assembly — the scatter-wall fix (VERDICT r3 item 2).

The classic TPU assembly bottleneck: scattering ~nc * E^2 element-matrix
entries into the CSR data array costs ~8 ns per scattered index on this
chip regardless of locality (measured floor ~200 ms per f32 channel at
520k DOFs; the exact-f64 4-channel scatter paid it four times, 1.26 s of
the 1.56 s assembly).  The round-3 BCSR work showed the per-INDEX cost
is the whole story — (1, W) slice accesses amortize it by W.

This module re-formulates assembly as GATHERS + a one-hot placement
reduction, all of whose index traffic is slice-shaped:

1. ``fixed_point_channels`` decomposes the element values into 4 exact
   f32 fixed-point channels (the :mod:`lsafw_tpu.ops.exact` scheme, so
   accumulation in f32 is EXACT and the result is f64-grade).
2. For every global row ``r`` the contributing element-matrix rows
   ``(c, i)`` with ``cell_dofs[c, i] == r`` are slice-gathered as whole
   (1, E) rows — ``nrows * K`` indices instead of ``nc * E^2``.
3. Placement within the row becomes a ONE-HOT REDUCTION instead of a
   scatter: ``y[r, j] = sum_{k,e} v[r,k,e] * [pos[r,k,e] == j]`` — pure
   VPU compare/select/add work at ``nrows * K * E * maxw`` flops, no
   index traffic at all.  Positions come from the pattern's existing
   per-entry ``slots`` map (gathered per chunk, never materialized).
4. The padded (nrows, maxw) row buffer maps to flat CSR data with one
   final monotonic gather.

The output is bit-compatible with ``assemble_csr_data``'s
``segment_sum_exact`` path (same channel decomposition, same exact f32
sums, same f64 recombination order per entry).

Parity: the dolfinx/FFCx insertion loop the reference reaches through
``assemble_matrix`` (``/root/reference/FEM/operators.py:483-507``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


# host-CPU jitted planning arithmetic (this VM's numpy runs scalar loops
# for elementwise passes; route the nnz-sized arithmetic through XLA)
@jax.jit
def _flat_src_jit(row_ids, indptr, maxw):
    ar = jnp.arange(row_ids.shape[0], dtype=jnp.int64)
    return (row_ids.astype(jnp.int64) * maxw
            + ar - indptr[row_ids]).astype(jnp.int32)


@jax.tree_util.register_pytree_node_class
@dataclass
class RowPlan:
    """Host-built row-gather structure for one (pattern, cell_dofs).

    ``src[r, k]`` indexes the k-th contributing element-matrix row
    (flattened ``(c, i) -> c * E + i``) of global row r; -1 pads.
    ``rowbase[r] = indptr[r]`` converts pattern slots to within-row
    positions.  ``flat_src[slot]`` reads the padded (nrows, maxw) row
    buffer back out as flat CSR data.
    """

    src: jnp.ndarray  # (S*R, K) int32, pad -1
    rowbase: jnp.ndarray  # (S*R,) int32
    flat_src: jnp.ndarray  # (nnz,) int32
    nrows: int
    maxw: int
    K: int
    E: int
    nc: int
    R: int  # rows per scan chunk

    def tree_flatten(self):
        return ((self.src, self.rowbase, self.flat_src),
                (self.nrows, self.maxw, self.K, self.E, self.nc, self.R))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def build(cls, cell_dofs: np.ndarray, pattern) -> "RowPlan":
        cd = np.asarray(cell_dofs)
        nc, E = cd.shape
        nrows = pattern.shape[0]
        if pattern.nnz >= 2**31 or nrows * int(pattern.ell[2]) >= 2**31:
            raise ValueError("pattern too large for int32 row-assembly plan")
        maxw = int(pattern.ell[2])

        cdflat = cd.ravel().astype(np.int64)
        order = np.argsort(cdflat, kind="stable").astype(np.int32)
        counts = np.bincount(cdflat, minlength=nrows)
        K = int(counts.max())
        offs = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        sorted_rows = cdflat[order]
        rank = np.arange(len(order), dtype=np.int64) - offs[sorted_rows]

        # chunk rows so the (R, K, E, maxw) one-hot temp stays ~tens of MB
        R = max(64, int(8_388_608 // max(1, K * E * maxw)))
        R = min(R, 8192)
        S = -(-nrows // R)
        src = np.full((S * R, K), -1, dtype=np.int32)
        src[sorted_rows, rank] = order
        rowbase = np.zeros(S * R, dtype=np.int32)
        rowbase[:nrows] = pattern.indptr[:-1].astype(np.int32)

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            flat_src = np.asarray(_flat_src_jit(
                jnp.asarray(pattern.row_ids.astype(np.int32)),
                jnp.asarray(pattern.indptr.astype(np.int64)),
                jnp.int64(maxw)))
        logger.info(
            "RowPlan: nrows=%d K=%d E=%d maxw=%d R=%d (%.0f MB indices)",
            nrows, K, E, maxw, R,
            (src.nbytes + rowbase.nbytes + flat_src.nbytes) / 1e6,
        )
        return cls(
            src=jnp.asarray(src), rowbase=jnp.asarray(rowbase),
            flat_src=jnp.asarray(flat_src),
            nrows=nrows, maxw=maxw, K=K, E=E, nc=nc, R=R,
        )


def assemble_rows(plan: RowPlan, slots: jnp.ndarray,
                  element_mats: jnp.ndarray) -> jnp.ndarray:
    """Element matrices -> flat CSR data via the row-gather formulation.

    ``slots``: the pattern's per-entry slot map (``pattern_dev.slots``),
    shape (nc*E*E,).  Traceable (call inside jit with the plan as an
    argument pytree).
    """
    from lsafw_tpu.ops.exact import fixed_point_channels

    m = element_mats.reshape(plan.nc * plan.E, plan.E)
    if m.dtype != jnp.float64:
        # f32 path: no channel decomposition needed; single channel
        chans, quanta = [m.astype(jnp.float32)], [jnp.float64(1.0)]
    else:
        chans, quanta = fixed_point_channels(m, 4)
    NCH = len(chans)
    # pack the channels into one row so every (1, NCH*E) slice gather
    # fetches ALL channels: the ~8 ns/index gather cost is paid once,
    # not once per channel (measured 175k: 302 ms -> the 4 value
    # gathers were ~half the wall)
    packed = chans[0] if NCH == 1 else jnp.stack(chans, axis=1).reshape(
        plan.nc * plan.E, NCH * plan.E)
    slots2d = slots.reshape(plan.nc * plan.E, plan.E)
    iota = jnp.arange(plan.maxw, dtype=jnp.int32)

    S = plan.src.shape[0] // plan.R
    src = plan.src.reshape(S, plan.R, plan.K)
    base = plan.rowbase.reshape(S, plan.R)

    def step(_, xs):
        s, b = xs
        valid = s >= 0
        s0 = jnp.where(valid, s, 0)
        p = slots2d[s0] - b[:, None, None]  # (R, K, E) int32
        p = jnp.where(valid[:, :, None], p, plan.maxw)
        oh = p[..., None] == iota  # (R, K, E, maxw) bool
        vp = packed[s0]  # (R, K, NCH*E) f32: one gather, all channels
        y = jnp.zeros((plan.R, plan.maxw), dtype=jnp.float64)
        for c, q in enumerate(quanta):
            v = vp if NCH == 1 else vp.reshape(
                plan.R, plan.K, NCH, plan.E)[:, :, c, :]
            yk = jnp.where(oh, v[..., None], jnp.float32(0)).sum(axis=(1, 2))
            y = y + yk.astype(jnp.float64) * q
        return None, y

    _, ys = jax.lax.scan(step, None, (src, base))
    yflat = ys.reshape(-1)

    from lsafw_tpu.ops.exact import gather_f64_fast

    out = gather_f64_fast(yflat, plan.flat_src)
    return out if element_mats.dtype == jnp.float64 else out.astype(
        element_mats.dtype)


def row_plan_enabled() -> bool:
    """Row-gather assembly is the TPU default; force with
    LSAFW_ROW_ASSEMBLY=1 (e.g. CPU correctness tests), disable with 0."""
    import os

    env = os.environ.get("LSAFW_ROW_ASSEMBLY")
    if env is not None:
        return env not in ("0", "false", "no")
    return jax.default_backend() == "tpu"
