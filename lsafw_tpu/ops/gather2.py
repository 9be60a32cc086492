"""Two-pass lane-planned gather: arbitrary gathers as take_along_axis.

The TPU's generic gather costs ~8-14 ns per element regardless of
locality — the wall behind every SpMV formulation (VERDICT round-2 weak
item 2).  Mosaic/XLA lower 2D ``take_along_axis`` natively, so an
arbitrary gather ``y[m] = x[idx[m]]`` can be rephrased in two
vectorized passes over a lane-major layout:

    x2d = x.reshape(-1, 128)
    T[i, l]  = x2d[rowsel[i, l], l]        # take_along_axis, axis=0
    out[i,l] = T[i, lanesel[i, l]]         # take_along_axis, axis=1
             = x2d[rowsel[i, idx%128], idx%128] = x[idx]

``rowsel`` is indexed BY LANE RESIDUE, so the scheme needs each
row's gathered residues (idx % 128) to be pairwise distinct.  The
host-side :func:`plan_two_pass` splits each ELL row's entries into
"rounds" with a greedy residue coloring — FEM rows hit 1-3 rounds in
practice — and the apply sums the rounds' lane-products, which *is*
the ELL SpMV row reduction: no scatter anywhere.

MEASURED (round 3, TPU v5e via scripts/dev_pallas_gather2.py): XLA
lowers both take_along_axis passes to the same generic gather — 32
ns/element vs 8.6 for the plain gather — and Mosaic rejects the axis-0
pass in-kernel ("Only 2D gather is supported" covers the LANE axis
only).  The module is therefore correct-but-not-faster on current
toolchains; it is kept as the ready-made integration point for the day
Mosaic grows a sublane gather, and the numbers above are the recorded
evidence for why the ELL SpMV stays on the hi/lo-split plain gather.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


@dataclass(eq=False)
class TwoPassPlan:
    """Static per-pattern plan: one (rowsel, lanesel, slot) triple per
    round, shaped (n, LANES)."""

    n: int
    n_x_pad: int  # padded x length (multiple of LANES)
    rounds: int
    rowsel: jnp.ndarray  # (rounds, n, LANES) i32, residue-indexed block rows
    lanesel: jnp.ndarray  # (rounds, n, LANES) i32
    ell_map: jnp.ndarray  # (rounds, n, LANES) i32: ELL slot feeding this lane, -1 pad


def plan_two_pass(ell_cols: np.ndarray, valid: np.ndarray, n_x: int) -> TwoPassPlan:
    """Build the round plan for an ELL column table.

    ``ell_cols``: (n, w) int32 column indices; ``valid``: (n, w) bool.
    """
    n, w = ell_cols.shape
    assert w <= LANES, "ELL width beyond one lane vector is unsupported"
    res = (ell_cols % LANES).astype(np.int32)
    blk = (ell_cols // LANES).astype(np.int32)

    # greedy residue coloring: entry (i, k) goes to the first round
    # whose residue set for row i does not contain res[i, k]
    rounds_of = np.full((n, w), -1, dtype=np.int8)
    # vectorized greedy: per round, mark first occurrence of each residue
    remaining = valid.copy()
    r = 0
    while remaining.any():
        # first unclaimed occurrence of each residue per row
        key = res.astype(np.int64) + np.where(remaining, 0, 1 << 32)
        # stable argsort by residue; duplicates resolved by position
        srt = np.argsort(key, axis=1, kind="stable")
        sres = np.take_along_axis(key, srt, axis=1)
        first = np.ones_like(remaining)
        first[:, 1:] = sres[:, 1:] != sres[:, :-1]
        first &= sres < (1 << 32)
        # scatter back to original k positions
        chosen = np.zeros_like(remaining)
        np.put_along_axis(chosen, srt, first, axis=1)
        chosen &= remaining
        rounds_of[chosen] = r
        remaining &= ~chosen
        r += 1
        if r > 64:
            raise RuntimeError("two-pass gather coloring did not converge")
    max_rounds = r

    n_x_pad = -(-n_x // LANES) * LANES
    rowsel = np.zeros((max_rounds, n, LANES), dtype=np.int32)
    lanesel = np.zeros((max_rounds, n, LANES), dtype=np.int32)
    ell_map = np.full((max_rounds, n, LANES), -1, dtype=np.int32)
    for r in range(max_rounds):
        sel = rounds_of == r  # (n, w)
        i_idx, k_idx = np.nonzero(sel)
        res_sel = res[i_idx, k_idx]
        blk_sel = blk[i_idx, k_idx]
        # rowsel is residue-indexed
        rowsel[r][i_idx, res_sel] = blk_sel
        # output slot = within-round ordinal; lanesel at that slot = residue
        ordinal = np.cumsum(sel, axis=1) - 1
        slots = ordinal[i_idx, k_idx]
        lanesel[r][i_idx, slots] = res_sel
        ell_map[r][i_idx, slots] = k_idx.astype(np.int32)
    return TwoPassPlan(
        n=n, n_x_pad=n_x_pad, rounds=max_rounds,
        rowsel=jnp.asarray(rowsel), lanesel=jnp.asarray(lanesel),
        ell_map=jnp.asarray(ell_map),
    )


def gather_two_pass_f32(plan: TwoPassPlan, x: jnp.ndarray):
    """All rounds' gathered values, (rounds, n, LANES) f32 (padded
    slots carry arbitrary finite values — mask with ``ell_map >= 0``)."""
    xp = jnp.pad(x, (0, plan.n_x_pad - x.shape[0]))
    x2d = xp.reshape(-1, LANES)
    outs = []
    for r in range(plan.rounds):
        T = jnp.take_along_axis(x2d, plan.rowsel[r], axis=0)
        outs.append(jnp.take_along_axis(T, plan.lanesel[r], axis=1))
    return jnp.stack(outs)


def spmv_two_pass(plan: TwoPassPlan, data_rounds: jnp.ndarray, x: jnp.ndarray):
    """y = A x with A's ELL data pre-packed per round
    (``pack_ell_data``).  f64 x travels as hi/lo f32 pairs (the exact
    trick from :mod:`lsafw_tpu.ops.exact`), so every gather pass is an
    f32 ``take_along_axis``."""
    if x.dtype == jnp.float64:
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        g = (
            gather_two_pass_f32(plan, hi).astype(jnp.float64)
            + gather_two_pass_f32(plan, lo).astype(jnp.float64)
        )
    else:
        g = gather_two_pass_f32(plan, x).astype(data_rounds.dtype)
    return (data_rounds * g).sum(axis=(0, 2))[: plan.n]


def pack_ell_data(plan: TwoPassPlan, ell_data: jnp.ndarray) -> jnp.ndarray:
    """Rearrange (n, w) ELL data into the plan's (rounds, n, LANES)
    slot layout (zeros on padding slots).  Device-side so Newton/sigma
    refactorizations stay on-chip."""
    gathered = jnp.where(
        plan.ell_map >= 0,
        jnp.take_along_axis(
            ell_data[None].repeat(plan.rounds, axis=0),
            jnp.maximum(plan.ell_map, 0), axis=2,
        ),
        0.0,
    )
    return gathered
