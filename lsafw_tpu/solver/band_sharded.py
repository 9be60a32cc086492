"""Multi-device banded shift-invert: truncated-SPIKE preconditioning.

The band factorization is sequential over block rows, so it cannot be
sharded directly.  The multi-chip design (SURVEY section 2.3 items 2-4;
the role distributed MUMPS plays for the reference,
``/root/reference/Sensitivity/__init__.py:182``) follows the SPIKE
family instead:

  * RCM-order the operator and split its rows into one contiguous
    segment per device;
  * each device factors the *diagonal band block* of its segment
    independently (the truncated SPIKE approximation: cross-segment
    couplings are dropped from the factor);
  * the per-iteration substitution runs under ``shard_map`` with NO
    collectives (segment solves are local by construction);
  * the outer Krylov loop (GMRES inner solve / Arnoldi expansion) runs
    on the sharded TRUE operator — XLA inserts the halo gathers and
    psum reductions from the shardings, exactly like the plain sharded
    eigensolve (``lsafw_tpu/parallel/sharded.py``).

Cross-segment coupling thus moves from the factorization into the
outer iteration, which is where TPUs want it: the preconditioner apply
is embarrassingly parallel, and the coupling is paid in a handful of
extra Krylov iterations whose matvecs ride the ICI collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.solver.band import BandedLU, BandPlan, rcm_permutation
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedBandedPrecond:
    """Stacked per-segment band factors, applied under ``shard_map``.

    ``band_re``...: leading axis = segment (one per device along the
    mesh axis); ``perm``/``iperm`` are the GLOBAL RCM permutation
    (padded), applied around the segment solves.
    """

    band_re: jnp.ndarray  # (D, rows_total, R, nb, nb) f32
    band_im: jnp.ndarray
    dinv_r: jnp.ndarray  # (D, nblk_seg, nb, nb)
    dinv_i: jnp.ndarray
    perm: jnp.ndarray  # (npad,) int32 padded permuted -> original
    iperm: jnp.ndarray  # (n,) int32
    n: int
    nb: int
    B: int

    def tree_flatten(self):
        return (
            (self.band_re, self.band_im, self.dinv_r, self.dinv_i,
             self.perm, self.iperm),
            (self.n, self.nb, self.B),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def num_segments(self) -> int:
        return self.band_re.shape[0]

    @property
    def npad(self) -> int:
        return self.num_segments * self.dinv_r.shape[1] * self.nb

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        C: sp.spmatrix,
        n_segments: int,
        *,
        nb: int = 16,
        chunk: int = 8,
        delta: float = 0.0,
    ) -> "ShardedBandedPrecond":
        """Factor the ``n_segments`` diagonal band blocks of (RCM-
        permuted) complex ``C``.  Host-side segmentation; each segment
        factors through the standard device path with uniform geometry
        so the factors stack."""
        C = C.tocsr()
        n = C.shape[0]
        pat = sp.csr_matrix(
            (np.ones(C.nnz, np.int8), C.indices, C.indptr), shape=C.shape
        )
        perm = rcm_permutation(pat + pat.T)
        iperm = np.empty(n, dtype=np.int64)
        iperm[perm] = np.arange(n)
        Cp = C[perm][:, perm].tocsr()

        nblk = -(-n // nb)
        per_seg = -(-nblk // n_segments)  # ceil(nblk / D)
        nblk_seg = -(-per_seg // chunk) * chunk  # rounded up to chunk
        seg_rows = nblk_seg * nb
        npad = n_segments * seg_rows

        coo = Cp.tocoo()
        bw = int(np.abs(coo.row - coo.col).max()) if coo.nnz else 0
        B_glob = max(1, -(-bw // nb))
        # cap the factor block-bandwidth at the segment size
        B_glob = min(B_glob, nblk_seg)

        bands_r, bands_i, dinvs_r, dinvs_i = [], [], [], []
        dropped = 0
        for s in range(n_segments):
            r0, r1 = s * seg_rows, min((s + 1) * seg_rows, n)
            if r0 >= n:
                seg = sp.identity(seg_rows, format="csr", dtype=np.complex128)
            else:
                seg = Cp[r0:r1, r0:r1].tocsr()
                dropped += int(
                    Cp[r0:r1].nnz - seg.nnz
                )
                if seg.shape[0] < seg_rows:
                    pad = seg_rows - seg.shape[0]
                    seg = sp.block_diag(
                        [seg, sp.identity(pad, dtype=np.complex128)], format="csr"
                    )
                # saddle regularization: numerically-zero diagonals
                # (pressure rows of C = A - sigma M) overflow the
                # pivot-free segment factor; the perturbation only
                # weakens the *preconditioner* (same trick as
                # band.regularize_saddle_data, host-side here)
                d = seg.diagonal()
                scale = float(np.abs(d).mean()) or 1.0
                fix = np.where(np.abs(d) < 1e-10 * scale, -1e-3 * scale, 0.0)
                if np.any(fix):
                    seg = (seg + sp.diags(fix)).tocsr()
            plan = BandPlan.build(
                seg, nb=nb, chunk=chunk,
                perm=np.arange(seg_rows), min_B=B_glob,
            )
            lu = BandedLU.factor(
                plan,
                jnp.asarray(np.ascontiguousarray(seg.data.real)),
                jnp.asarray(np.ascontiguousarray(seg.data.imag)),
                delta=delta,
            )
            bands_r.append(lu.band_re)
            bands_i.append(lu.band_im)
            dinvs_r.append(lu.dinv_r)
            dinvs_i.append(lu.dinv_i)
        logger.info(
            "ShardedBandedPrecond: %d segments of %d rows (B=%d, %d "
            "cross-segment couplings dropped into the outer iteration)",
            n_segments, seg_rows, B_glob, dropped,
        )
        perm_pad = np.concatenate([perm, np.arange(n, npad)])
        return cls(
            jnp.stack(bands_r), jnp.stack(bands_i),
            jnp.stack(dinvs_r), jnp.stack(dinvs_i),
            jnp.asarray(perm_pad.astype(np.int32)),
            jnp.asarray(iperm.astype(np.int32)),
            n, nb, B_glob,
        )

    # ------------------------------------------------------------------
    def solve_pair_sharded(self, br, bi, mesh, axis: str = "dof"):
        """Apply all segment solves under ``shard_map`` (local, no
        collectives).  ``br/bi``: (npad,) f64 padded global vectors in
        ORIGINAL ordering, sharded or replicated; returns the
        preconditioned pair in original ordering."""
        from jax.experimental.shard_map import shard_map  # noqa: deprecation shim below
        from jax.sharding import PartitionSpec as P

        from lsafw_tpu.solver.band import _solve_banded

        D = self.num_segments
        nblk_seg = self.dinv_r.shape[1]
        npad = self.npad
        brp = jnp.pad(br, (0, npad - br.shape[0])) if br.shape[0] < npad else br
        bip = jnp.pad(bi, (0, npad - bi.shape[0])) if bi.shape[0] < npad else bi
        brp = brp[self.perm].astype(jnp.float32).reshape(D, nblk_seg, self.nb)
        bip = bip[self.perm].astype(jnp.float32).reshape(D, nblk_seg, self.nb)

        def seg_solve(band_re, band_im, dinv_r, dinv_i, b_r, b_i):
            xr, xi = _solve_banded(
                band_re[0], band_im[0], dinv_r[0], dinv_i[0], b_r[0], b_i[0],
                B=self.B, nb=self.nb,
            )
            return xr[None], xi[None]

        seg = shard_map(
            seg_solve,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            # the scan carries inside _solve_banded are created unvarying;
            # every operand is segment-local so replication checking adds
            # nothing here
            check_rep=False,
        )
        xr, xi = seg(
            self.band_re, self.band_im, self.dinv_r, self.dinv_i, brp, bip
        )
        xr = xr.reshape(npad).astype(jnp.float64)
        xi = xi.reshape(npad).astype(jnp.float64)
        out_r = jnp.zeros(npad).at[: self.n].set(xr[self.iperm])
        out_i = jnp.zeros(npad).at[: self.n].set(xi[self.iperm])
        return out_r, out_i
