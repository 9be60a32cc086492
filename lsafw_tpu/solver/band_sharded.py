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
    def seg_solve_sharded(self, brp, bip, mesh, axis: str = "dof"):
        """All segment solves under ``shard_map`` (local, no
        collectives) in PERMUTED segment space: ``brp/bip`` are
        (D, nblk_seg, nb) f32 RHS blocks; returns solution blocks of
        the same shape."""
        from jax.experimental.shard_map import shard_map  # noqa: deprecation shim below
        from jax.sharding import PartitionSpec as P

        from lsafw_tpu.solver.band import _solve_banded

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
        return seg(
            self.band_re, self.band_im, self.dinv_r, self.dinv_i, brp, bip
        )

    def solve_pair_sharded(self, br, bi, mesh, axis: str = "dof"):
        """Apply all segment solves under ``shard_map`` (local, no
        collectives).  ``br/bi``: (npad,) f64 padded global vectors in
        ORIGINAL ordering, sharded or replicated; returns the
        preconditioned pair in original ordering."""
        D = self.num_segments
        nblk_seg = self.dinv_r.shape[1]
        npad = self.npad
        brp = jnp.pad(br, (0, npad - br.shape[0])) if br.shape[0] < npad else br
        bip = jnp.pad(bi, (0, npad - bi.shape[0])) if bi.shape[0] < npad else bi
        brp = brp[self.perm].astype(jnp.float32).reshape(D, nblk_seg, self.nb)
        bip = bip[self.perm].astype(jnp.float32).reshape(D, nblk_seg, self.nb)
        xr, xi = self.seg_solve_sharded(brp, bip, mesh, axis)
        xr = xr.reshape(npad).astype(jnp.float64)
        xi = xi.reshape(npad).astype(jnp.float64)
        out_r = jnp.zeros(npad).at[: self.n].set(xr[self.iperm])
        out_i = jnp.zeros(npad).at[: self.n].set(xi[self.iperm])
        return out_r, out_i


# ---------------------------------------------------------------------------
# Exact SPIKE: PC promoted to a sharded direct solver
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedSpikeSolver:
    """Exact SPIKE over the segment factors: a sharded DIRECT solver.

    The truncated-SPIKE preconditioner drops the cross-segment coupling
    blocks; here they are made exact through the classic SPIKE reduced
    system (Polizzi & Sameh).  Writing segment ``j``'s block row as

        A_j x_j + R_j x_{j+1}^top + L_j x_{j-1}^bot = f_j

    and multiplying by ``A_j^{-1}`` gives

        x_j + V_j t_{j+1} + W_j b_{j-1} = g_j,
        V_j = A_j^{-1} [0; R_j],  W_j = A_j^{-1} [L_j; 0],

    whose top/bottom ``bw``-row strips close a block-TRIDIAGONAL system
    in the 2(D-1) interface strips ``u_k = [b_k; t_{k+1}]``.  The
    reduced system is factored once (host block-Thomas, dense inverses
    stored as (re, im) pairs) and each apply is:

        1. segment solves  g = blkdiag(A_j)^{-1} f      (shard_map, local)
        2. reduced sweep over D-1 boundaries             (replicated, MXU)
        3. segment solves of the coupling-corrected RHS  (shard_map, local)

    — two banded substitutions and a small dense sweep, NO outer Krylov.
    Memory stays strip-sized: the full spikes are never stored (the
    correction re-solves with the modified RHS instead).

    Exact up to the factor grade (f32 + the saddle regularization of
    the segment factors); callers drive to f64 with defect-correction
    refinement against the true operator (``sharded_si_eigensolve``'s
    ``spike="exact"`` path).  Parity: the distributed direct-solve role
    MPI MUMPS plays for the reference (``/root/reference/Solver/eigen2.py:104``).
    """

    pc: ShardedBandedPrecond
    Rr: jnp.ndarray  # (D-1, bw, bw) right coupling (rows: seg k bottom)
    Ri: jnp.ndarray
    Lr: jnp.ndarray  # (D-1, bw, bw) left coupling (rows: seg k+1 top)
    Li: jnp.ndarray
    Sinv_r: jnp.ndarray  # (D-1, 2bw, 2bw) block-Thomas Schur inverses
    Sinv_i: jnp.ndarray
    Msub_r: jnp.ndarray  # (D-1, 2bw, 2bw) forward multipliers (k=0: zero)
    Msub_i: jnp.ndarray
    Sup_r: jnp.ndarray  # (D-1, 2bw, 2bw) super blocks (k=D-2: zero)
    Sup_i: jnp.ndarray
    bw: int

    def tree_flatten(self):
        return (
            (self.pc, self.Rr, self.Ri, self.Lr, self.Li,
             self.Sinv_r, self.Sinv_i, self.Msub_r, self.Msub_i,
             self.Sup_r, self.Sup_i),
            (self.bw,),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def npad(self) -> int:
        return self.pc.npad

    @property
    def n(self) -> int:
        return self.pc.n

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
    ) -> "ShardedSpikeSolver":
        import time as _time

        t0 = _time.time()
        pc = ShardedBandedPrecond.build(
            C, n_segments, nb=nb, chunk=chunk, delta=delta)
        C = C.tocsr()
        n = C.shape[0]
        D = pc.num_segments
        ns = pc.dinv_r.shape[1]
        sr = ns * pc.nb
        npad = pc.npad
        perm = np.asarray(pc.perm)[:n]
        Cp = C[perm][:, perm].tocsr()
        coo = Cp.tocoo()
        bw_true = int(np.abs(coo.row - coo.col).max()) if coo.nnz else 0
        if -(-bw_true // nb) > pc.B:
            raise ValueError(
                f"bandwidth {bw_true} exceeds the segment factor width "
                f"{pc.B * nb}: the segment factors are truncated and the "
                "SPIKE reduced system cannot be exact")
        bw = pc.B * pc.nb
        Cpad = sp.block_diag(
            [Cp, sp.identity(npad - n, dtype=np.complex128)], format="csr")

        DB = D - 1
        Rb = np.zeros((max(DB, 1), bw, bw), np.complex128)
        Lb = np.zeros((max(DB, 1), bw, bw), np.complex128)
        for k in range(DB):
            r1 = (k + 1) * sr
            Rb[k] = Cpad[r1 - bw : r1, r1 : r1 + bw].toarray()
            Lb[k] = Cpad[r1 : r1 + bw, r1 - bw : r1].toarray()

        # spike strips via batched segment solves (bw RHS columns each)
        from lsafw_tpu.solver.band import _solve_banded

        batch = jax.jit(
            jax.vmap(
                partial(_solve_banded, B=pc.B, nb=pc.nb),
                in_axes=(None, None, None, None, 0, 0),
            )
        )

        def strips(j, blk, top_rows):
            """Top/bottom bw-row strips of A_j^{-1} [blk at top|bottom]."""
            rhs = np.zeros((bw, sr), np.complex128)
            if top_rows:
                rhs[:, :bw] = blk.T  # column c gets blk[:, c] in rows 0..bw
            else:
                rhs[:, sr - bw :] = blk.T
            rr = jnp.asarray(np.ascontiguousarray(rhs.real), jnp.float32)
            ri = jnp.asarray(np.ascontiguousarray(rhs.imag), jnp.float32)
            Xr, Xi = batch(
                pc.band_re[j], pc.band_im[j], pc.dinv_r[j], pc.dinv_i[j],
                rr.reshape(bw, ns, pc.nb), ri.reshape(bw, ns, pc.nb),
            )
            X = (np.asarray(Xr, np.float64)
                 + 1j * np.asarray(Xi, np.float64)).reshape(bw, sr)
            return X[:, :bw].T.copy(), X[:, sr - bw :].T.copy()

        Vt = np.zeros_like(Rb)
        Vb = np.zeros_like(Rb)
        Wt = np.zeros_like(Rb)
        Wb = np.zeros_like(Rb)
        for k in range(DB):
            Vt[k], Vb[k] = strips(k, Rb[k], top_rows=False)  # V_k
            Wt[k], Wb[k] = strips(k + 1, Lb[k], top_rows=True)  # W_{k+1}

        # reduced block-tridiagonal factor (host block-Thomas)
        I2 = np.eye(bw)
        Sinv = np.zeros((max(DB, 1), 2 * bw, 2 * bw), np.complex128)
        Msub = np.zeros_like(Sinv)
        Sup = np.zeros_like(Sinv)
        for k in range(DB):
            if k < DB - 1:
                Sup[k, bw:, bw:] = Vt[k + 1]
        prev_Sinv = None
        for k in range(DB):
            Dk = np.block([[I2, Vb[k]], [Wt[k], I2]])
            if k == 0:
                Sk = Dk
            else:
                Sub_k = np.zeros((2 * bw, 2 * bw), np.complex128)
                Sub_k[:bw, :bw] = Wb[k - 1]  # W_k^bot acting on b_{k-1}
                Msub[k] = Sub_k @ prev_Sinv
                Sk = Dk - Msub[k] @ Sup[k - 1]
            Sinv[k] = np.linalg.inv(Sk)
            prev_Sinv = Sinv[k]

        logger.info(
            "ShardedSpikeSolver: %d boundaries, bw=%d (reduced blocks "
            "%dx%d; built in %.1fs)",
            DB, bw, 2 * bw, 2 * bw, _time.time() - t0,
        )

        def pair(a):
            return (jnp.asarray(np.ascontiguousarray(a.real), jnp.float32),
                    jnp.asarray(np.ascontiguousarray(a.imag), jnp.float32))

        Rr, Ri = pair(Rb)
        Lr, Li = pair(Lb)
        Sr_, Si_ = pair(Sinv)
        Mr_, Mi_ = pair(Msub)
        Pr_, Pi_ = pair(Sup)
        return cls(pc, Rr, Ri, Lr, Li, Sr_, Si_, Mr_, Mi_, Pr_, Pi_, bw)

    # ------------------------------------------------------------------
    def solve_pair_sharded(self, br, bi, mesh, axis: str = "dof"):
        """One exact-SPIKE solve of C x = b (pairs, original ordering,
        padded to npad).  Jit-safe with self as an argument pytree."""
        pc = self.pc
        D = pc.num_segments
        ns = pc.dinv_r.shape[1]
        sr = ns * pc.nb
        npad = pc.npad
        bw = self.bw
        brp = jnp.pad(br, (0, npad - br.shape[0])) if br.shape[0] < npad else br
        bip = jnp.pad(bi, (0, npad - bi.shape[0])) if bi.shape[0] < npad else bi
        b2r = brp[pc.perm].reshape(D, sr)
        b2i = bip[pc.perm].reshape(D, sr)

        g_r, g_i = pc.seg_solve_sharded(
            b2r.astype(jnp.float32).reshape(D, ns, pc.nb),
            b2i.astype(jnp.float32).reshape(D, ns, pc.nb), mesh, axis)
        g2r = g_r.reshape(D, sr).astype(jnp.float64)
        g2i = g_i.reshape(D, sr).astype(jnp.float64)

        if D > 1:
            # reduced RHS r_k = [g_k^bot ; g_{k+1}^top]
            rhs_r = jnp.concatenate(
                [g2r[:-1, sr - bw :], g2r[1:, :bw]], axis=1)
            rhs_i = jnp.concatenate(
                [g2i[:-1, sr - bw :], g2i[1:, :bw]], axis=1)

            def fstep(carry, xs):
                yr_, yi_ = carry
                Mr, Mi, rr_, ri_ = xs
                yr = rr_ - (Mr @ yr_ - Mi @ yi_)
                yi = ri_ - (Mr @ yi_ + Mi @ yr_)
                return (yr, yi), (yr, yi)

            z2 = jnp.zeros(2 * bw)
            _, (Yr, Yi) = jax.lax.scan(
                fstep, (z2, z2),
                (self.Msub_r.astype(jnp.float64),
                 self.Msub_i.astype(jnp.float64), rhs_r, rhs_i))

            def bstep(carry, xs):
                ur_, ui_ = carry
                Sr, Si, Pr, Pi, yr_, yi_ = xs
                zr = yr_ - (Pr @ ur_ - Pi @ ui_)
                zi = yi_ - (Pr @ ui_ + Pi @ ur_)
                ur = Sr @ zr - Si @ zi
                ui = Sr @ zi + Si @ zr
                return (ur, ui), (ur, ui)

            _, (Ur, Ui) = jax.lax.scan(
                bstep, (z2, z2),
                (self.Sinv_r.astype(jnp.float64),
                 self.Sinv_i.astype(jnp.float64),
                 self.Sup_r.astype(jnp.float64),
                 self.Sup_i.astype(jnp.float64), Yr, Yi),
                reverse=True)

            bvec_r, tvec_r = Ur[:, :bw], Ur[:, bw:]
            bvec_i, tvec_i = Ui[:, :bw], Ui[:, bw:]

            Rr = self.Rr.astype(jnp.float64)
            Ri = self.Ri.astype(jnp.float64)
            Lr = self.Lr.astype(jnp.float64)
            Li = self.Li.astype(jnp.float64)
            cb_r = jnp.einsum("kij,kj->ki", Rr, tvec_r) - jnp.einsum(
                "kij,kj->ki", Ri, tvec_i)
            cb_i = jnp.einsum("kij,kj->ki", Rr, tvec_i) + jnp.einsum(
                "kij,kj->ki", Ri, tvec_r)
            ct_r = jnp.einsum("kij,kj->ki", Lr, bvec_r) - jnp.einsum(
                "kij,kj->ki", Li, bvec_i)
            ct_i = jnp.einsum("kij,kj->ki", Lr, bvec_i) + jnp.einsum(
                "kij,kj->ki", Li, bvec_r)
            b2r = b2r.at[:-1, sr - bw :].add(-cb_r)
            b2i = b2i.at[:-1, sr - bw :].add(-cb_i)
            b2r = b2r.at[1:, :bw].add(-ct_r)
            b2i = b2i.at[1:, :bw].add(-ct_i)

        x_r, x_i = pc.seg_solve_sharded(
            b2r.astype(jnp.float32).reshape(D, ns, pc.nb),
            b2i.astype(jnp.float32).reshape(D, ns, pc.nb), mesh, axis)
        xr = x_r.reshape(npad).astype(jnp.float64)
        xi = x_i.reshape(npad).astype(jnp.float64)
        out_r = jnp.zeros(npad).at[: pc.n].set(xr[pc.iperm])
        out_i = jnp.zeros(npad).at[: pc.n].set(xi[pc.iperm])
        return out_r, out_i
