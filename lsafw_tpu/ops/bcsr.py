"""Block-compressed-sparse-row SpMV — the unstructured gather-wall fix.

Round-2/3 measurements put XLA's per-INDEX gather cost at ~7 ns
regardless of locality, which capped every scalar-gather SpMV (ELL at
520k DOFs: 295 ms, 0.09x one scipy core).  The round-3 probe
(``scripts/dev_block_gather.py``) showed the cost is per index, not per
element: gathering (1, W) contiguous slices runs at 0.035-0.45
ns/element for W = 8..128 — two orders of magnitude under the wall.

So the TPU-native unstructured SpMV is BCSR: rows in groups of ``br``,
columns in blocks of ``bc``; per row group an ELL-style padded list of
column-block ids.  The apply is one slice-gather of x blocks
(``KB * n/br`` indices instead of ``nnz``) followed by a dense
(br, bc) x (bc,) contraction per block — pure VPU/MXU work.

The layout only works on a bandwidth-reduced ordering: RCM clusters
the columns of adjacent rows into a handful of blocks (measured on the
43k cylinder Jacobian: 4.3 column-blocks of 128 per 8-row group vs ~30
scattered singles unpermuted).  The plan shares the native-RCM
permutation infrastructure with :mod:`lsafw_tpu.solver.band`, and the
operator exposes ``matvec_permuted`` so a banded-SI refinement loop
(band solve -> residual matvec) can run end-to-end in permuted
coordinates with no per-iteration permutation gathers.

f64 path: the value blocks are read LINEARLY (no gather), so they can
be stored as native f64; only the x-block gather must avoid emulated
f64 — x rides as hi/lo f32 channels (exactly representable splits,
recombined in-register), and the contraction runs as multiply+reduce
in f64 on the VPU (the ddot-clean formulation; the MXU f64 dot drops
the low word).

Parity: PETSc MatMult as the per-iteration Krylov workhorse
(``/root/reference/Solver/utils.py:395-403``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 8


# Host-CPU jitted planning arithmetic (pinned to the CPU backend by the
# caller's jax.default_device context): this VM's numpy runs scalar
# loops for elementwise integer/float passes, ~500x slower than XLA.
from functools import partial as _partial


@_partial(jax.jit, static_argnums=(3, 4, 5))
def _plan_key(rows, cols, iperm, br, bc, NCB):
    pr = iperm[rows]
    pc = iperm[cols]
    gid = pr // jnp.int32(br)
    key = gid * jnp.int32(NCB) + pc // jnp.int32(bc)
    return pr, pc, gid, key


@_partial(jax.jit, static_argnums=(1,))
def _split_key(uk, NCB):
    return uk // jnp.int32(NCB), uk % jnp.int32(NCB)


@jax.jit
def _plan_kidx(uk, key, offs, gid):
    return (jnp.searchsorted(uk, key) - offs[gid]).astype(jnp.int32)


@_partial(jax.jit, static_argnums=(4, 5, 6))
def _plan_pos(gid, kidx, pr, pc, br, bc, KB):
    inner = (gid * jnp.int32(KB) + kidx) * jnp.int32(br) + pr % jnp.int32(br)
    return inner, pc % jnp.int32(bc)


@dataclass(frozen=True, eq=False)
class BCSRPlan:
    """Host-built BCSR structure for one sparsity pattern.

    ``pos``: flat scatter targets (nnz,) into the (NBR, KB, br, bc)
    value buffer, in the PERMUTED CSR entry order given by ``entry_of``
    (entry_of[k] = original CSR entry feeding permuted slot k).
    """

    perm: np.ndarray  # (n,) permuted index -> original
    iperm: np.ndarray  # (n,) original -> permuted
    perm_d: jnp.ndarray
    iperm_d: jnp.ndarray
    colblk: jnp.ndarray  # (NBR, KB) int32 column-block ids (pad: 0)
    pos: jnp.ndarray  # (nnz,) int32/int64 flat slots into the value buffer
    n: int
    br: int
    bc: int
    KB: int
    NBR: int
    NCB: int
    nnz: int

    @property
    def stored(self) -> int:
        return self.NBR * self.KB * self.br * self.bc

    @classmethod
    def build(cls, A: sp.spmatrix, *, br: int = 8, bc: int = 128,
              perm: np.ndarray | None = None) -> "BCSRPlan":
        """Build from a (pattern-bearing) scipy matrix; ``perm`` defaults
        to the native RCM ordering (shared with the band planner)."""
        from lsafw_tpu.solver.band import rcm_permutation

        A = sp.csr_matrix(A)
        n = A.shape[0]
        if perm is None:
            perm = rcm_permutation(A)
        perm = np.asarray(perm, dtype=np.int32)
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(n, dtype=np.int32)

        NBR = -(-n // br)
        NCB = -(-n // bc)
        # Permuted coordinates of every ORIGINAL CSR entry — pure index
        # arithmetic, no permuted-matrix materialization (the scipy
        # A[perm][:, perm] route costs minutes at 15M nnz).  The
        # elementwise passes run through jitted jax on the HOST CPU:
        # this VM's numpy has no SIMD integer (or even f64) loops —
        # measured 31 s for one 15M-element multiply+floor vs 0.04 s
        # through XLA.
        if NBR * NCB >= 2**31:
            raise ValueError("pattern too large for int32 BCSR planning")
        rows_orig = np.repeat(np.arange(n, dtype=np.int32), np.diff(A.indptr))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pr_j, pc_j, gid_j, key_j = _plan_key(
                jnp.asarray(rows_orig), jnp.asarray(A.indices.astype(np.int32)),
                jnp.asarray(iperm), br, bc, NCB)
            key = np.asarray(key_j)

        # per-group unique column blocks via one combined-key unique
        # (sorted group-major, block ascending)
        uk = np.unique(key)
        with jax.default_device(cpu):
            ug_j, blk_j = _split_key(jnp.asarray(uk), NCB)
            ug = np.asarray(ug_j)
            ublk = np.asarray(blk_j)
        counts = np.bincount(ug, minlength=NBR)
        KB = int(counts.max())
        offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        with jax.default_device(cpu):
            kidx_j = _plan_kidx(jnp.asarray(uk), key_j, jnp.asarray(offs), gid_j)
            kidx = np.asarray(kidx_j)

        colblk = np.zeros((NBR, KB), dtype=np.int32)
        colblk[ug, np.arange(len(uk), dtype=np.int32) - offs[ug]] = ublk

        # flat value-buffer slot of every ORIGINAL CSR entry: the
        # pre-column part fits int32 (< stored/bc); widen only at the
        # final combine when the buffer crosses 2^31
        stored_total = NBR * KB * br * bc
        with jax.default_device(cpu):
            inner_j, remc_j = _plan_pos(gid_j, kidx_j, pr_j, pc_j, br, bc, KB)
            if stored_total < 2**31:
                pos_of_orig = np.asarray(inner_j * jnp.int32(bc) + remc_j)
            else:  # rare; numpy int64 is slow on this VM but correct
                pos_of_orig = (np.asarray(inner_j).astype(np.int64) * bc
                               + np.asarray(remc_j))

        stored = NBR * KB * br * bc
        logger.info(
            "BCSRPlan: n=%d nnz=%d br=%d bc=%d KB=%d stored=%.1fM fill=%.3f",
            n, A.nnz, br, bc, KB, stored / 1e6, A.nnz / stored,
        )
        idx_dtype = jnp.int32 if stored < 2**31 else jnp.int64
        return cls(
            perm=perm, iperm=iperm,
            perm_d=jnp.asarray(perm), iperm_d=jnp.asarray(iperm),
            colblk=jnp.asarray(colblk),
            pos=jnp.asarray(pos_of_orig, dtype=idx_dtype),
            n=n, br=br, bc=bc, KB=KB, NBR=NBR, NCB=NCB, nnz=int(A.nnz),
        )


def plan_for_pattern(A, *, br: int = 8, bc: int = 128) -> BCSRPlan:
    """Cached plan per (pattern identity, br, bc) — Newton refactors and
    sigma sweeps share one plan (same contract as ``band.plan_for_csr``)."""
    key = (id(A.pattern), br, bc)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0] is A.pattern:
        return hit[1]
    csr = sp.csr_matrix(
        (np.ones(A.pattern.nnz, np.float64), A.pattern.indices.copy(),
         A.pattern.indptr.copy()),
        shape=A.pattern.shape,
    )
    plan = BCSRPlan.build(csr, br=br, bc=bc)
    while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = (A.pattern, plan)
    return plan


@_partial(jax.jit, static_argnums=(2, 3), donate_argnums=())
def _fill_jit(pos, data, stored, dtype):
    flat = jnp.zeros(stored, dtype=dtype)
    return flat.at[pos].set(data.astype(dtype))


def _fill(plan: BCSRPlan, data: jnp.ndarray, dtype) -> jnp.ndarray:
    # jitted so XLA materializes ONE buffer (eager .at[].set copies the
    # zeros first — a 2.7 GB transient per fill at production sizes)
    flat = _fill_jit(plan.pos, data, plan.stored, dtype)
    return flat.reshape(plan.NBR, plan.KB, plan.br, plan.bc)


@_partial(jax.jit, static_argnums=(2, 3), donate_argnums=())
def _fill_grid_jit(pos, data, shape, dtype):
    """Scatter CSR values STRAIGHT into the padded (S, C, KB, br, bc)
    scan grid: the grid is a zero-padded contiguous reshape of the flat
    store, so the flat scatter offsets are unchanged and the pad rows
    are the zeros never written.  One output buffer — the eager
    fill -> pad -> reshape chain peaked at ~3x the value storage per
    operand stacked on the band factor (the 167k eigen-stage OOM)."""
    flat = jnp.zeros(int(np.prod(shape)), dtype=dtype)
    flat = flat.at[pos].set(data.astype(dtype))
    return flat.reshape(shape)


def _fill_grid(plan: BCSRPlan, data: jnp.ndarray, S: int, C: int,
               dtype) -> jnp.ndarray:
    return _fill_grid_jit(
        plan.pos, data, (S, C, plan.KB, plan.br, plan.bc), dtype)


def _split_hi_lo(x: jnp.ndarray):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


@jax.tree_util.register_pytree_node_class
@dataclass
class BCSROperator:
    """One real matrix in BCSR layout (f64 values, f32 shadow)."""

    vals: jnp.ndarray  # (NBR, KB, br, bc) f64
    vals32: jnp.ndarray  # f32 shadow for the fast path
    colblk: jnp.ndarray
    perm: jnp.ndarray
    iperm: jnp.ndarray
    n: int
    br: int
    bc: int
    NCB: int

    def tree_flatten(self):
        return ((self.vals, self.vals32, self.colblk, self.perm, self.iperm),
                (self.n, self.br, self.bc, self.NCB))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def from_csr(cls, A, plan: BCSRPlan | None = None, *,
                 br: int = 8, bc: int = 128,
                 shadow32: bool = True) -> "BCSROperator":
        if plan is None:
            plan = plan_for_pattern(A, br=br, bc=bc)
        vals = _fill(plan, A.data, jnp.float64)
        return cls(vals, vals.astype(jnp.float32) if shadow32 else None,
                   plan.colblk, plan.perm_d, plan.iperm_d,
                   plan.n, plan.br, plan.bc, plan.NCB)

    # -- permuted-space applies ----------------------------------------
    def _xblocks(self, xp: jnp.ndarray, dtype):
        """Pad permuted x to block grid and slice-gather (NBR, KB, bc)."""
        npad = self.NCB * self.bc
        xb = jnp.pad(xp.astype(dtype), (0, npad - self.n)).reshape(self.NCB, self.bc)
        return xb[self.colblk]

    def matvec_permuted32(self, xp: jnp.ndarray) -> jnp.ndarray:
        xg = self._xblocks(xp, jnp.float32)
        y = jnp.einsum("gkrc,gkc->gr", self.vals32, xg)
        return y.reshape(-1)[: self.n]

    def matvec_permuted(self, xp: jnp.ndarray) -> jnp.ndarray:
        """Clean-f64 apply: x gathered as hi/lo f32 channels, values read
        linearly as f64, multiply+reduce on the VPU."""
        hi, lo = _split_hi_lo(xp)
        npad = self.NCB * self.bc
        pad = lambda v: jnp.pad(v, (0, npad - self.n)).reshape(self.NCB, self.bc)
        xg = (pad(hi)[self.colblk].astype(jnp.float64)
              + pad(lo)[self.colblk].astype(jnp.float64))
        prod = self.vals * xg[:, :, None, :]
        return prod.sum(axis=(1, 3)).reshape(-1)[: self.n]

    def matvec_pair_permuted(self, xr: jnp.ndarray, xi: jnp.ndarray):
        """Real operator on a complex pair: one linear read of the value
        blocks serves both channels (the ``Mop`` slot of the banded SI)."""
        hi_r, lo_r = _split_hi_lo(xr)
        hi_i, lo_i = _split_hi_lo(xi)
        npad = self.NCB * self.bc
        pad = lambda v: jnp.pad(v, (0, npad - self.n)).reshape(self.NCB, self.bc)
        xgr = (pad(hi_r)[self.colblk].astype(jnp.float64)
               + pad(lo_r)[self.colblk].astype(jnp.float64))
        xgi = (pad(hi_i)[self.colblk].astype(jnp.float64)
               + pad(lo_i)[self.colblk].astype(jnp.float64))
        yr = (self.vals * xgr[:, :, None, :]).sum(axis=(1, 3))
        yi = (self.vals * xgi[:, :, None, :]).sum(axis=(1, 3))
        return yr.reshape(-1)[: self.n], yi.reshape(-1)[: self.n]

    def matvec_pair(self, xr: jnp.ndarray, xi: jnp.ndarray):
        from lsafw_tpu.ops.exact import gather_f64_fast

        xrp = gather_f64_fast(xr, self.perm)
        xip = gather_f64_fast(xi, self.perm)
        yr, yi = self.matvec_pair_permuted(xrp, xip)
        return gather_f64_fast(yr, self.iperm), gather_f64_fast(yi, self.iperm)

    # -- public (original-order) applies -------------------------------
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        from lsafw_tpu.ops.exact import gather_f64_fast

        xp = gather_f64_fast(x, self.perm)
        yp = self.matvec_permuted(xp)
        return gather_f64_fast(yp, self.iperm)

    def matvec32(self, x: jnp.ndarray) -> jnp.ndarray:
        xp = x.astype(jnp.float32)[self.perm]
        yp = self.matvec_permuted32(xp)
        return yp[self.iperm]


@jax.tree_util.register_pytree_node_class
@dataclass
class BCSRPairOperator:
    """Complex operator C = Cr + i Ci in BCSR layout; the refinement
    residual matvec of the banded shift-invert (replaces the ~100 ms
    element-op apply on production meshes)."""

    vr: jnp.ndarray  # (NBR, KB, br, bc) f64
    vi: jnp.ndarray
    colblk: jnp.ndarray
    perm: jnp.ndarray
    iperm: jnp.ndarray
    n: int
    br: int
    bc: int
    NCB: int

    def tree_flatten(self):
        return ((self.vr, self.vi, self.colblk, self.perm, self.iperm),
                (self.n, self.br, self.bc, self.NCB))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def from_csr_pair(cls, Ar, Ai_data, plan: BCSRPlan | None = None, *,
                      br: int = 8, bc: int = 128) -> "BCSRPairOperator":
        """``Ar``: CSRMatrix (real part); ``Ai_data``: imag data on the
        same pattern (or None for a real operator)."""
        if plan is None:
            plan = plan_for_pattern(Ar, br=br, bc=bc)
        vr = _fill(plan, Ar.data, jnp.float64)
        vi = _fill(plan, Ai_data if Ai_data is not None
                   else jnp.zeros_like(Ar.data), jnp.float64)
        return cls(vr, vi, plan.colblk, plan.perm_d, plan.iperm_d,
                   plan.n, plan.br, plan.bc, plan.NCB)

    def _xg(self, xp: jnp.ndarray):
        hi, lo = _split_hi_lo(xp)
        npad = self.NCB * self.bc
        pad = lambda v: jnp.pad(v, (0, npad - self.n)).reshape(self.NCB, self.bc)
        return (pad(hi)[self.colblk].astype(jnp.float64)
                + pad(lo)[self.colblk].astype(jnp.float64))

    def matvec_pair_permuted(self, xr: jnp.ndarray, xi: jnp.ndarray):
        xgr, xgi = self._xg(xr), self._xg(xi)
        red = lambda V, X: (V * X[:, :, None, :]).sum(axis=(1, 3))
        yr = red(self.vr, xgr) - red(self.vi, xgi)
        yi = red(self.vr, xgi) + red(self.vi, xgr)
        return yr.reshape(-1)[: self.n], yi.reshape(-1)[: self.n]

    def matvec_pair(self, xr: jnp.ndarray, xi: jnp.ndarray):
        from lsafw_tpu.ops.exact import gather_f64_fast

        xrp = gather_f64_fast(xr, self.perm)
        xip = gather_f64_fast(xi, self.perm)
        yr, yi = self.matvec_pair_permuted(xrp, xip)
        return gather_f64_fast(yr, self.iperm), gather_f64_fast(yi, self.iperm)


@jax.tree_util.register_pytree_node_class
@dataclass
class BCSRShiftedOp:
    """C = A - sigma M with A and M stored as BCSR value blocks and
    sigma a traced scalar pair.

    2/3 the memory of materializing (Re C, Im C, M) — Im C = -Im(sigma) M
    never exists — and a sigma SWEEP refactors with zero refill: the
    shift lives in the pytree leaves, so one compiled apply serves every
    sigma.  The C apply fuses the A- and M-reductions over ONE set of
    x-block gathers.  ``mass_pair`` serves M x over the same storage
    (the eigen solver's ``_si_apply_M`` calls it directly — wrapping it
    in a mass-view adapter passed as a separate pytree leaf would
    duplicate the value blocks in every jitted program's parameter
    list).
    """

    vA: jnp.ndarray  # (S, C, KB, br, bc) f64, group-padded to the scan grid
    vM: jnp.ndarray
    colblk: jnp.ndarray  # (S*C, KB) — pad groups point at block 0
    perm: jnp.ndarray
    iperm: jnp.ndarray
    sig_re: jnp.ndarray
    sig_im: jnp.ndarray
    n: int
    br: int
    bc: int
    NCB: int
    chunk: int  # C: row groups per scan step

    def tree_flatten(self):
        return ((self.vA, self.vM, self.colblk, self.perm, self.iperm,
                 self.sig_re, self.sig_im),
                (self.n, self.br, self.bc, self.NCB, self.chunk))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def from_csr(cls, A, M, sigma: complex, plan: BCSRPlan | None = None, *,
                 br: int = 16, bc: int = 128) -> "BCSRShiftedOp":
        if plan is None:
            plan = plan_for_pattern(A, br=br, bc=bc)
        # pad the group axis to an S x C scan grid (<= S-1 extra groups)
        # and store GRIDDED (5-D) — a per-apply reshape of multi-GB f64
        # buffers is not reliably free under TPU tiling.  The values are
        # scattered DIRECTLY into the gridded layout (one buffer per
        # operand; see _fill_grid_jit).
        NBR = plan.NBR
        S = -(-NBR // 512)
        C = -(-NBR // S)
        padg = S * C - NBR
        vA = _fill_grid(plan, A.data, S, C, jnp.float64)
        vM = _fill_grid(plan, M.data, S, C, jnp.float64)
        pad4 = lambda a: jnp.pad(a, ((0, padg),) + ((0, 0),) * (a.ndim - 1))
        colblk = (pad4(plan.colblk) if padg else plan.colblk)
        return cls(vA, vM, colblk, plan.perm_d, plan.iperm_d,
                   jnp.asarray(sigma.real, jnp.float64),
                   jnp.asarray(sigma.imag, jnp.float64),
                   plan.n, plan.br, plan.bc, plan.NCB, C)

    def _xg(self, xp: jnp.ndarray):
        hi, lo = _split_hi_lo(xp)
        npad = self.NCB * self.bc
        pad = lambda v: jnp.pad(v, (0, npad - self.n)).reshape(self.NCB, self.bc)
        return (pad(hi)[self.colblk].astype(jnp.float64)
                + pad(lo)[self.colblk].astype(jnp.float64))

    def _grid(self, a: jnp.ndarray):
        """Grid small per-apply arrays (x blocks) for the scan; the
        value buffers are stored pre-gridded."""
        S = a.shape[0] // self.chunk
        return a.reshape(S, self.chunk, *a.shape[1:])

    def _reduce_all(self, xgr: jnp.ndarray, xgi: jnp.ndarray):
        """(A xr, A xi, M xr, M xi) via ONE scan over row-group chunks.

        A monolithic ``(V * X).sum`` materializes vals-sized f64
        temporaries; with four reductions alive inside a fused Arnoldi
        program XLA's buffer assignment wanted 24 GB at 175k DOFs (the
        round-1/2 ">100k fused-expand kernel fault", finally root-caused
        as a compile-time HBM overrun).  Scanning chunks of row groups
        reads each value block exactly once and bounds live temporaries
        to chunk size (~tens of MB)."""

        def step(_, vx):
            va, vm, xr_, xi_ = vx
            red = lambda V, X: (V * X[:, :, None, :]).sum(axis=(1, 3))
            return None, (red(va, xr_), red(va, xi_), red(vm, xr_), red(vm, xi_))

        _, (Ar, Ai, Mr, Mi) = jax.lax.scan(
            step, None,
            (self.vA, self.vM, self._grid(xgr), self._grid(xgi)))
        unp = lambda a: a.reshape(-1)[: self.n]
        return unp(Ar), unp(Ai), unp(Mr), unp(Mi)

    def matvec_pair_permuted(self, xr: jnp.ndarray, xi: jnp.ndarray):
        """(A - sigma M) (xr + i xi) in permuted coordinates."""
        Ar, Ai, Mr, Mi = self._reduce_all(self._xg(xr), self._xg(xi))
        yr = Ar - (self.sig_re * Mr - self.sig_im * Mi)
        yi = Ai - (self.sig_re * Mi + self.sig_im * Mr)
        return yr, yi

    def mass_pair_permuted(self, xr: jnp.ndarray, xi: jnp.ndarray):
        """M-only scan (the shift-invert RHS): reads just the vM blocks."""

        def step(_, vx):
            vm, xr_, xi_ = vx
            red = lambda V, X: (V * X[:, :, None, :]).sum(axis=(1, 3))
            return None, (red(vm, xr_), red(vm, xi_))

        xgr, xgi = self._xg(xr), self._xg(xi)
        _, (Mr, Mi) = jax.lax.scan(
            step, None, (self.vM, self._grid(xgr), self._grid(xgi)))
        return Mr.reshape(-1)[: self.n], Mi.reshape(-1)[: self.n]

    def matvec_pair(self, xr: jnp.ndarray, xi: jnp.ndarray):
        from lsafw_tpu.ops.exact import gather_f64_fast

        xrp = gather_f64_fast(xr, self.perm)
        xip = gather_f64_fast(xi, self.perm)
        yr, yi = self.matvec_pair_permuted(xrp, xip)
        return gather_f64_fast(yr, self.iperm), gather_f64_fast(yi, self.iperm)

    def mass_pair(self, xr: jnp.ndarray, xi: jnp.ndarray):
        from lsafw_tpu.ops.exact import gather_f64_fast

        xrp = gather_f64_fast(xr, self.perm)
        xip = gather_f64_fast(xi, self.perm)
        yr, yi = self.mass_pair_permuted(xrp, xip)
        return gather_f64_fast(yr, self.iperm), gather_f64_fast(yi, self.iperm)

def operator_for_budget(A, *, br: int = 16, bc: int = 128,
                        shadow32: bool = False):
    """Best-effort BCSR operator for refinement matvecs: returns None
    (caller keeps its scalar-gather path) when planning fails or the
    padded blocks would bust ``LSAFW_BCSR_MEM_GB`` (default 6)."""
    import os

    try:
        plan = plan_for_pattern(A, br=br, bc=bc)
    except Exception as e:
        logger.warning("BCSR planning failed (%s); keeping ELL matvecs.", e)
        return None
    per_op = plan.stored * (8 + (4 if shadow32 else 0))
    budget = float(os.environ.get("LSAFW_BCSR_MEM_GB", "6")) * 1e9
    if per_op > budget:
        logger.info("BCSR blocks (%.1f GB) over budget; keeping ELL matvecs.",
                    per_op / 1e9)
        return None
    return BCSROperator.from_csr(A, plan, shadow32=shadow32)
