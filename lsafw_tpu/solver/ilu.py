"""TPU-native ILU(0) and SSOR preconditioning.

The reference reaches PETSc's ILU/ICC/SOR preconditioners through
``PreconditionerType`` (``/root/reference/Solver/utils.py:66-94``).
Sequential triangular factorizations and solves do not map to the
TPU's execution model, so this module uses the accelerator-native
formulations:

* factorization — **Chow-Patel fixed-point ILU** (SIAM J. Sci.
  Comput. 37(2), 2015): every nonzero's ILU(0) equation
  ``(LU)_ij = a_ij`` on the pattern is relaxed *in parallel*; one sweep
  is a gather + segment-sum over precomputed pattern-intersection
  triples (i,k,j).  Converges in a handful of sweeps on the
  diagonally-dominant-ish operators where ILU(0) is a sensible PC.
* triangular application — **Jacobi-sweep approximate solves** (the
  standard fine-grained-parallel substitute): ``L y = r`` with unit
  lower L iterates ``y <- r - L_strict y``; exact after the
  level-scheduling depth, truncated to a fixed count for
  preconditioning.

ICC(0) on an SPD matrix is served by the same factorization (there
``U = D L^T``, so ILU(0) carries the incomplete-Cholesky information
at 2x storage).  SSOR reuses the sweep application with L/U taken from
A itself — no factorization at all.

Zero diagonals (the pressure block of saddle-point operators) are
pivots ILU(0) cannot handle; they are replaced by unit pivots, which
degrades those rows toward identity — same policy as the block-Jacobi
regularization in :mod:`lsafw_tpu.solver.precond`.

Planning arithmetic routes through jitted jax pinned to the host CPU
(this VM's numpy runs scalar loops for elementwise passes; only numpy
C internals — repeat/cumsum/bincount/unique/searchsorted/indexing —
are used directly).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix


@partial(jax.jit, static_argnames=("n",))
def _hj_keys(rows, cols, n: int):
    return rows.astype(jnp.int64) * n + cols.astype(jnp.int64)


@jax.jit
def _hj_tri_masks(rows, cols):
    return cols < rows, cols > rows


@partial(jax.jit, static_argnames=("ntr", "nlow", "n"))
def _hj_expand(a, b, li, lp, uj, uq, u_start_k, keys, *, ntr: int, nlow: int, n: int):
    """Cartesian expansion of per-k (lower rows x upper cols) plus the
    (i, j)-in-pattern membership test.  All fixed-size XLA."""
    elem_rep = jnp.repeat(b, a, total_repeat_length=nlow)
    i_tr = jnp.repeat(li, elem_rep, total_repeat_length=ntr)
    p_tr = jnp.repeat(lp, elem_rep, total_repeat_length=ntr)
    csum = jnp.cumsum(elem_rep)
    run_starts = jnp.concatenate([jnp.zeros(1, csum.dtype), csum[:-1]])
    within = jnp.arange(ntr, dtype=jnp.int64) - jnp.repeat(
        run_starts, elem_rep, total_repeat_length=ntr)
    u_start = jnp.repeat(u_start_k, a, total_repeat_length=nlow)
    u_idx = jnp.repeat(u_start, elem_rep, total_repeat_length=ntr) + within
    j_tr = uj[u_idx]
    q_tr = uq[u_idx]
    key_tr = i_tr.astype(jnp.int64) * n + j_tr.astype(jnp.int64)
    pos = jnp.searchsorted(keys, key_tr)
    pos = jnp.minimum(pos, keys.shape[0] - 1)
    ok = keys[pos] == key_tr
    return pos.astype(jnp.int32), p_tr.astype(jnp.int32), q_tr.astype(jnp.int32), ok


@dataclass(eq=False)
class ILU0Plan:
    """Host-built static geometry of the Chow-Patel sweeps for one
    sparsity pattern."""

    n: int
    nnz: int
    tr_e: jnp.ndarray  # (ntr,) target slot of each intersection triple
    tr_p: jnp.ndarray  # (ntr,) slot of l_ik
    tr_q: jnp.ndarray  # (ntr,) slot of u_kj
    is_lower: jnp.ndarray  # (nnz,) bool: strictly-lower slot
    diag_of_col: jnp.ndarray  # (nnz,) slot of (j, j) for each entry's column j
    diag_slots: jnp.ndarray  # (n,) slot of (i, i)

    @classmethod
    def build(cls, pattern: sp.spmatrix) -> "ILU0Plan":
        """Enumerate the pattern-intersection triples (i,k,j) with
        (i,k), (k,j), (i,j) all in the pattern and k < min(i,j)."""
        S = pattern.tocsr()
        S.sort_indices()
        n, nnz = S.shape[0], S.nnz
        indptr = S.indptr.astype(np.int64)
        cols = S.indices.astype(np.int32)
        rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
        slots = np.arange(nnz, dtype=np.int64)

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            keys = np.asarray(_hj_keys(jnp.asarray(rows), jnp.asarray(cols), n))
            low_j, sup_j = _hj_tri_masks(jnp.asarray(rows), jnp.asarray(cols))
            lower = np.asarray(low_j)
            supper = np.asarray(sup_j)

        dpos = np.searchsorted(keys, np.arange(n, dtype=np.int64) * (n + 1))
        if not (
            (0 if n == 0 else int(dpos.max())) < nnz
            and np.array_equal(keys[dpos], np.arange(n, dtype=np.int64) * (n + 1))
        ):
            raise ValueError("ILU(0) requires a pattern with a full diagonal.")

        # strictly-upper part of each row k (u_kj candidates, j > k) and
        # strictly-lower part of each column k (l_ik candidates, i > k),
        # both carrying their CSR slot ids (+1 against implicit zeros)
        up_rows = rows[supper]
        U = sp.csr_matrix(
            (slots[supper] + 1, cols[supper],
             np.concatenate([[0], np.cumsum(np.bincount(up_rows, minlength=n))])),
            shape=(n, n))
        Lc = sp.csc_matrix(
            (slots[lower] + 1, (rows[lower], cols[lower])), shape=(n, n))

        a = np.diff(Lc.indptr).astype(np.int64)  # per-k lower count
        b = np.diff(U.indptr).astype(np.int64)  # per-k upper count
        nlow = int(a.sum())
        ntr = int((a * b).sum())
        if ntr > 300_000_000:
            raise ValueError(
                f"ILU(0) intersection planning would expand {ntr:.2e} "
                "triples — beyond this host's memory. Use gamg/pmg or "
                "the banded factorization at this scale."
            )
        if ntr == 0:
            e_tr = np.zeros(0, np.int32)
            p_tr = np.zeros(0, np.int32)
            q_tr = np.zeros(0, np.int32)
        else:
            with jax.default_device(cpu):
                pos, p_all, q_all, ok_j = _hj_expand(
                    jnp.asarray(a), jnp.asarray(b),
                    jnp.asarray(Lc.indices.astype(np.int64)),
                    jnp.asarray(Lc.data.astype(np.int64) - 1),
                    jnp.asarray(U.indices.astype(np.int64)),
                    jnp.asarray(U.data.astype(np.int64) - 1),
                    jnp.asarray(U.indptr.astype(np.int64)[:-1]),
                    jnp.asarray(keys),
                    ntr=ntr, nlow=nlow, n=n)
                pos = np.asarray(pos)
                p_all = np.asarray(p_all)
                q_all = np.asarray(q_all)
                ok = np.asarray(ok_j)
            keep = np.flatnonzero(ok)
            e_tr, p_tr, q_tr = pos[keep], p_all[keep], q_all[keep]
            order = np.argsort(e_tr, kind="stable")
            e_tr, p_tr, q_tr = e_tr[order], p_tr[order], q_tr[order]

        return cls(
            n=n,
            nnz=nnz,
            tr_e=jnp.asarray(e_tr, jnp.int32),
            tr_p=jnp.asarray(p_tr, jnp.int32),
            tr_q=jnp.asarray(q_tr, jnp.int32),
            is_lower=jnp.asarray(lower),
            diag_of_col=jnp.asarray(dpos[cols], jnp.int32),
            diag_slots=jnp.asarray(dpos, jnp.int32),
        )


jax.tree_util.register_pytree_node(
    ILU0Plan,
    lambda p: (
        (p.tr_e, p.tr_p, p.tr_q, p.is_lower, p.diag_of_col, p.diag_slots),
        (p.n, p.nnz),
    ),
    lambda aux, ch: ILU0Plan(aux[0], aux[1], *ch),
)


@partial(jax.jit, static_argnames=("sweeps",))
def ilu0_factor_values(plan: ILU0Plan, a: jnp.ndarray, *, sweeps: int = 8) -> jnp.ndarray:
    """Chow-Patel fixed-point sweeps.  Returns factor values in the
    CSR slot layout: strictly-lower slots hold ``l_ij`` (unit diagonal
    implicit), diagonal+upper slots hold ``u_ij``."""
    # unit-pivot regularization of empty/zero diagonals
    dvals = a[plan.diag_slots]
    safe = jnp.where(jnp.abs(dvals) > 0, dvals, 1.0)
    a = a.at[plan.diag_slots].set(safe)

    def sweep(vals, _):
        s = jax.ops.segment_sum(
            vals[plan.tr_p] * vals[plan.tr_q], plan.tr_e,
            num_segments=plan.nnz, indices_are_sorted=True,
        )
        new = a - s
        ujj = vals[plan.diag_of_col]
        ujj = jnp.where(jnp.abs(ujj) > 1e-300, ujj, 1.0)
        new = jnp.where(plan.is_lower, new / ujj, new)
        return new, None

    vals, _ = jax.lax.scan(sweep, a, None, length=sweeps)
    return vals


@partial(jax.jit, static_argnames=("sweeps",))
def _tri_apply(A: CSRMatrix, lvals, uvals, dinv, r, *, sweeps: int):
    """x ~= U^-1 L^-1 r by fixed Jacobi triangular sweeps (L unit
    lower held in ``lvals`` slots, U in ``uvals`` + ``1/diag(U)``).
    Sweeps ride ``lax.scan`` so the program stays one sweep deep."""
    from lsafw_tpu.ops.sparse import spmv

    Lm = CSRMatrix(A.pattern, lvals, A.dev)
    Um = CSRMatrix(A.pattern, uvals, A.dev)
    y, _ = jax.lax.scan(
        lambda y, _: (r - spmv(Lm, y), None), r, None, length=sweeps)
    x, _ = jax.lax.scan(
        lambda x, _: (dinv * (y - spmv(Um, x)), None), dinv * y, None,
        length=sweeps)
    return x


def ilu0(A: CSRMatrix, *, factor_sweeps: int = 8, apply_sweeps: int = 6):
    """ILU(0) preconditioner closure (parity: the PETSc PCILU/PCICC
    roles, ``Solver/utils.py:74-78``)."""
    plan = ILU0Plan.build(sp.csr_matrix(
        (np.ones(A.pattern.nnz), np.asarray(A.pattern.indices),
         np.asarray(A.pattern.indptr)), shape=A.shape))
    fvals = ilu0_factor_values(plan, A.data.astype(jnp.float64),
                               sweeps=factor_sweeps)
    lower = plan.is_lower
    lvals = jnp.where(lower, fvals, 0.0)
    uvals = jnp.where(lower, 0.0, fvals).at[plan.diag_slots].set(0.0)
    dinv = 1.0 / fvals[plan.diag_slots]

    def apply(r):
        return _tri_apply(A, lvals, uvals, dinv, r, sweeps=apply_sweeps)

    return apply


def ssor(A: CSRMatrix, *, omega: float = 1.0, sweeps: int = 6):
    """SSOR preconditioner closure (parity: PETSc PCSOR,
    ``Solver/utils.py:72``):
    M = (D/w + L) ((2-w)/w D)^-1 (D/w + U), with L/U/D from A and the
    triangular solves approximated by Jacobi sweeps."""
    dev = A.dev

    @jax.jit
    def _prep(data, cols, rows, diag_slots):
        lmask = (cols < rows).astype(data.dtype)
        umask = (cols > rows).astype(data.dtype)
        d = data[diag_slots]
        d = jnp.where(jnp.abs(d) > 0, d, 1.0)
        return data * lmask, data * umask, d

    lvals, uvals, d = _prep(A.data, dev.indices, dev.row_ids, dev.diag_slots)
    w = float(omega)

    @partial(jax.jit, static_argnames=("nsw",))
    def _apply(A, lvals, uvals, d, r, *, nsw: int):
        from lsafw_tpu.ops.sparse import spmv

        Lm = CSRMatrix(A.pattern, lvals, A.dev)
        Um = CSRMatrix(A.pattern, uvals, A.dev)
        dws_inv = w / d  # (D/w)^-1
        y, _ = jax.lax.scan(
            lambda y, _: (dws_inv * (r - spmv(Lm, y)), None),
            dws_inv * r, None, length=nsw)
        y = ((2.0 - w) / w) * d * y
        x, _ = jax.lax.scan(
            lambda x, _: (dws_inv * (y - spmv(Um, x)), None),
            dws_inv * y, None, length=nsw)
        return x

    def apply(r):
        return _apply(A, lvals, uvals, d, r, nsw=sweeps)

    return apply
