"""Device-resident preconditioners.

TPU-native subset of the reference's PETSc PC zoo
(``PreconditionerType``, ``Solver/utils.py:66-94``): pointwise Jacobi,
batched dense block-Jacobi (pure gather/solve array code that jits
onto the VPU/MXU), fine-grained-parallel ILU(0)/ICC/SSOR
(:mod:`lsafw_tpu.solver.ilu` — Chow-Patel fixed-point factorization,
Jacobi-sweep triangular applies), the unstructured P2->P1 multigrid
(:mod:`lsafw_tpu.solver.pmg`, the GAMG/hypre role) and the banded
factorizations (:mod:`lsafw_tpu.solver.band`, the MUMPS role).
"""

from __future__ import annotations

from enum import Enum
from typing import Callable

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.ops.sparse import CSRMatrix


class PreconditionerType(Enum):
    """(parity: ``Solver/utils.py:66-94``; unsupported PETSc types map
    to the closest TPU-native equivalent at call sites)."""

    NONE = "none"
    JACOBI = "jacobi"
    BLOCK_JACOBI = "bjacobi"
    LU = "lu"
    # multigrid family (the GAMG/hypre roles): structured geometric MG
    # lives in solver.multigrid / multigrid_nd; PMG is the unstructured
    # P2->P1 V-cycle (solver.pmg); GAMG is smoothed-aggregation AMG on
    # the bare matrix (solver.amg — no mesh/space info needed), with
    # HYPRE as an alias for the same role
    PMG = "pmg"
    GAMG = "gamg"
    HYPRE = "hypre"
    # fine-grained-parallel incomplete factorizations (solver.ilu):
    # Chow-Patel fixed-point ILU(0) with Jacobi-sweep triangular
    # applies; ICC maps to the same factorization (U = D L^T on SPD)
    ILU = "ilu"
    ICC = "icc"
    SOR = "sor"
    # additive Schwarz: on a single accelerator the zero-overlap ASM is
    # exactly block-Jacobi (the multi-device overlap role is the
    # sharded SPIKE preconditioner, solver.band_sharded)
    ASM = "asm"
    # direct-factorization roles: CHOLESKY and REDUNDANT (every rank
    # redundantly factors) both resolve to the full LU apply
    CHOLESKY = "cholesky"
    REDUNDANT = "redundant"
    # user-defined apply (PETSc PCSHELL): pass apply= to
    # make_preconditioner
    SHELL = "shell"

    @classmethod
    def from_string(cls, value: str) -> "PreconditionerType":
        return cls(value.lower().strip())


def jacobi(A: CSRMatrix) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Pointwise Jacobi M^-1 = diag(A)^-1."""
    d = A.diagonal()
    inv = jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)

    def apply(x):
        return inv * x

    return apply


def _block_jacobi_inv(A: CSRMatrix, block_size: int) -> jnp.ndarray:
    n = A.shape[0]
    bs = block_size
    nb = -(-n // bs)
    npad = nb * bs
    # host extraction of the block diagonal
    S = A.to_scipy().tocoo()
    rows, cols, vals = S.row, S.col, S.data
    same = rows // bs == cols // bs
    rows, cols, vals = rows[same], cols[same], vals[same]
    blocks = np.zeros((nb, bs, bs), dtype=vals.dtype)
    blocks[rows // bs, rows % bs, cols % bs] = vals
    # unit diagonal on padding rows and on zero-diagonal rows (the
    # pressure block of saddle-point operators has an empty diagonal;
    # treating those rows as identity keeps the preconditioner
    # nonsingular — the analog of PETSc's zero-pivot shift)
    diag = np.zeros(npad, dtype=vals.dtype)
    diag[:n] = np.asarray(A.diagonal())
    zero_rows = np.nonzero(diag == 0)[0]
    blocks[zero_rows // bs, zero_rows % bs, :] = 0.0
    blocks[:, :, :][zero_rows // bs, :, zero_rows % bs] = 0.0
    blocks[zero_rows // bs, zero_rows % bs, zero_rows % bs] = 1.0
    try:
        inv_blocks = np.linalg.inv(blocks)
    except np.linalg.LinAlgError:
        inv_blocks = np.stack([np.linalg.pinv(b_) for b_ in blocks])
    return jnp.asarray(inv_blocks)


def block_jacobi(A: CSRMatrix, block_size: int = 64) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Dense block-Jacobi over contiguous DOF blocks.

    Extracts the (nb, bs, bs) block diagonal on the host, inverts it in
    a single batched ``jnp.linalg.inv`` (MXU batched solve), and applies
    as a batched matmul — the TPU-shaped analog of PETSc's bjacobi+ILU
    sub-solves.  (Closure form for eager/CPU use; under jit pass
    :func:`block_jacobi_array` output as an argument with
    :func:`apply_pc`.)
    """
    inv = _block_jacobi_inv(A, block_size)

    def apply(x):
        return apply_pc("bjacobi", inv, x)

    return apply


def jacobi_array(A: CSRMatrix) -> jnp.ndarray:
    """Inverse-diagonal array for jit-argument preconditioning."""
    d = A.diagonal()
    return jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)


def block_jacobi_array(A: CSRMatrix, block_size: int = 64) -> jnp.ndarray:
    """(nb, bs, bs) inverted block diagonal for jit-argument use; same
    regularization rules as :func:`block_jacobi`."""
    return _block_jacobi_inv(A, block_size)


def apply_pc(kind: str, arr: jnp.ndarray | None, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a preconditioner passed as (static kind, array argument)."""
    if kind == "none" or arr is None:
        return x
    if kind == "jacobi":
        return arr * x
    if kind == "bjacobi":
        nb, bs, _ = arr.shape
        n = x.shape[0]
        npad = nb * bs
        xp = jnp.pad(x, (0, npad - n)).reshape(nb, bs)
        y = jnp.einsum("bij,bj->bi", arr, xp)
        return y.reshape(-1)[:n]
    raise ValueError(kind)


def make_preconditioner(
    A: CSRMatrix, pc_type: PreconditionerType | str, **kw
) -> Callable[[jnp.ndarray], jnp.ndarray] | None:
    pc_type = (
        PreconditionerType.from_string(pc_type) if isinstance(pc_type, str) else pc_type
    )
    if pc_type is PreconditionerType.NONE:
        return None
    if pc_type is PreconditionerType.JACOBI:
        return jacobi(A)
    if pc_type in (PreconditionerType.BLOCK_JACOBI, PreconditionerType.ASM):
        return block_jacobi(A, kw.get("block_size", 64))
    if pc_type in (
        PreconditionerType.LU,
        PreconditionerType.CHOLESKY,
        PreconditionerType.REDUNDANT,
    ):
        import jax

        from lsafw_tpu.solver.direct import SparseLU

        lu = SparseLU(A.to_scipy().tocsc())
        n = A.shape[0]
        dt = np.asarray(A.data).dtype

        def apply_lu(r):
            # the Krylov solvers trace their loops, so the host solve
            # rides a callback (the PREONLY/LU role; exact PC)
            return jax.pure_callback(
                lambda rr: lu.solve(np.asarray(rr)).astype(dt),
                jax.ShapeDtypeStruct((n,), dt),
                r,
            )

        return apply_lu
    if pc_type is PreconditionerType.SHELL:
        fn = kw.get("apply")
        if fn is None:
            raise ValueError("SHELL preconditioner requires apply=<callable>.")
        return fn
    if pc_type in (PreconditionerType.GAMG, PreconditionerType.HYPRE):
        from lsafw_tpu.solver.amg import amg_preconditioner

        return amg_preconditioner(
            A,
            theta=kw.get("theta", 0.08),
            coarse_size=kw.get("coarse_size", 200),
            omega=kw.get("omega", 0.7),
            smooth_steps=kw.get("smooth_steps", 2),
        )
    if pc_type in (PreconditionerType.ILU, PreconditionerType.ICC):
        from lsafw_tpu.solver.ilu import ilu0

        return ilu0(
            A,
            factor_sweeps=kw.get("factor_sweeps", 8),
            apply_sweeps=kw.get("apply_sweeps", 6),
        )
    if pc_type is PreconditionerType.SOR:
        from lsafw_tpu.solver.ilu import ssor

        return ssor(A, omega=kw.get("omega", 1.0), sweeps=kw.get("sweeps", 6))
    if pc_type is PreconditionerType.PMG:
        from lsafw_tpu.solver.pmg import build_pmg_pc

        pc = build_pmg_pc(
            kw["space"], A, kw["bc_mask"],
            fine_op=kw.get("fine_op"), nb=kw.get("nb", 64),
            omega=kw.get("omega", 0.7),
            smooth_steps=kw.get("smooth_steps", 3),
        )
        return pc.apply
    raise ValueError(f"Unsupported preconditioner: {pc_type}")
