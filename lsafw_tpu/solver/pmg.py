"""p-multigrid preconditioner for UNSTRUCTURED meshes (P2 -> P1).

The structured-grid geometric multigrid (:mod:`lsafw_tpu.solver.multigrid`,
``multigrid_nd``) covers box meshes; this module is the strong
preconditioner for general simplicial meshes — the role the reference
delegates to PETSc's GAMG/hypre (``/root/reference/Solver/utils.py:84-88``).

TPU-first design: the method is a TWO-level V-cycle whose every piece
maps to cheap device work —

  * **transfers are two gathers.**  Lagrange P2 node layout puts
    vertices at ``[0, nv)`` and edge midpoints at ``[nv, nv+ne)``
    (:func:`lsafw_tpu.fem.spaces.make_scalar_space`), and nodal P1->P2
    interpolation at an edge midpoint is the mean of the two endpoint
    vertices: prolongation = one copy + one 2-point gather per edge,
    restriction = its adjoint (one scatter-add).  No geometric
    hierarchy, no aggregation graph — the p-hierarchy ships with the
    space.
  * **the coarse problem is solved EXACTLY by the banded device
    factorization** (:mod:`lsafw_tpu.solver.band`).  The P1 Galerkin
    operator has ~1/4 the DOFs and ~1/2 the RCM bandwidth of the P2
    fine operator, so its band costs ~1/8 the fine-level band memory —
    this is what makes a *direct* coarse solve affordable where the
    fine band would bust the HBM budget (the VERDICT round-3 "band
    doesn't fit" regime).
  * smoothing is damped Jacobi (pure VPU work), as in the structured
    V-cycle.

With an exact coarse solve the two-level contraction for SPD Lagrange
operators is mesh-independent (classical p-MG theory); measured on an
unstructured-disc membrane stiffness this gives CG iteration counts
~5x below Jacobi and mesh-size-independent (tests/unit/test_pmg.py).

The preconditioner is a pytree whose ``apply`` jits cleanly inside
LOBPCG / CG / GMRES loops (:func:`lsafw_tpu.solver.power.lobpcg_smallest_pc`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@jax.tree_util.register_pytree_node_class
@dataclass
class PMGPreconditioner:
    """Two-level p-multigrid V-cycle: P2 Jacobi smoothing, exact banded
    P1 coarse solve, nodal transfers."""

    fine: object  # pytree operator exposing .matvec (CSRMatrix / ElementOperator)
    inv_diag: jnp.ndarray  # (n2,) f64, fine Jacobi inverse diagonal
    e0: jnp.ndarray  # (ne,) int32 edge endpoint vertex (node id)
    e1: jnp.ndarray  # (ne,) int32
    bc2: jnp.ndarray  # (n2,) bool fine Dirichlet mask
    bc1: jnp.ndarray  # (n1,) bool coarse Dirichlet mask
    coarse: object  # RealBandedLU / RealPivotedBandedLU (exposes solve_vec)
    nv: int  # vertices (coarse nodes)
    bs: int  # components per node
    omega: float
    smooth_steps: int

    def tree_flatten(self):
        return (
            (self.fine, self.inv_diag, self.e0, self.e1, self.bc2, self.bc1,
             self.coarse),
            (self.nv, self.bs, self.omega, self.smooth_steps),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    # -- transfers ------------------------------------------------------
    def prolong(self, c: jnp.ndarray) -> jnp.ndarray:
        """P1 -> P2 nodal interpolation (vertex copy + edge-midpoint mean)."""
        cn = c.reshape(self.nv, self.bs)
        mid = 0.5 * (cn[self.e0] + cn[self.e1])
        return jnp.concatenate([cn, mid], axis=0).reshape(-1)

    def restrict(self, f: jnp.ndarray) -> jnp.ndarray:
        """Adjoint of :meth:`prolong` (scatter-add edge rows to endpoints)."""
        fn = f.reshape(-1, self.bs)
        fv, fe = fn[: self.nv], 0.5 * fn[self.nv :]
        fv = fv.at[self.e0].add(fe).at[self.e1].add(fe)
        return fv.reshape(-1)

    # -- V-cycle --------------------------------------------------------
    def _matvec(self, x):
        return self.fine.matvec(x)

    def _smooth(self, x, b):
        for _ in range(self.smooth_steps):
            x = x + self.omega * self.inv_diag * (b - self._matvec(x))
        return x

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """One V-cycle approximating ``fine^-1 r``."""
        x = self._smooth(jnp.zeros_like(r), r)
        res = r - self._matvec(x)
        r1 = jnp.where(self.bc1, 0.0, self.restrict(jnp.where(self.bc2, 0.0, res)))
        e = self.coarse.solve_vec(r1)
        e = jnp.where(self.bc1, 0.0, e)
        x = x + jnp.where(self.bc2, 0.0, self.prolong(e))
        # Dirichlet rows are identity on the fine operator: pass r through
        x = jnp.where(self.bc2, r, x)
        return self._smooth(x, r)


def _coarse_galerkin(
    A2: CSRMatrix, nv: int, ne: int, bs: int,
    e0: np.ndarray, e1: np.ndarray, bc2: np.ndarray,
) -> tuple[sp.csr_matrix, np.ndarray]:
    """Host-side P^T A P with Dirichlet folding on the coarse level."""
    n2 = (nv + ne) * bs
    n1 = nv * bs
    # node-level prolongation, then blocked by Kronecker with I_bs
    rows = np.concatenate([np.arange(nv), nv + np.arange(ne), nv + np.arange(ne)])
    cols = np.concatenate([np.arange(nv), e0, e1])
    vals = np.concatenate([np.ones(nv), np.full(2 * ne, 0.5)])
    Pn = sp.coo_matrix((vals, (rows, cols)), shape=(nv + ne, nv)).tocsr()
    P = sp.kron(Pn, sp.identity(bs, format="csr"), format="csr") if bs > 1 else Pn
    A2h = A2.to_scipy()
    A1 = (P.T @ A2h @ P).tocsr()
    bc1 = np.asarray(bc2[:n1], dtype=bool)
    if bc1.any():
        # identity rows/cols at coarse Dirichlet DOFs
        d = np.ones(n1)
        d[bc1] = 0.0
        D = sp.diags(d)
        A1 = (D @ A1 @ D + sp.diags(np.where(bc1, 1.0, 0.0))).tocsr()
    A1.sum_duplicates()
    return A1, bc1


def build_pmg_pc(
    space2,
    A2: CSRMatrix,
    bc_mask2: np.ndarray,
    *,
    fine_op=None,
    omega: float = 0.7,
    smooth_steps: int = 3,
    nb: int = 64,
    delta: float = 0.0,
) -> PMGPreconditioner:
    """Build the p-MG V-cycle for a P2 Lagrange operator with Dirichlet
    identity rows.

    Args:
        space2: the P2 :class:`~lsafw_tpu.fem.spaces.FunctionSpace`
            (scalar or blocked vector) of the operator.
        A2: assembled fine CSRMatrix (used for the Jacobi diagonal, the
            Galerkin coarse product, and — unless ``fine_op`` is given —
            the fine matvec).
        bc_mask2: boolean Dirichlet mask over the fine DOFs.
        fine_op: optional matrix-free operator (e.g.
            :class:`~lsafw_tpu.ops.elementop.ElementOperator`) for the
            smoother/residual matvecs.
        nb: coarse band block size (small coarse problems are fine with
            64; production sizes use 128 for the Mosaic lane tiling).
    """
    from lsafw_tpu.fem.elements import ElementFamily
    from lsafw_tpu.solver.band import factor_auto, plan_for_csr

    if space2.element.family is not ElementFamily.P2:
        raise ValueError("p-multigrid requires a P2 space")
    mesh = space2.mesh
    nv, bs = mesh.num_vertices, space2.bs
    ne = space2.num_nodes - nv
    if ne != mesh.edges.shape[0]:
        raise ValueError("P2 node layout mismatch (vertices + edges expected)")
    e0 = mesh.edges[:, 0].astype(np.int32)
    e1 = mesh.edges[:, 1].astype(np.int32)
    bc2 = np.asarray(bc_mask2, dtype=bool)

    A1h, bc1 = _coarse_galerkin(A2, nv, ne, bs, e0, e1, bc2)
    A1 = CSRMatrix.from_scipy(A1h)
    plan = plan_for_csr(A1, nb=nb, real=True)
    lu, pivoted = factor_auto(plan, jnp.asarray(A1h.data, jnp.float64), delta=delta)
    logger.info(
        "p-MG: coarse P1 n=%d (fine n=%d), band B=%d nb=%d pivoted=%s",
        A1h.shape[0], A2.shape[0], plan.B, plan.nb, pivoted,
    )

    d = np.asarray(A2.diagonal())
    inv_diag = jnp.asarray(np.where(np.abs(d) > 0, 1.0 / np.where(d == 0, 1.0, d), 1.0))
    return PMGPreconditioner(
        fine=fine_op if fine_op is not None else A2,
        inv_diag=inv_diag,
        e0=jnp.asarray(e0), e1=jnp.asarray(e1),
        bc2=jnp.asarray(bc2), bc1=jnp.asarray(bc1),
        coarse=lu,
        nv=nv, bs=bs, omega=omega, smooth_steps=smooth_steps,
    )
