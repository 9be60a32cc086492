"""Sharded operators and vectors over a 1D device mesh.

The layout contract: the DOF axis is padded to a multiple of the mesh
size and sharded as ``P("dof")``; ELL matrix arrays are row-sharded
``P("dof", None)``.  SpMV's column gather then induces an all-gather of
the operand vector (the halo exchange over ICI), and reductions in the
Krylov solvers psum automatically — the GSPMD recipe: annotate
shardings, let XLA insert collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lsafw_tpu.ops.sparse import CSRMatrix


def device_mesh(devices=None, axis: str = "dof") -> Mesh:
    """1D device mesh over the DOF axis (the reference's MPI communicator
    analog, SURVEY.md section 2.3)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _padded(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def shard_vector(x, mesh: Mesh, axis: str = "dof"):
    """Pad to the mesh size and place with P(axis) sharding."""
    k = mesh.shape[axis]
    x = np.asarray(x)
    npad = _padded(x.shape[0], k)
    xp = np.zeros((npad,) + x.shape[1:], dtype=x.dtype)
    xp[: x.shape[0]] = x
    return jax.device_put(xp, NamedSharding(mesh, P(axis)))


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedOperator:
    """Row-sharded ELL operator with padded shape (npad, w).  A pytree:
    pass through jit as an argument."""

    data: jnp.ndarray  # (npad, w) P(dof, None)
    cols: jnp.ndarray  # (npad, w) int32 P(dof, None)
    n: int  # logical size
    npad: int
    mesh: Mesh

    def tree_flatten(self):
        return (self.data, self.cols), (self.n, self.npad, self.mesh)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], *aux)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A x on padded sharded vectors (jit-safe)."""
        return (self.data * x[self.cols]).sum(axis=1)

    def __matmul__(self, x):
        return self.matvec(x)


def shard_csr(A: CSRMatrix, mesh: Mesh, axis: str = "dof") -> ShardedOperator:
    """Convert a CSRMatrix to a row-sharded padded ELL operator."""
    ell_map, ell_cols, w = A.pattern.ell
    data = np.where(ell_map >= 0, np.asarray(A.data)[ell_map], 0.0)
    k = mesh.shape[axis]
    n = A.shape[0]
    npad = _padded(n, k)
    dp = np.zeros((npad, max(w, 1)), dtype=data.dtype)
    cp = np.zeros((npad, max(w, 1)), dtype=np.int32)
    if w:
        dp[:n] = data
        cp[:n] = ell_cols
    sh = NamedSharding(mesh, P(axis, None))
    return ShardedOperator(
        data=jax.device_put(dp, sh),
        cols=jax.device_put(cp, sh),
        n=n,
        npad=npad,
        mesh=mesh,
    )


def sharded_eigensolve(
    A: CSRMatrix,
    mesh: Mesh,
    *,
    nev: int,
    ncv: int | None = None,
    which="largest_magnitude",
    tol: float = 1e-10,
    max_restarts: int = 200,
    locality: tuple[object, np.ndarray] | None = None,
    axis: str = "dof",
):
    """Multi-device Krylov-Schur on a row-sharded operator.

    The (ncv+1, n) Krylov basis is sharded ``P(None, axis)`` and the
    operator rows ``P(axis, None)``; XLA inserts the CGS2 psum
    reductions and the matvec gather — the distributed eigensolve the
    reference gets from MPI-parallel SLEPc (SURVEY section 2.3 item 4,
    ``/root/reference/README.md:43``).

    ``locality``: optional ``(geom_mesh, cell_dofs)`` enabling
    RCB-partition DOF renumbering (:mod:`lsafw_tpu.parallel.partition`)
    so each device's rows are mesh-local and the column gather stays
    halo-bounded.  Returns eigenpairs in the ORIGINAL dof numbering.
    """
    from lsafw_tpu.solver.eigen import EpsWhich, krylov_schur

    which = EpsWhich(which) if isinstance(which, str) else which
    n = A.shape[0]
    perm = None
    if locality is not None:
        from lsafw_tpu.meshing.mesh import Mesh as GeomMesh  # noqa: F401
        from lsafw_tpu.parallel.partition import (
            partition_cells,
            renumber_dofs_by_partition,
        )

        geom_mesh, cell_dofs = locality
        parts = partition_cells(geom_mesh, int(np.prod(list(mesh.shape.values()))))
        perm = renumber_dofs_by_partition(
            np.asarray(cell_dofs), n, parts, int(np.prod(list(mesh.shape.values())))
        )
        S = A.to_scipy().tocoo()
        import scipy.sparse as sp

        Ap = sp.csr_matrix((S.data, (perm[S.row], perm[S.col])), shape=A.shape)
        A = CSRMatrix.from_scipy(Ap)

    op = shard_csr(A, mesh, axis)
    basis_sh = NamedSharding(mesh, P(None, axis))

    def traced_apply(op, v):
        return op.matvec(v[0]), op.matvec(v[1])

    def eager_apply(v):
        return traced_apply(op, v)

    res = krylov_schur(
        eager_apply, op.npad,
        nev=nev, ncv=ncv, which=which, tol=tol, max_restarts=max_restarts,
        device_op=op, traced_apply=traced_apply, basis_sharding=basis_sh,
    )
    # trim padding and undo the locality renumbering
    vecs = res.eigenvectors[:, : n]
    if perm is not None:
        vecs = vecs[:, perm]
    res.eigenvectors = vecs
    return res


@partial(jax.jit, static_argnames=("ksp_type", "tol", "maxiter", "restart"))
def _solve_jit(op, bp, *, ksp_type, tol, maxiter, restart):
    from lsafw_tpu.solver.linear import solve as _solve

    return _solve(op.matvec, bp, ksp_type=ksp_type, tol=tol, maxiter=maxiter,
                  restart=restart)


def sharded_solve(op: ShardedOperator, b, *, ksp_type="gmres", tol=1e-10,
                  maxiter=500, restart=30):
    """Run a Krylov solver on the sharded operator.  The solver code is
    the single-device implementation from :mod:`lsafw_tpu.solver.linear`;
    sharding annotations on the operands parallelize it."""
    from lsafw_tpu.solver.linear import KSPType

    bp = shard_vector(np.asarray(b), op.mesh)
    res = _solve_jit(op, bp, ksp_type=KSPType(ksp_type), tol=tol,
                     maxiter=maxiter, restart=restart)
    return res._replace(x=np.asarray(res.x)[: op.n])
