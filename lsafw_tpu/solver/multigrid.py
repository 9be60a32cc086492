"""Geometric multigrid preconditioner on stencil class grids.

The device-resident preconditioner the stencil fast path makes
possible: a p-then-h multigrid for P2 scalar problems on structured
rectangles (the membrane EVP class):

  * p-coarsening: P2 -> P1 on the same mesh (vertex injection down,
    P1 nodal interpolation up — a P2 coefficient at an edge node IS
    the function value at the midpoint);
  * h-coarsening: P1 vertex grids halve per level with the
    triangulation-consistent linear-interpolation prolongation
    (diagonal midpoints average the split-diagonal endpoints) and its
    adjoint as restriction;
  * damped-Jacobi smoothing at every level, a dense inverse on the
    coarsest interior.

Everything is strided slicing + FMAs on 2D grids (zero gathers), so a
V-cycle costs a few stencil applies.  Used as the preconditioner of
:func:`lsafw_tpu.solver.power.lobpcg_smallest_pc`, it replaces the
kappa-bound Jacobi iteration counts with O(10).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.ops.stencil import StencilOperator, build_stencil_operator


# ---------------------------------------------------------------------------
# Grid transfer kernels (vertex grids, shapes (nx+1, ny+1))
# ---------------------------------------------------------------------------


def prolong_vertex(c: jnp.ndarray, fine_shape: tuple[int, int]) -> jnp.ndarray:
    """Linear interpolation coarse -> fine on the triangulated grid
    (quads split along the (i, j)-(i+1, j+1) diagonal)."""
    f = jnp.zeros(fine_shape, dtype=c.dtype)
    f = f.at[0::2, 0::2].set(c)
    f = f.at[1::2, 0::2].set(0.5 * (c[:-1, :] + c[1:, :]))
    f = f.at[0::2, 1::2].set(0.5 * (c[:, :-1] + c[:, 1:]))
    f = f.at[1::2, 1::2].set(0.5 * (c[:-1, :-1] + c[1:, 1:]))
    return f


def restrict_vertex(f: jnp.ndarray, coarse_shape: tuple[int, int]) -> jnp.ndarray:
    """Adjoint of :func:`prolong_vertex` (full-weighting-like)."""
    c = jnp.zeros(coarse_shape, dtype=f.dtype)
    c = c.at[:, :].add(f[0::2, 0::2])
    e = f[1::2, 0::2]
    c = c.at[:-1, :].add(0.5 * e)
    c = c.at[1:, :].add(0.5 * e)
    e = f[0::2, 1::2]
    c = c.at[:, :-1].add(0.5 * e)
    c = c.at[:, 1:].add(0.5 * e)
    e = f[1::2, 1::2]
    c = c.at[:-1, :-1].add(0.5 * e)
    c = c.at[1:, 1:].add(0.5 * e)
    return c


def _zero_boundary(g: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous Dirichlet on the physical boundary of a vertex grid."""
    g = g.at[0, :].set(0.0).at[-1, :].set(0.0)
    return g.at[:, 0].set(0.0).at[:, -1].set(0.0)


# ---------------------------------------------------------------------------
# P2 <-> P1 transfers on the packed stencil layout
# ---------------------------------------------------------------------------
# P2 scalar classes on a split rectangle (ops.stencil signature order):
#   class 0: (0,0) vertices        class 1: (0,1) vertical edges
#   class 2: (1,0) horizontal edges  class 3: (1,1) diagonal edges


def p1_to_p2(op2: StencilOperator, v: jnp.ndarray) -> jnp.ndarray:
    """P1 vertex grid -> packed P2 coefficients (nodal interpolation)."""
    gv = v
    ge_v = 0.5 * (gv[:, :-1] + gv[:, 1:])  # vertical edges (0,1)
    ge_h = 0.5 * (gv[:-1, :] + gv[1:, :])  # horizontal edges (1,0)
    ge_d = 0.5 * (gv[:-1, :-1] + gv[1:, 1:])  # diagonal edges (1,1)
    return op2.join_grids((gv, ge_v, ge_h, ge_d))


def p2_to_p1(op2: StencilOperator, xp: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`p1_to_p2` on packed P2 vectors -> vertex grid."""
    gv, ge_v, ge_h, ge_d = op2.split_grids(xp)
    out = gv
    out = out.at[:, :-1].add(0.5 * ge_v).at[:, 1:].add(0.5 * ge_v)
    out = out.at[:-1, :].add(0.5 * ge_h).at[1:, :].add(0.5 * ge_h)
    out = out.at[:-1, :-1].add(0.5 * ge_d).at[1:, 1:].add(0.5 * ge_d)
    return out


# ---------------------------------------------------------------------------
# The preconditioner
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class MultigridPC:
    """V-cycle preconditioner pytree for P2 Dirichlet scalar problems."""

    op2: StencilOperator  # P2 operator (packed)
    inv_diag2: jnp.ndarray  # packed Jacobi diag of op2
    ops1: tuple[StencilOperator, ...]  # P1 hierarchy, fine -> coarse
    inv_diags1: tuple[jnp.ndarray, ...]  # vertex-grid Jacobi (grid shape)
    coarse_inv: jnp.ndarray  # dense inverse on coarsest interior
    omega: float = 0.7
    smooth_steps: int = 2

    def tree_flatten(self):
        return (
            (self.op2, self.inv_diag2, self.ops1, self.inv_diags1, self.coarse_inv),
            (self.omega, self.smooth_steps),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, omega=aux[0], smooth_steps=aux[1])

    # --- level helpers ---
    def _smooth2(self, x, b):
        for _ in range(self.smooth_steps):
            x = x + self.omega * self.inv_diag2 * (b - self.op2.matvec(x))
        return x

    def _apply1(self, level: int, g: jnp.ndarray) -> jnp.ndarray:
        op = self.ops1[level]
        (y,) = op.matvec_grids((g,))
        return _zero_boundary(y)

    def _smooth1(self, level, x, b):
        for _ in range(self.smooth_steps):
            r = b - self._apply1(level, x)
            x = x + self.omega * self.inv_diags1[level] * r
        return _zero_boundary(x)

    def _vcycle1(self, level: int, b: jnp.ndarray) -> jnp.ndarray:
        if level == len(self.ops1) - 1:
            # coarsest: dense interior solve
            shape = b.shape
            bi = b[1:-1, 1:-1].reshape(-1)
            xi = self.coarse_inv @ bi
            x = jnp.zeros(shape, dtype=b.dtype)
            return x.at[1:-1, 1:-1].set(xi.reshape(shape[0] - 2, shape[1] - 2))
        x = self._smooth1(level, jnp.zeros_like(b), b)
        r = _zero_boundary(b - self._apply1(level, x))
        coarse_shape = self.ops1[level + 1].structure.class_shapes[0]
        rc = _zero_boundary(restrict_vertex(r, coarse_shape))
        ec = self._vcycle1(level + 1, rc)
        x = x + _zero_boundary(prolong_vertex(ec, x.shape))
        return self._smooth1(level, x, b)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """One V-cycle: approximate (op2)^-1 r on the packed P2 layout."""
        x = self._smooth2(jnp.zeros_like(r), r)
        res = r - self.op2.matvec(x)
        r1 = _zero_boundary(p2_to_p1(self.op2, res))
        e1 = self._vcycle1(0, r1)
        x = x + p1_to_p2(self.op2, _zero_boundary(e1))
        # keep Dirichlet rows exact (op2 has identity there)
        if self.op2.bc_mask is not None:
            x = jnp.where(self.op2.bc_mask, r, x)
        return self._smooth2(x, r)


def build_multigrid_pc(
    mesh, K2, bc_mask2: np.ndarray, *, levels: int | None = None,
    omega: float = 0.7, smooth_steps: int = 3,
) -> MultigridPC:
    """Build the V-cycle preconditioner for a P2 Dirichlet operator.

    Args:
        mesh: the structured rectangle mesh of the P2 problem.
        K2: assembled P2 CSRMatrix with Dirichlet identity rows.
        bc_mask2: Dirichlet mask over the P2 DOFs.
    """
    from lsafw_tpu.fem.assembly import SpaceContext, dirichlet_matrix_data, stiffness_scalar
    from lsafw_tpu.fem.spaces import make_scalar_space
    from lsafw_tpu.meshing.mesh import rectangle_mesh

    space2 = make_scalar_space(mesh, "p2")
    op2 = build_stencil_operator(K2.pattern, np.asarray(K2.data), [(space2, 1)],
                                 bc_mask=bc_mask2, bc_diag=1.0)
    d2 = np.asarray(K2.diagonal())[op2.structure.perm]
    inv_diag2 = jnp.asarray(np.where(np.abs(d2) > 0, 1.0 / np.where(d2 == 0, 1, d2), 1.0))

    # mesh extents / divisions from the vertex grid
    nxv, nyv = op2.structure.class_shapes[0]
    nx, ny = nxv - 1, nyv - 1
    x0, y0 = mesh.vertices.min(axis=0)
    x1, y1 = mesh.vertices.max(axis=0)
    if levels is None:
        levels = 1
        while nx % (2 ** levels) == 0 and ny % (2 ** levels) == 0 and min(
            nx, ny
        ) // (2 ** levels) >= 4:
            levels += 1

    ops1 = []
    inv_diags1 = []
    K1_last = None
    for l in range(levels):
        nxl, nyl = nx // (2 ** l), ny // (2 ** l)
        mesh_l = rectangle_mesh((x0, y0), (x1, y1), nxl, nyl)
        space1 = make_scalar_space(mesh_l, "p1")
        ctx1 = SpaceContext.build(space1)
        K1 = ctx1.scatter(stiffness_scalar(ctx1))
        # Dirichlet identity rows on the physical boundary
        bmask = np.zeros(space1.num_dofs, dtype=bool)
        bmask[space1.nodes_on_facets(mesh_l.boundary_facets)] = True
        data_bc = dirichlet_matrix_data(ctx1.pattern_dev, K1.data, jnp.asarray(bmask), 1.0)
        from lsafw_tpu.ops.sparse import CSRMatrix

        K1 = CSRMatrix(ctx1.pattern, data_bc)
        op1 = build_stencil_operator(K1.pattern, np.asarray(K1.data), [(space1, 1)])
        d1 = np.asarray(K1.diagonal())[op1.structure.perm].reshape(nxl + 1, nyl + 1)
        ops1.append(op1)
        inv_diags1.append(jnp.asarray(1.0 / d1))
        K1_last = (K1, nxl, nyl, bmask)

    K1c, nxc, nyc, bmaskc = K1_last
    # dense inverse of the coarsest interior block
    Kc = K1c.to_scipy().toarray()
    interior = ~bmaskc
    # reorder to the grid layout used by _vcycle1 (grid row-major interior)
    perm = ops1[-1].structure.perm  # packed(grid) -> dof
    grid_interior = []
    for gi in range(nxc + 1):
        for gj in range(nyc + 1):
            if 0 < gi < nxc and 0 < gj < nyc:
                grid_interior.append(perm[gi * (nyc + 1) + gj])
    gi_idx = np.asarray(grid_interior)
    coarse_inv = jnp.asarray(np.linalg.inv(Kc[np.ix_(gi_idx, gi_idx)]))

    return MultigridPC(
        op2=op2,
        inv_diag2=inv_diag2,
        ops1=tuple(ops1),
        inv_diags1=tuple(inv_diags1),
        coarse_inv=coarse_inv,
        omega=omega,
        smooth_steps=smooth_steps,
    )
