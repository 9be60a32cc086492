"""Dimension-generic geometric multigrid on structured N-D grids.

The 3D (and N-D) generalization of :mod:`lsafw_tpu.solver.multigrid`
(which stays as the battle-tested 2D implementation), built on the
N-D stencil operator:

  * p-coarsening: P2 -> P1 on the same box mesh.  Every non-vertex P2
    class is an edge-midpoint family with a direction ``r`` in
    {0, 1}^d (the class signature bits): the P2 coefficient at grid
    index v IS the function value at the midpoint of (v, v + r), so
    nodal interpolation down/up is two shifted grid reads per class.
  * h-coarsening: vertex grids halve per level with SEPARABLE d-linear
    interpolation (one 1D interleave pass per axis) and its adjoint as
    restriction.  On the Kuhn-split simplicial meshes this is not the
    exact P1 nodal interpolant (face/center points average 4/8 corners
    instead of the 2 diagonal endpoints) but is a spectrally-equivalent
    transfer — the V-cycle contraction is indistinguishable (tested).
  * damped-Jacobi smoothing per level, a dense inverse on the coarsest
    interior.

Everything is static slices + FMAs on d-dimensional class grids (zero
gathers).  Parity: the GAMG/hypre preconditioner roles of the
reference's PETSc stack (``/root/reference/Solver/utils.py:84-88``)
for the structured-grid problem class.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.ops.stencil_nd import StencilNDOperator, build_stencil_nd


# ---------------------------------------------------------------------------
# Vertex-grid transfers (separable, any dimension)
# ---------------------------------------------------------------------------


def _prolong_axis(c: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interleave midpoints along one axis: n -> 2(n-1)+1."""
    c = jnp.moveaxis(c, axis, 0)
    fine_n = 2 * (c.shape[0] - 1) + 1
    f = jnp.zeros((fine_n,) + c.shape[1:], c.dtype)
    f = f.at[0::2].set(c)
    f = f.at[1::2].set(0.5 * (c[:-1] + c[1:]))
    return jnp.moveaxis(f, 0, axis)


def _restrict_axis(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Adjoint of :func:`_prolong_axis` along one axis."""
    f = jnp.moveaxis(f, axis, 0)
    c = f[0::2]
    e = f[1::2]
    c = c.at[:-1].add(0.5 * e).at[1:].add(0.5 * e)
    return jnp.moveaxis(c, 0, axis)


def prolong_vertex_nd(c: jnp.ndarray) -> jnp.ndarray:
    """d-linear interpolation coarse -> fine (each axis doubles)."""
    for axis in range(c.ndim):
        c = _prolong_axis(c, axis)
    return c


def restrict_vertex_nd(f: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`prolong_vertex_nd`."""
    for axis in range(f.ndim):
        f = _restrict_axis(f, axis)
    return f


def _zero_boundary_nd(g: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous Dirichlet on every face of a vertex grid."""
    for axis in range(g.ndim):
        g = jnp.moveaxis(g, axis, 0)
        g = g.at[0].set(0.0).at[-1].set(0.0)
        g = jnp.moveaxis(g, 0, axis)
    return g


# ---------------------------------------------------------------------------
# P2 <-> P1 transfers on the packed N-D class layout
# ---------------------------------------------------------------------------


def class_directions(op2: StencilNDOperator, node_coords: np.ndarray,
                     h: np.ndarray, origin: np.ndarray) -> tuple[tuple[int, ...], ...]:
    """Per-class edge direction ``r`` in {0,1}^d, in the structure's
    class order (ascending signature id; class 0 must be the vertex
    class)."""
    from lsafw_tpu.ops.stencil_nd import _classify_nd

    d = node_coords.shape[1]
    cls, _ = _classify_nd(node_coords, h, origin)
    used = np.unique(cls)
    dirs = []
    for sig in used:
        r = tuple(int((int(sig) >> (d - 1 - a)) & 1) for a in range(d))
        dirs.append(r)
    if any(dirs[0]):
        raise ValueError("class 0 is not the vertex class")
    return tuple(dirs)


def _split(op: StencilNDOperator, xp: jnp.ndarray):
    st = op.structure
    out = []
    for k in range(st.num_classes):
        base = st.class_bases[k]
        shp = st.class_shapes[k]
        out.append(xp[base : base + int(np.prod(shp))].reshape(shp))
    return out


def p1_to_p2_nd(op2: StencilNDOperator, dirs, gv: jnp.ndarray) -> jnp.ndarray:
    """P1 vertex grid -> packed P2 coefficients (nodal interpolation)."""
    grids = []
    for r in dirs:
        if not any(r):
            grids.append(gv)
            continue
        lo = tuple(slice(0, s - rr) for s, rr in zip(gv.shape, r))
        hi = tuple(slice(rr, None) for rr in r)
        grids.append(0.5 * (gv[lo] + gv[hi]))
    return jnp.concatenate([g.reshape(-1) for g in grids])


def p2_to_p1_nd(op2: StencilNDOperator, dirs, xp: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`p1_to_p2_nd`: packed P2 -> vertex grid."""
    grids = _split(op2, xp)
    out = grids[0]
    for r, g in zip(dirs[1:], grids[1:]):
        lo = tuple(slice(0, s - rr) for s, rr in zip(out.shape, r))
        hi = tuple(slice(rr, None) for rr in r)
        out = out.at[lo].add(0.5 * g).at[hi].add(0.5 * g)
    return out


# ---------------------------------------------------------------------------
# The preconditioner
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class MultigridNDPC:
    """V-cycle preconditioner pytree for P2 Dirichlet scalar problems
    on structured d-dimensional boxes (same contract as the 2D
    :class:`lsafw_tpu.solver.multigrid.MultigridPC`)."""

    op2: StencilNDOperator  # P2 operator (packed)
    inv_diag2: jnp.ndarray  # packed Jacobi diag of op2
    ops1: tuple[StencilNDOperator, ...]  # P1 hierarchy, fine -> coarse
    inv_diags1: tuple[jnp.ndarray, ...]  # vertex-grid Jacobi
    coarse_inv: jnp.ndarray  # dense inverse on coarsest interior
    dirs: tuple[tuple[int, ...], ...]  # per-class edge directions (static)
    omega: float = 0.7
    smooth_steps: int = 2

    def tree_flatten(self):
        return (
            (self.op2, self.inv_diag2, self.ops1, self.inv_diags1, self.coarse_inv),
            (self.dirs, self.omega, self.smooth_steps),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, dirs=aux[0], omega=aux[1], smooth_steps=aux[2])

    # --- level helpers ---
    def _smooth2(self, x, b):
        for _ in range(self.smooth_steps):
            x = x + self.omega * self.inv_diag2 * (b - self.op2.matvec(x))
        return x

    def _apply1(self, level: int, g: jnp.ndarray) -> jnp.ndarray:
        op = self.ops1[level]
        y = op.matvec(g.reshape(-1)).reshape(g.shape)
        return _zero_boundary_nd(y)

    def _smooth1(self, level, x, b):
        for _ in range(self.smooth_steps):
            r = b - self._apply1(level, x)
            x = x + self.omega * self.inv_diags1[level] * r
        return _zero_boundary_nd(x)

    def _vcycle1(self, level: int, b: jnp.ndarray) -> jnp.ndarray:
        if level == len(self.ops1) - 1:
            interior = tuple(slice(1, -1) for _ in range(b.ndim))
            bi = b[interior].reshape(-1)
            xi = self.coarse_inv @ bi
            x = jnp.zeros(b.shape, dtype=b.dtype)
            ishape = tuple(s - 2 for s in b.shape)
            return x.at[interior].set(xi.reshape(ishape))
        x = self._smooth1(level, jnp.zeros_like(b), b)
        r = _zero_boundary_nd(b - self._apply1(level, x))
        rc = _zero_boundary_nd(restrict_vertex_nd(r))
        ec = self._vcycle1(level + 1, rc)
        x = x + _zero_boundary_nd(prolong_vertex_nd(ec))
        return self._smooth1(level, x, b)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """One V-cycle: approximate (op2)^-1 r on the packed layout."""
        x = self._smooth2(jnp.zeros_like(r), r)
        res = r - self.op2.matvec(x)
        r1 = _zero_boundary_nd(p2_to_p1_nd(self.op2, self.dirs, res))
        e1 = self._vcycle1(0, r1)
        x = x + p1_to_p2_nd(self.op2, self.dirs, _zero_boundary_nd(e1))
        if self.op2.bc_mask is not None:
            x = jnp.where(self.op2.bc_mask, r, x)
        return self._smooth2(x, r)


def build_multigrid_nd_pc(
    mesh, K2, bc_mask2: np.ndarray, *, levels: int | None = None,
    omega: float = 0.7, smooth_steps: int = 3,
) -> MultigridNDPC:
    """Build the N-D V-cycle preconditioner for a P2 Dirichlet operator
    on a structured box mesh (2D rectangle or 3D box)."""
    from lsafw_tpu.fem.assembly import SpaceContext, dirichlet_matrix_data, stiffness_scalar
    from lsafw_tpu.fem.spaces import make_scalar_space
    from lsafw_tpu.meshing.mesh import box_mesh, rectangle_mesh
    from lsafw_tpu.ops.sparse import CSRMatrix

    d = mesh.gdim
    space2 = make_scalar_space(mesh, "p2")
    op2 = build_stencil_nd(K2.pattern, np.asarray(K2.data), [(space2, 1)],
                           bc_mask=bc_mask2, bc_diag=1.0)
    st = op2.structure
    d2 = np.asarray(K2.diagonal())[st.perm]
    inv_diag2 = jnp.asarray(np.where(np.abs(d2) > 0, 1.0 / np.where(d2 == 0, 1, d2), 1.0))

    lo = mesh.vertices.min(axis=0)
    hi = mesh.vertices.max(axis=0)
    vshape = st.class_shapes[0]
    divs = tuple(s - 1 for s in vshape)
    h = (hi - lo) / np.asarray(divs, dtype=float)  # cell size per axis
    dirs = class_directions(op2, space2.node_coords[:, :d], h, lo)

    if levels is None:
        levels = 1
        while all(nd_ % (2 ** levels) == 0 for nd_ in divs) and min(
            divs
        ) // (2 ** levels) >= 4:
            levels += 1

    ops1, inv_diags1 = [], []
    K1_last = None
    for l in range(levels):
        divs_l = tuple(nd_ // (2 ** l) for nd_ in divs)
        if d == 2:
            mesh_l = rectangle_mesh(tuple(lo), tuple(hi), *divs_l)
        else:
            mesh_l = box_mesh(tuple(lo), tuple(hi), *divs_l)
        space1 = make_scalar_space(mesh_l, "p1")
        ctx1 = SpaceContext.build(space1)
        K1 = ctx1.scatter(stiffness_scalar(ctx1))
        bmask = np.zeros(space1.num_dofs, dtype=bool)
        bmask[space1.nodes_on_facets(mesh_l.boundary_facets)] = True
        data_bc = dirichlet_matrix_data(ctx1.pattern_dev, K1.data, jnp.asarray(bmask), 1.0)
        K1 = CSRMatrix(ctx1.pattern, data_bc)
        op1 = build_stencil_nd(K1.pattern, np.asarray(K1.data), [(space1, 1)])
        gshape = op1.structure.class_shapes[0]
        d1 = np.asarray(K1.diagonal())[op1.structure.perm].reshape(gshape)
        ops1.append(op1)
        inv_diags1.append(jnp.asarray(1.0 / d1))
        K1_last = (K1, op1, bmask, gshape)

    K1c, op1c, bmaskc, gshapec = K1_last
    Kc = K1c.to_scipy().toarray()
    perm = op1c.structure.perm  # packed(grid) -> dof
    grid_idx = np.arange(int(np.prod(gshapec))).reshape(gshapec)
    interior = grid_idx[tuple(slice(1, -1) for _ in range(d))].reshape(-1)
    gi_idx = np.asarray(perm)[interior]
    coarse_inv = jnp.asarray(np.linalg.inv(Kc[np.ix_(gi_idx, gi_idx)]))

    return MultigridNDPC(
        op2=op2,
        inv_diag2=inv_diag2,
        ops1=tuple(ops1),
        inv_diags1=tuple(inv_diags1),
        coarse_inv=coarse_inv,
        dirs=dirs,
        omega=omega,
        smooth_steps=smooth_steps,
    )
