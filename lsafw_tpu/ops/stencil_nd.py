"""Dimension-generic structured-grid stencil operator (2D/3D).

The N-dimensional generalization of :mod:`lsafw_tpu.ops.stencil` (which
stays as the battle-tested 2D implementation this round): DOF classes
are the 2^d half-integer signatures per block component — on Kuhn-split
boxes with Taylor-Hood that is vertex + 7 edge-direction classes per
scalar block — and the operator applies as variable-coefficient
stencils over d-dimensional class grids (static slices + FMAs, zero
gathers).  This is the fast path for BASELINE config 5 (3D box flow).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.spaces import FunctionSpaces
from lsafw_tpu.meshing.mesh import CellType
from lsafw_tpu.ops.sparse import SparsityPattern
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass(frozen=True, eq=False)
class StencilNDStructure:
    n: int
    ndim: int
    num_classes: int
    class_shapes: tuple[tuple[int, ...], ...]
    class_bases: tuple[int, ...]
    buckets: tuple[tuple[int, int, tuple[int, ...]], ...]  # (cr, cc, offsets)
    pad: int
    perm: np.ndarray
    inv_perm: np.ndarray
    nnz_slot: np.ndarray
    coeff_size: int
    bucket_slices: tuple[tuple[int, int], ...]

    @property
    def packed_size(self) -> int:
        return self.class_bases[-1] + int(np.prod(self.class_shapes[-1]))


@jax.tree_util.register_pytree_node_class
@dataclass
class StencilNDOperator:
    """y = A x on packed class-grid vectors (any dimension)."""

    structure: StencilNDStructure
    coeffs: jnp.ndarray
    bc_mask: jnp.ndarray | None = None
    bc_diag: float = 1.0

    def tree_flatten(self):
        return (self.coeffs, self.bc_mask), (self.structure, self.bc_diag)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], leaves[0], leaves[1], aux[1])

    def pack(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[jnp.asarray(self.structure.perm)]

    def unpack(self, xp: jnp.ndarray) -> jnp.ndarray:
        return xp[jnp.asarray(self.structure.inv_perm)]

    def matvec(self, xp: jnp.ndarray) -> jnp.ndarray:
        s = self.structure
        P = s.pad
        xe = jnp.where(self.bc_mask, 0.0, xp) if self.bc_mask is not None else xp
        grids = []
        for k in range(s.num_classes):
            shp = s.class_shapes[k]
            base = s.class_bases[k]
            g = xe[base : base + int(np.prod(shp))].reshape(shp)
            grids.append(jnp.pad(g, P))
        ys = [jnp.zeros(s.class_shapes[k], dtype=xp.dtype) for k in range(s.num_classes)]
        for b, (cr, cc, offs) in enumerate(s.buckets):
            start, size = s.bucket_slices[b]
            shp_r = s.class_shapes[cr]
            C = self.coeffs[start : start + size].reshape(shp_r)
            lo = tuple(P + o for o in offs)
            hi = tuple(P + o + m for o, m in zip(offs, shp_r))
            xc = jax.lax.slice(grids[cc], lo, hi)
            ys[cr] = ys[cr] + C * xc
        y = jnp.concatenate([g.reshape(-1) for g in ys])
        if self.bc_mask is not None:
            y = jnp.where(self.bc_mask, self.bc_diag * xp, y)
        return y

    def __matmul__(self, xp):
        return self.matvec(xp)


def _classify_nd(coords: np.ndarray, h: np.ndarray, origin: np.ndarray):
    """(class_signature_id, grid_index (n, d)) from half-integer grids."""
    f = (coords - origin[None, :]) / h[None, :] * 2
    g = np.round(f).astype(np.int64)
    if not (np.abs(f - g) < 1e-6).all():
        raise ValueError("Node set is not translation-structured.")
    r = g % 2  # (n, d) half bits
    d = coords.shape[1]
    weights = 2 ** np.arange(d - 1, -1, -1)
    cls = (r * weights[None, :]).sum(axis=1)
    return cls.astype(np.int32), g // 2


# Strong pattern reference guards against CPython id recycling (a new
# pattern allocated at a freed pattern's address must not hit stale).
_CACHE: dict[int, tuple[SparsityPattern, StencilNDStructure]] = {}


def build_stencil_nd(
    pattern: SparsityPattern,
    data: np.ndarray,
    spaces: "FunctionSpaces | list",
    *,
    bc_mask: np.ndarray | None = None,
    bc_diag: float = 1.0,
    max_buckets: int = 20000,
) -> StencilNDOperator:
    """Build the N-D stencil operator (see module docstring)."""
    if isinstance(spaces, FunctionSpaces):
        blocks = [(spaces.velocity, spaces.velocity.bs), (spaces.pressure, 1)]
    else:
        blocks = list(spaces)
    structure = _structure_nd(pattern, blocks, max_buckets)
    coeffs = jnp.zeros(structure.coeff_size, dtype=jnp.asarray(data).dtype)
    coeffs = coeffs.at[jnp.asarray(structure.nnz_slot)].set(jnp.asarray(data))
    mask_p = None
    if bc_mask is not None:
        mask_p = jnp.asarray(np.asarray(bc_mask)[structure.perm])
    return StencilNDOperator(structure, coeffs, mask_p, bc_diag)


def _structure_nd(pattern: SparsityPattern, blocks, max_buckets: int) -> StencilNDStructure:
    key = id(pattern)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] is pattern:
        return hit[1]
    mesh = blocks[0][0].mesh
    if mesh.cell_type not in (CellType.TRIANGLE, CellType.TETRAHEDRON):
        raise ValueError("Stencil operator supports structured simplex meshes.")
    d = mesh.gdim
    n = sum(space.num_nodes * bs for space, bs in blocks)

    h = np.empty(d)
    origin = np.empty(d)
    for a in range(d):
        va = np.unique(mesh.vertices[:, a])
        h[a] = float(np.diff(va).min())
        origin[a] = float(va.min())

    dof_cls = np.empty(n, dtype=np.int32)
    dof_pos = np.empty((n, d), dtype=np.int64)
    dof_base = 0
    cls_base = 0
    for space, bs in blocks:
        scls, spos = _classify_nd(space.node_coords[:, :d], h, origin)
        nd_ = space.num_nodes * bs
        dofs = dof_base + np.arange(nd_)
        node = (dofs - dof_base) // bs
        comp = (dofs - dof_base) % bs
        dof_cls[dofs] = cls_base + scls[node] * bs + comp
        dof_pos[dofs] = spos[node]
        dof_base += nd_
        cls_base += (2 ** d) * bs

    used = np.unique(dof_cls)
    remap = np.full(cls_base, -1, dtype=np.int32)
    remap[used] = np.arange(used.size, dtype=np.int32)
    dof_cls = remap[dof_cls]
    num_classes = int(used.size)

    shapes = []
    bases = []
    perm_parts = []
    base = 0
    for k in range(num_classes):
        sel = np.nonzero(dof_cls == k)[0]
        shp = tuple(int(dof_pos[sel, a].max()) + 1 for a in range(d))
        if sel.size != int(np.prod(shp)):
            raise ValueError(f"Class {k} grid is not dense ({sel.size} vs {np.prod(shp)}).")
        lin = np.zeros(sel.size, dtype=np.int64)
        stride = 1
        for a in range(d - 1, -1, -1):
            lin += dof_pos[sel, a] * stride
            stride *= shp[a]
        order = np.empty(sel.size, dtype=np.int64)
        order[lin] = sel
        shapes.append(shp)
        bases.append(base)
        base += sel.size
        perm_parts.append(order)
    perm = np.concatenate(perm_parts)
    inv_perm = np.empty(n, dtype=np.int64)
    inv_perm[perm] = np.arange(n)

    rows = pattern.row_ids.astype(np.int64)
    cols = pattern.indices.astype(np.int64)
    cr = dof_cls[rows]
    cc = dof_cls[cols]
    off = dof_pos[cols] - dof_pos[rows]  # (nnz, d)
    pad = int(np.abs(off).max())
    OFF = 2 * pad + 1
    bkey = (cr.astype(np.int64) * num_classes + cc).astype(np.int64)
    for a in range(d):
        bkey = bkey * OFF + (off[:, a] + pad)
    uniq, inverse = np.unique(bkey, return_inverse=True)
    if uniq.size > max_buckets:
        raise ValueError(f"{uniq.size} stencil buckets exceed max_buckets={max_buckets}.")

    buckets = []
    bucket_slices = []
    start = 0
    sizes = np.zeros(uniq.size, dtype=np.int64)
    for b, kkey in enumerate(uniq):
        rem = int(kkey)
        offs = []
        for a in range(d):
            offs.append(rem % OFF - pad)
            rem //= OFF
        offs = tuple(reversed(offs))
        cc_ = rem % num_classes
        cr_ = rem // num_classes
        shp_r = shapes[cr_]
        buckets.append((int(cr_), int(cc_), offs))
        sz = int(np.prod(shp_r))
        bucket_slices.append((start, sz))
        sizes[b] = sz
        start += sz
    coeff_size = start

    bstart = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    # row position linearized in its class grid
    rowlin = np.zeros(rows.size, dtype=np.int64)
    strides_per_class = []
    for kcls in range(num_classes):
        shp = shapes[kcls]
        st = np.ones(d, dtype=np.int64)
        for a in range(d - 2, -1, -1):
            st[a] = st[a + 1] * shp[a + 1]
        strides_per_class.append(st)
    strides_arr = np.stack(strides_per_class)  # (num_classes, d)
    rowlin = (dof_pos[rows] * strides_arr[cr]).sum(axis=1)
    nnz_slot = (bstart[inverse] + rowlin).astype(np.int64)
    if np.unique(nnz_slot).size != nnz_slot.size:
        raise ValueError("Stencil slot collision (duplicate (row, offset) pair).")

    structure = StencilNDStructure(
        n=n, ndim=d, num_classes=num_classes,
        class_shapes=tuple(shapes), class_bases=tuple(bases),
        buckets=tuple(buckets), pad=pad,
        perm=perm, inv_perm=inv_perm,
        nnz_slot=nnz_slot, coeff_size=coeff_size,
        bucket_slices=tuple(bucket_slices),
    )
    logger.info(
        "StencilND structure: %dD, %d classes, %d buckets, pad %d (nnz %d)",
        d, num_classes, len(buckets), pad, pattern.nnz,
    )
    _CACHE[key] = (pattern, structure)
    return structure
