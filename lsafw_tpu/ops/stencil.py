"""Structured-grid stencil operator: gather-free SpMV.

On this TPU, XLA's generic gather/scatter run orders of magnitude off
HBM bandwidth (measured ~7 ns/element), so assembled-sparse SpMV is
latency-bound.  For meshes whose DOF graph is translation-invariant —
everything produced by ``rectangle_mesh`` — the operator is exactly a
set of variable-coefficient stencils:

    y[class_r][i, j] += sum_buckets C[bucket][i, j] * x[class_c][i+oi, j+oj]

i.e. pure static slices + fused multiply-adds on 2D grids: zero
gathers, zero scatters, bandwidth-bound VPU work.  This is the
TPU-native answer to the reference's "assembly is embarrassingly
parallel per rank" hot loop for the structured benchmark configs
(BASELINE.json configs 1 and 5).

DOF classes on a diagonally-split structured rectangle with
Taylor-Hood: vertex / horizontal-edge / vertical-edge / diagonal-edge
nodes x velocity components, plus vertex pressure — 9 classes.  The
builder classifies nodes geometrically, derives integer grid positions
and reindexes the CSR entries into (class_r, class_c, offset) buckets;
vectors live in a packed per-class-grid layout between solver
iterations (pack/unpack are one permutation each at the boundaries).
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
class StencilStructure:
    """Static structure: classes, grids, packing and the nnz->bucket map."""

    n: int
    num_classes: int
    class_shapes: tuple[tuple[int, int], ...]
    class_bases: tuple[int, ...]  # packed offset of each class block
    buckets: tuple[tuple[int, int, int, int], ...]  # (class_r, class_c, oi, oj)
    pad: int
    perm: np.ndarray  # (n,) packed_index -> dof
    inv_perm: np.ndarray  # (n,) dof -> packed_index
    nnz_slot: np.ndarray  # (nnz,) -> flat position in the coeff storage
    coeff_size: int
    bucket_slices: tuple[tuple[int, int], ...]  # (start, size) per bucket

    @property
    def packed_size(self) -> int:
        return self.class_bases[-1] + int(np.prod(self.class_shapes[-1]))


@jax.tree_util.register_pytree_node_class
@dataclass
class StencilOperator:
    """y = A x on packed class-grid vectors (a pytree)."""

    structure: StencilStructure
    coeffs: jnp.ndarray  # (coeff_size,) flat bucket coefficient grids
    bc_mask: jnp.ndarray | None = None  # (packed_size,) bool
    bc_diag: float = 1.0

    def tree_flatten(self):
        return (self.coeffs, self.bc_mask), (self.structure, self.bc_diag)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], leaves[0], leaves[1], aux[1])

    # --- packing (one permutation each way; do it OUTSIDE hot loops) ---
    def pack(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[jnp.asarray(self.structure.perm)]

    def unpack(self, xp: jnp.ndarray) -> jnp.ndarray:
        return xp[jnp.asarray(self.structure.inv_perm)]

    def matvec(self, xp: jnp.ndarray) -> jnp.ndarray:
        """Packed-layout matvec: static slices + FMAs only."""
        s = self.structure
        P = s.pad
        xe = jnp.where(self.bc_mask, 0.0, xp) if self.bc_mask is not None else xp
        # split into padded class grids
        grids = []
        for k in range(s.num_classes):
            nxk, nyk = s.class_shapes[k]
            base = s.class_bases[k]
            g = xe[base : base + nxk * nyk].reshape(nxk, nyk)
            grids.append(jnp.pad(g, P))
        ys = [jnp.zeros(s.class_shapes[k], dtype=xp.dtype) for k in range(s.num_classes)]
        for b, (cr, cc, oi, oj) in enumerate(s.buckets):
            start, size = s.bucket_slices[b]
            nxr, nyr = s.class_shapes[cr]
            C = self.coeffs[start : start + size].reshape(nxr, nyr)
            xc = jax.lax.slice(
                grids[cc], (P + oi, P + oj), (P + oi + nxr, P + oj + nyr)
            )
            ys[cr] = ys[cr] + C * xc
        y = jnp.concatenate([g.reshape(-1) for g in ys])
        if self.bc_mask is not None:
            y = jnp.where(self.bc_mask, self.bc_diag * xp, y)
        return y

    def __matmul__(self, xp):
        return self.matvec(xp)

    # --- multi-chip form: per-class grids as a pytree -----------------
    def split_grids(self, xp: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        """Packed vector -> tuple of (nx, ny) class grids (shard each on
        axis 0 with P("dof") for multi-chip runs; the static shifted
        slices of :meth:`matvec_grids` become XLA halo exchanges)."""
        s = self.structure
        return tuple(
            xp[s.class_bases[k] : s.class_bases[k] + int(np.prod(s.class_shapes[k]))]
            .reshape(s.class_shapes[k])
            for k in range(s.num_classes)
        )

    def join_grids(self, grids) -> jnp.ndarray:
        return jnp.concatenate([g.reshape(-1) for g in grids])

    def matvec_grids(self, grids) -> tuple[jnp.ndarray, ...]:
        """Stencil apply on per-class grids (no BC handling; shard-friendly)."""
        s = self.structure
        P = s.pad
        padded = [jnp.pad(g, P) for g in grids]
        ys = [jnp.zeros(s.class_shapes[k], dtype=grids[0].dtype) for k in range(s.num_classes)]
        for b, (cr, cc, oi, oj) in enumerate(s.buckets):
            start, size = s.bucket_slices[b]
            nxr, nyr = s.class_shapes[cr]
            C = self.coeffs[start : start + size].reshape(nxr, nyr)
            xc = jax.lax.slice(padded[cc], (P + oi, P + oj), (P + oi + nxr, P + oj + nyr))
            ys[cr] = ys[cr] + C * xc
        return tuple(ys)


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------


def _classify_nodes(coords: np.ndarray, hx: float, hy: float, x0: float, y0: float):
    """Classify structured-grid nodes by their half-integer signature
    relative to the *cell* spacing (hx, hy).

    Returns (class_id (n,), ix (n,), iy (n,)) with class signature
    (rx, ry) in {0, 1}^2 meaning node offsets of 0 or h/2 within a cell.
    Raises ValueError if the point set is not grid-structured.
    """
    x, y = coords[:, 0], coords[:, 1]
    gx = np.round((x - x0) / hx * 2).astype(np.int64)
    gy = np.round((y - y0) / hy * 2).astype(np.int64)
    if (
        not (np.abs((x - x0) / hx * 2 - gx) < 1e-6).all()
        or not (np.abs((y - y0) / hy * 2 - gy) < 1e-6).all()
    ):
        raise ValueError("Node set is not translation-structured.")
    rx, ry = gx % 2, gy % 2
    cls = rx * 2 + ry  # 0: vertex, 1: y-half, 2: x-half, 3: both-half
    ix, iy = gx // 2, gy // 2
    return cls.astype(np.int32), ix, iy


def build_stencil_operator(
    pattern: SparsityPattern,
    data: np.ndarray,
    spaces: "FunctionSpaces | list",
    *,
    bc_mask: np.ndarray | None = None,
    bc_diag: float = 1.0,
    max_buckets: int = 2000,
) -> StencilOperator:
    """Reindex an assembled operator into stencil buckets.

    ``spaces`` is either a mixed :class:`FunctionSpaces` (velocity +
    pressure) or a list of ``(FunctionSpace, block_size)`` blocks laid
    out consecutively in the DOF vector (e.g. ``[(scalar_space, 1)]``
    for the membrane EVP).

    The structure (everything except ``coeffs``) depends only on the
    pattern + spaces and is cached on the pattern, so re-building after
    a Jacobian update is one scatter of the nnz data.
    """
    if isinstance(spaces, FunctionSpaces):
        blocks = [(spaces.velocity, spaces.velocity.bs), (spaces.pressure, 1)]
    else:
        blocks = list(spaces)
    structure = _structure_for(pattern, blocks, max_buckets)
    coeffs = jnp.zeros(structure.coeff_size, dtype=jnp.asarray(data).dtype)
    coeffs = coeffs.at[jnp.asarray(structure.nnz_slot)].set(jnp.asarray(data))
    mask_p = None
    if bc_mask is not None:
        mask_full = np.zeros(structure.packed_size, dtype=bool)
        mask_full[: structure.n] = np.asarray(bc_mask)[structure.perm]
        # note: packed_size == n for consistent structures
        mask_p = jnp.asarray(mask_full[: structure.packed_size])
    return StencilOperator(structure, coeffs, mask_p, bc_diag)


# Keyed by id(pattern) but holding a strong reference to the pattern:
# without it, a freed pattern's address can be reused by a NEW pattern
# (CPython id recycling) and the lookup would silently return a stale
# structure with the wrong grid shapes.  Bounded LRU (insertion-order
# eviction) so long sessions that build many meshes don't grow host
# memory without limit.
_STRUCT_CACHE: dict[int, tuple[SparsityPattern, StencilStructure]] = {}
_STRUCT_CACHE_MAX = 8


def _structure_for(pattern: SparsityPattern, blocks, max_buckets: int) -> StencilStructure:
    key = id(pattern)
    hit = _STRUCT_CACHE.get(key)
    if hit is not None and hit[0] is pattern:
        _STRUCT_CACHE[key] = _STRUCT_CACHE.pop(key)  # refresh LRU order
        return hit[1]
    mesh = blocks[0][0].mesh
    if mesh.tdim != 2 or mesh.cell_type is not CellType.TRIANGLE:
        raise ValueError("Stencil operator supports 2D structured triangle meshes.")
    n = sum(space.num_nodes * bs for space, bs in blocks)

    # cell spacing and origin from the mesh vertices (node sets include
    # half-offset midpoints, so spacing cannot be inferred from them)
    vx = np.unique(mesh.vertices[:, 0])
    vy = np.unique(mesh.vertices[:, 1])
    hx, hy = float(np.diff(vx).min()), float(np.diff(vy).min())
    x0, y0 = float(vx.min()), float(vy.min())

    # dof -> (class, ix, iy): per block, 4 geometric node classes x
    # block_size components
    dof_cls = np.empty(n, dtype=np.int32)
    dof_ix = np.empty(n, dtype=np.int64)
    dof_iy = np.empty(n, dtype=np.int64)
    dof_base = 0
    cls_base = 0
    for space, bs in blocks:
        scls, six, siy = _classify_nodes(space.node_coords, hx, hy, x0, y0)
        nd = space.num_nodes * bs
        dofs = dof_base + np.arange(nd)
        node = (dofs - dof_base) // bs
        comp = (dofs - dof_base) % bs
        dof_cls[dofs] = cls_base + scls[node] * bs + comp
        dof_ix[dofs] = six[node]
        dof_iy[dofs] = siy[node]
        dof_base += nd
        cls_base += 4 * bs

    # compact away empty classes (e.g. P1 blocks only have vertex nodes)
    used_cls = np.unique(dof_cls)
    remap_cls = np.full(cls_base, -1, dtype=np.int32)
    remap_cls[used_cls] = np.arange(used_cls.size, dtype=np.int32)
    dof_cls = remap_cls[dof_cls]
    num_classes = int(used_cls.size)
    shapes = []
    bases = []
    perm_parts = []
    base = 0
    for k in range(num_classes):
        sel = np.nonzero(dof_cls == k)[0]
        nxk = int(dof_ix[sel].max()) + 1
        nyk = int(dof_iy[sel].max()) + 1
        if sel.size != nxk * nyk:
            raise ValueError(f"Class {k} grid is not dense ({sel.size} vs {nxk*nyk}).")
        order = np.empty(nxk * nyk, dtype=np.int64)
        order[dof_ix[sel] * nyk + dof_iy[sel]] = sel
        shapes.append((nxk, nyk))
        bases.append(base)
        base += nxk * nyk
        perm_parts.append(order)
    perm = np.concatenate(perm_parts)
    if (perm < 0).any():
        raise ValueError("Empty DOF class encountered.")
    inv_perm = np.empty(n, dtype=np.int64)
    inv_perm[perm] = np.arange(n)

    # bucket every nnz entry
    rows = pattern.row_ids.astype(np.int64)
    cols = pattern.indices.astype(np.int64)
    cr = dof_cls[rows]
    cc = dof_cls[cols]
    oi = dof_ix[cols] - dof_ix[rows]
    oj = dof_iy[cols] - dof_iy[rows]
    pad = int(max(np.abs(oi).max(), np.abs(oj).max()))
    OFF = 2 * pad + 1
    bkey = ((cr * num_classes + cc) * OFF + (oi + pad)) * OFF + (oj + pad)
    uniq, inverse = np.unique(bkey, return_inverse=True)
    if uniq.size > max_buckets:
        raise ValueError(f"{uniq.size} stencil buckets exceed max_buckets={max_buckets}.")

    buckets = []
    bucket_slices = []
    start = 0
    sizes = np.zeros(uniq.size, dtype=np.int64)
    for b, k in enumerate(uniq):
        oj_ = int(k % OFF) - pad
        oi_ = int((k // OFF) % OFF) - pad
        cc_ = int((k // (OFF * OFF)) % num_classes)
        cr_ = int(k // (OFF * OFF * num_classes))
        nxr, nyr = shapes[cr_]
        buckets.append((cr_, cc_, oi_, oj_))
        bucket_slices.append((start, nxr * nyr))
        sizes[b] = nxr * nyr
        start += nxr * nyr
    coeff_size = start

    # nnz -> flat coefficient slot: bucket start + row position in class grid
    bstart = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    nyr_of_row = np.array([shapes[c][1] for c in range(num_classes)])[cr]
    rowpos = dof_ix[rows] * nyr_of_row + dof_iy[rows]
    nnz_slot = (bstart[inverse] + rowpos).astype(np.int64)
    if np.unique(nnz_slot).size != nnz_slot.size:
        raise ValueError("Stencil slot collision (duplicate (row, offset) pair).")

    structure = StencilStructure(
        n=n,
        num_classes=num_classes,
        class_shapes=tuple(shapes),
        class_bases=tuple(bases),
        buckets=tuple(buckets),
        pad=pad,
        perm=perm,
        inv_perm=inv_perm,
        nnz_slot=nnz_slot,
        coeff_size=coeff_size,
        bucket_slices=tuple(bucket_slices),
    )
    logger.info(
        "Stencil structure: %d buckets, pad %d, %d coeff entries (nnz %d)",
        len(buckets), pad, coeff_size, pattern.nnz,
    )
    while len(_STRUCT_CACHE) >= _STRUCT_CACHE_MAX:
        _STRUCT_CACHE.pop(next(iter(_STRUCT_CACHE)))
    _STRUCT_CACHE[key] = (pattern, structure)
    return structure
