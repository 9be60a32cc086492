"""Boundary facet integrals.

The reference reaches facet terms through UFL surface measures
(``iMeasure.ds``, ``FEM/operators.py:262-271`` viscous_outlet,
Neumann/Robin contributions ``FEM/operators.py:357-364``).  Here a
:class:`FacetContext` precomputes, per tagged facet: the parent cell,
the cell-basis tabulation at facet quadrature points (host numpy — the
boundary is O(n^(1/2)) of the mesh), the facet Jacobian and the
outward normal; boundary kernels are then the same batched einsum +
scatter pattern as cell assembly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.quadrature import quadrature_rule
from lsafw_tpu.meshing.mesh import CellType, Mesh
from lsafw_tpu.meshing.tags import facets_with_marker
from lsafw_tpu.ops.sparse import SparsityPattern


@jax.tree_util.register_pytree_node_class
@dataclass
class FacetContext:
    """Precomputed boundary-integral data for one facet set (marker).

    A pytree (pass as a jit argument, like the assembly contexts)."""

    marker: int
    facet_ids: np.ndarray  # (nf,)
    parent_cells: np.ndarray  # (nf,)
    w: jnp.ndarray  # (nqf,)
    detJf: jnp.ndarray  # (nf,)
    normals: jnp.ndarray  # (nf, gdim) outward unit normals
    phi_u: jnp.ndarray  # (nf, nqf, nu_el) velocity basis at facet qps
    gphi_u: jnp.ndarray  # (nf, nqf, nu_el, gdim) physical gradients
    phi_p: jnp.ndarray  # (nf, nqf, np_el)
    cell_dofs: jnp.ndarray  # (nf, ndofs_el) mixed dofs of parent cells
    slots: jnp.ndarray  # (nf * ndofs_el**2,) nnz slots into the mixed pattern

    _LEAVES = (
        "facet_ids", "parent_cells", "w", "detJf", "normals", "phi_u",
        "gphi_u", "phi_p", "cell_dofs", "slots",
    )

    def tree_flatten(self):
        return tuple(getattr(self, n) for n in self._LEAVES), (self.marker,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        obj.marker = aux[0]
        for n, v in zip(cls._LEAVES, leaves):
            object.__setattr__(obj, n, v)
        return obj


def build_facet_context(
    ctx: AssemblyContext, mesh: Mesh, marker: int, quad_degree: int | None = None
) -> FacetContext:
    spaces = ctx.spaces
    facet_ids = facets_with_marker(mesh, marker)
    if facet_ids.size == 0:
        # an empty facet set crashes far downstream (zero-size reshapes
        # inside jitted loads); fail here with the actionable cause
        raise ValueError(
            f"No boundary facets tagged with marker {marker}; check the "
            "facet rules against the mesh boundary coordinates."
        )
    cells = mesh.facet_to_cells[facet_ids, 0]
    fverts = mesh.vertices[mesh.facets[facet_ids]]  # (nf, nvf, gdim)
    gdim = mesh.gdim
    nf = facet_ids.size

    # facet reference rule
    frule = quadrature_rule(
        CellType.INTERVAL if mesh.tdim == 2 else CellType.TRIANGLE,
        quad_degree or spaces.quad_degree,
    )
    xi = frule.points  # (nqf, tdim-1)
    nqf = xi.shape[0]

    # physical quadrature points on each facet: x = v0 + sum xi_k (vk - v0)
    e = fverts[:, 1:] - fverts[:, :1]  # (nf, tdim-1, gdim)
    phys = fverts[:, None, 0, :] + np.einsum("qk,fkd->fqd", xi, e)

    # facet measure scale and normals
    if mesh.tdim == 2:
        detJf = np.linalg.norm(e[:, 0], axis=1)
        normals = np.stack([e[:, 0, 1], -e[:, 0, 0]], axis=1)
    else:
        cr = np.cross(e[:, 0], e[:, 1])
        detJf = np.linalg.norm(cr, axis=1)
        normals = cr
    normals = normals / np.linalg.norm(normals, axis=1, keepdims=True)
    # orient outward: away from the parent cell centroid
    centroids = mesh.vertices[mesh.cells[cells]].mean(axis=1)
    fmid = fverts.mean(axis=1)
    flip = np.einsum("fd,fd->f", normals, fmid - centroids) < 0
    normals[flip] *= -1.0

    # map physical points to parent-cell reference coordinates
    detJ, Jinv = _cell_geometry(mesh, cells)
    v0 = mesh.vertices[mesh.cells[cells, 0]]
    Xref = np.einsum("ftd,fqd->fqt", Jinv, phys - v0[:, None, :])

    # tabulate cell bases at the per-facet reference points (host)
    tab_u = [spaces.velocity.element.tabulate(Xref[f]) for f in range(nf)]
    tab_p = [spaces.pressure.element.tabulate(Xref[f]) for f in range(nf)]
    phi_u = np.stack([t.phi for t in tab_u]) if nf else np.zeros((0, nqf, ctx.nu_el))
    gref_u = np.stack([t.grad for t in tab_u]) if nf else np.zeros((0, nqf, ctx.nu_el, mesh.tdim))
    phi_p = np.stack([t.phi for t in tab_p]) if nf else np.zeros((0, nqf, ctx.np_el))
    gphi_u = np.einsum("fqit,ftd->fqid", gref_u, Jinv)

    cell_dofs = spaces.mixed_cell_dofs[cells]
    slots = _pair_slots(ctx.pattern, cell_dofs)

    return FacetContext(
        marker=marker,
        facet_ids=facet_ids,
        parent_cells=cells,
        w=jnp.asarray(frule.weights),
        detJf=jnp.asarray(detJf),
        normals=jnp.asarray(normals),
        phi_u=jnp.asarray(phi_u),
        gphi_u=jnp.asarray(gphi_u),
        phi_p=jnp.asarray(phi_p),
        cell_dofs=jnp.asarray(cell_dofs),
        slots=jnp.asarray(slots),
    )


def _cell_geometry(mesh: Mesh, cells: np.ndarray):
    v = mesh.vertices[mesh.cells[cells]]
    J = np.transpose(v[:, 1:] - v[:, :1], (0, 2, 1))
    return np.abs(np.linalg.det(J)), np.linalg.inv(J)


def _pair_slots(pattern: SparsityPattern, cell_dofs: np.ndarray) -> np.ndarray:
    """nnz slot of every (row, col) pair of the given per-facet dof sets."""
    nf, nd = cell_dofs.shape
    rows = np.broadcast_to(cell_dofs[:, :, None], (nf, nd, nd)).ravel().astype(np.int64)
    cols = np.broadcast_to(cell_dofs[:, None, :], (nf, nd, nd)).ravel().astype(np.int64)
    # (row, col) pairs form one globally sorted key over the CSR layout
    m1 = pattern.shape[1] + 1
    key = pattern.row_ids.astype(np.int64) * m1 + pattern.indices
    want = rows * m1 + cols
    slots = np.searchsorted(key, want)
    if not (key[np.minimum(slots, key.size - 1)] == want).all():
        raise RuntimeError("Facet dof pair missing from sparsity pattern.")
    return slots.astype(np.int32)


# ---------------------------------------------------------------------------
# Boundary kernels
# ---------------------------------------------------------------------------


def neumann_velocity_load(fc: FacetContext, ctx: AssemblyContext, g: tuple[float, ...]) -> jnp.ndarray:
    """Global load vector of integral g . v over the facet set
    (parity: Stokes linear form, ``FEM/operators.py:207-208``)."""
    gvec = jnp.asarray(g)
    # r[f, i, d] = sum_q w detJf phi[f,q,i] g_d
    r = jnp.einsum("q,f,fqi,d->fid", fc.w, fc.detJf, fc.phi_u, gvec)
    nud = ctx.nu_el * ctx.gdim
    el = jnp.zeros((fc.cell_dofs.shape[0], ctx.ndofs_el), dtype=r.dtype)
    el = el.at[:, :nud].set(r.reshape(r.shape[0], -1))
    return _scatter_facet_vector(fc, ctx, el)


def neumann_pressure_load(fc: FacetContext, ctx: AssemblyContext, h: float) -> jnp.ndarray:
    """Global load of integral h * q over the facet set
    (``FEM/operators.py:209-210``)."""
    r = h * jnp.einsum("q,f,fqk->fk", fc.w, fc.detJf, fc.phi_p)
    nud = ctx.nu_el * ctx.gdim
    el = jnp.zeros((fc.cell_dofs.shape[0], ctx.ndofs_el), dtype=r.dtype)
    el = el.at[:, nud:].set(r)
    return _scatter_facet_vector(fc, ctx, el)


def robin_matrix_data(fc: FacetContext, ctx: AssemblyContext, alpha: float) -> jnp.ndarray:
    """nnz-data contribution of -alpha * integral u . v
    (the matrix part of the Robin term, ``FEM/operators.py:363-364``)."""
    s = -alpha * jnp.einsum("q,f,fqi,fqj->fij", fc.w, fc.detJf, fc.phi_u, fc.phi_u)
    return _scatter_vv_block(fc, ctx, _expand_diag(s, ctx.gdim))


def viscous_outlet_matrix_data(fc: FacetContext, ctx: AssemblyContext, re: float) -> jnp.ndarray:
    """nnz data of +(1/re) integral (grad(u) n) . v on outlet facets
    (``VariationalForms.viscous_outlet``, ``FEM/operators.py:262-271``)."""
    return _scatter_vv_block(fc, ctx, viscous_outlet_element_blocks(fc, ctx, re))


def viscous_outlet_element_blocks(fc: FacetContext, ctx: AssemblyContext, re) -> jnp.ndarray:
    """(nf, nud, nud) facet element blocks of the viscous-outlet term —
    usable both for nnz scatter and as extra "cells" in matrix-free
    element operators (``ops.elementop.CElementOperator``)."""
    gn = jnp.einsum("fqjd,fd->fqj", fc.gphi_u, fc.normals)
    s = (1.0 / re) * jnp.einsum("q,f,fqi,fqj->fij", fc.w, fc.detJf, fc.phi_u, gn)
    return _expand_diag(s, ctx.gdim)


def traction_force(
    fc: FacetContext,
    ctx: AssemblyContext,
    w_mixed: jnp.ndarray,
    re: float,
    direction: int = 0,
) -> jnp.ndarray:
    """Nondimensional force component over the facet set from the Cauchy
    stress sigma = -p I + (2/re) sym(grad u) (parity: ``compute_drag``,
    ``Solver/baseflow.py:188-213``)."""
    nu = ctx.spaces.velocity.num_dofs
    g = ctx.gdim
    parents = np.asarray(fc.parent_cells)
    u_nodes = w_mixed[:nu].reshape(-1, g)[np.asarray(ctx.spaces.velocity.cell_nodes)[parents]]
    p_nodes = w_mixed[nu:][np.asarray(ctx.spaces.pressure.cell_nodes)[parents]]
    gradu = jnp.einsum("fid,fqie->fqde", u_nodes, fc.gphi_u)
    pq = jnp.einsum("fqk,fk->fq", fc.phi_p, p_nodes)
    sym = 0.5 * (gradu + jnp.swapaxes(gradu, -1, -2))
    eye = jnp.eye(g, dtype=w_mixed.dtype)
    sigma = -pq[:, :, None, None] * eye + (2.0 / re) * sym
    tr = jnp.einsum("fqde,fe->fqd", sigma, fc.normals)
    return jnp.einsum("q,f,fq->", fc.w, fc.detJf, tr[:, :, direction])


def _expand_diag(s: jnp.ndarray, gdim: int) -> jnp.ndarray:
    nf, a, b = s.shape
    eye = jnp.eye(gdim, dtype=s.dtype)
    return jnp.einsum("fij,de->fidje", s, eye).reshape(nf, a * gdim, b * gdim)


def _scatter_vv_block(fc: FacetContext, ctx: AssemblyContext, vv: jnp.ndarray) -> jnp.ndarray:
    """Place (nf, nud, nud) facet blocks into full nnz-sized data."""
    nf = vv.shape[0]
    nud = ctx.nu_el * ctx.gdim
    full = jnp.zeros((nf, ctx.ndofs_el, ctx.ndofs_el), dtype=vv.dtype)
    full = full.at[:, :nud, :nud].set(vv)
    from lsafw_tpu.ops.exact import segment_sum_fast

    return segment_sum_fast(full.reshape(-1), fc.slots, ctx.pattern.nnz)


def _scatter_facet_vector(fc: FacetContext, ctx: AssemblyContext, el: jnp.ndarray) -> jnp.ndarray:
    from lsafw_tpu.ops.exact import segment_sum_fast

    return segment_sum_fast(
        el.reshape(-1), fc.cell_dofs.reshape(-1), ctx.spaces.num_dofs
    )
