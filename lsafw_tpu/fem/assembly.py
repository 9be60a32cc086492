"""Batched finite-element assembly on static sparsity.

TPU-native replacement for dolfinx/FFCx cell-kernel assembly
(``FEM/operators.py:483-507``, reached via ``assemble_matrix``/
``assemble_vector``): per-cell element matrices are computed for *all*
cells at once with einsum contractions, then scattered into the shared
CSR pattern with one ``segment_sum``.

Affine-simplex structure is exploited aggressively: for constant-
Jacobian cells every bilinear term reduces to a contraction of a
*static* reference tensor (precomputed once from basis tabulations)
with a small per-cell geometry factor — e.g. the viscous matrix is
``K0[t,s,i,j] . G[c,t,s]`` with ``G = detJ * Jinv Jinv^T``, a
(num_cells, tdim^2) x (tdim^2, ndofs^2) matmul that lands on the MXU.

The element-matrix kernels here are the building blocks; the physics
assemblers in :mod:`lsafw_tpu.models` compose them into the operators
of ``FEM/operators.py`` (VariationalForms, ``:236-284``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.quadrature import QuadratureRule, quadrature_rule
from lsafw_tpu.fem.spaces import FunctionSpace, FunctionSpaces  # noqa: F401
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.ops.sparse import (
    CSRMatrix,
    PatternDev,
    SparsityPattern,
    assemble_csr_data,
    build_sparsity,
)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def affine_geometry(mesh: Mesh) -> tuple[np.ndarray, np.ndarray]:
    """(detJ, Jinv) of the affine map per cell.

    Simplices: J columns are the edge vectors v_i - v_0.  Tensor cells
    (quad/hex) are affine exactly when they are parallelograms /
    parallelepipeds — there the columns are the axis edges from the
    binary vertex ordering; callers must verify the parallelogram
    property (see :func:`is_parallelogram_cells`) or use
    :func:`nonaffine_geometry`.  detJ is the absolute value
    (orientation-normalized, matching positive quadrature weights).
    """
    from lsafw_tpu.meshing.mesh import CellType

    v = mesh.vertices[mesh.cells]  # (nc, nverts, gdim)
    if mesh.cell_type is CellType.QUADRILATERAL:
        # vertex order (0,0),(1,0),(0,1),(1,1): axis edges are v1/v2
        E = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)
        J = E  # (nc, gdim, 2)
    elif mesh.cell_type is CellType.HEXAHEDRON:
        # binary (di, dj, dk) order with k fastest: x->4, y->2, z->1
        J = np.stack(
            [v[:, 4] - v[:, 0], v[:, 2] - v[:, 0], v[:, 1] - v[:, 0]], axis=2)
    else:
        J = np.transpose(v[:, 1:] - v[:, :1], (0, 2, 1))  # (nc, gdim, tdim)
    if mesh.tdim != mesh.gdim:
        raise NotImplementedError("Embedded manifolds not supported.")
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)  # (nc, tdim, gdim)
    return detJ, Jinv


def is_parallelogram_cells(mesh: Mesh, tol: float = 1e-12) -> bool:
    """True when every tensor-product cell's bilinear map is affine
    (parallelogram quads / parallelepiped hexes); trivially true for
    simplices."""
    from lsafw_tpu.meshing.mesh import CellType

    v = mesh.vertices[mesh.cells]
    scale = max(float(np.abs(v).max()), 1.0)
    if mesh.cell_type is CellType.QUADRILATERAL:
        dev = v[:, 3] - v[:, 1] - v[:, 2] + v[:, 0]
        return bool(np.abs(dev).max() <= tol * scale)
    if mesh.cell_type is CellType.HEXAHEDRON:
        a = v[:, 4] - v[:, 0]
        b = v[:, 2] - v[:, 0]
        c = v[:, 1] - v[:, 0]
        idx = [(di, dj, dk) for di in (0, 1) for dj in (0, 1) for dk in (0, 1)]
        for m, (di, dj, dk) in enumerate(idx):
            pred = v[:, 0] + di * a + dj * b + dk * c
            if np.abs(v[:, m] - pred).max() > tol * scale:
                return False
        return True
    return True


def nonaffine_geometry(mesh: Mesh, points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-quadrature-point (detJ (nc, nq), Jinv (nc, nq, tdim, gdim))
    through the multilinear Q1 geometry map — the non-affine path for
    quadrilateral/hexahedral cells (closing the ``iCellType`` parity
    gap, ``/root/reference/Meshing/utils.py:12-54``; dolfinx computes
    these factors per-point in its FFCx kernels)."""
    from lsafw_tpu.fem.elements import ElementFamily, make_element

    geom = make_element(ElementFamily.Q1, mesh.cell_type)
    tab = geom.tabulate(points)  # grad: (nq, nverts, tdim)
    v = mesh.vertices[mesh.cells]  # (nc, nverts, gdim)
    J = np.einsum("cvg,qvt->cqgt", v, tab.grad)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)  # (nc, nq, tdim, gdim)
    return detJ, Jinv


# ---------------------------------------------------------------------------
# Assembly context
# ---------------------------------------------------------------------------


@dataclass
class _ContextBase:
    """Shared tabulation/geometry data.  ``phi_u``/``dphi_u`` name the
    *primary* basis (velocity for mixed problems, the single basis for
    scalar/vector problems) so element kernels work on both contexts.

    Contexts are registered as pytrees and MUST be passed through jit
    boundaries as *arguments* — closing over a context embeds its (large)
    arrays as compile-time constants, which makes TPU compilation take
    minutes (see ops.sparse module docstring).
    """

    rule: QuadratureRule
    w: jnp.ndarray  # (nq,)
    phi_u: jnp.ndarray  # (nq, nu_el)
    dphi_u: jnp.ndarray  # (nq, nu_el, tdim)
    detJ: jnp.ndarray  # (nc,)
    Jinv: jnp.ndarray  # (nc, tdim, gdim)
    pattern: SparsityPattern
    pattern_dev: PatternDev = None  # type: ignore[assignment]
    row_plan: object = None  # RowPlan | None (row-gather assembly on TPU)

    # names of array fields that become pytree leaves (subclasses extend)
    _LEAF_FIELDS = ("w", "phi_u", "dphi_u", "detJ", "Jinv", "pattern_dev",
                    "row_plan")
    # cached reference tensors included as leaves (computed at build)
    _LEAF_CACHED = ("M0", "K0", "metric")
    _AUX_FIELDS = ("rule", "pattern")

    @property
    def nu_el(self) -> int:
        return int(self.phi_u.shape[1])

    def _row_cell_dofs(self):
        raise NotImplementedError

    def _warm(self) -> None:
        """Evaluate the cached reference tensors eagerly.  They must not
        be first computed inside a jit trace (the cached value would be
        a leaked tracer)."""
        _ = (self.M0, self.K0, self.metric)
        if self.pattern_dev is None:
            object.__setattr__(self, "pattern_dev", self.pattern.dev)
        if self.row_plan is None:
            from lsafw_tpu.fem.rowassembly import RowPlan, row_plan_enabled

            if row_plan_enabled():
                try:
                    object.__setattr__(
                        self, "row_plan",
                        RowPlan.build(np.asarray(self._row_cell_dofs()),
                                      self.pattern))
                except Exception as e:  # planning is best-effort
                    from lsafw_tpu.utils.logging import get_logger

                    get_logger(__name__).warning(
                        "Row-assembly planning failed (%s); keeping the "
                        "segment-sum scatter.", e)

    # --- pytree protocol (registered on subclasses) ---
    def tree_flatten(self):
        leaves = tuple(getattr(self, n) for n in self._LEAF_FIELDS) + tuple(
            getattr(self, n) for n in self._LEAF_CACHED
        )
        aux = tuple(getattr(self, n) for n in self._AUX_FIELDS)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        nf = len(cls._LEAF_FIELDS)
        for name, val in zip(cls._LEAF_FIELDS, leaves[:nf]):
            object.__setattr__(obj, name, val)
        for name, val in zip(cls._LEAF_CACHED, leaves[nf:]):
            obj.__dict__[name] = val  # pre-populate cached_property slots
        for name, val in zip(cls._AUX_FIELDS, aux):
            object.__setattr__(obj, name, val)
        return obj

    # --- static reference tensors (precontracted over quadrature) ---
    @cached_property
    def M0(self) -> jnp.ndarray:
        """(nu_el, nu_el): sum_q w phi_i phi_j — scalar mass on ref cell."""
        return jnp.einsum("q,qi,qj->ij", self.w, self.phi_u, self.phi_u)

    @cached_property
    def M0_p(self) -> jnp.ndarray:
        return jnp.einsum("q,qi,qj->ij", self.w, self.phi_p, self.phi_p)

    @cached_property
    def K0(self) -> jnp.ndarray:
        """(tdim, tdim, nu_el, nu_el): sum_q w dphi_i,t dphi_j,s."""
        return jnp.einsum("q,qit,qjs->tsij", self.w, self.dphi_u, self.dphi_u)

    @cached_property
    def B0(self) -> jnp.ndarray:
        """(tdim, np_el, nu_el): sum_q w phi_p,k dphi_u,jt."""
        return jnp.einsum("q,qk,qjt->tkj", self.w, self.phi_p, self.dphi_u)

    @property
    def is_affine(self) -> bool:
        """Constant-Jacobian cells (simplices) vs per-qp geometry
        (quad/hex); static at trace time (ndim is shape metadata)."""
        return self.detJ.ndim == 1

    @cached_property
    def metric(self) -> jnp.ndarray:
        """G = detJ * Jinv @ Jinv^T: (nc, t, s) for affine cells,
        (nc, nq, t, s) per quadrature point for non-affine."""
        if not self.is_affine:
            return self.detJ[..., None, None] * jnp.einsum(
                "cqtd,cqsd->cqts", self.Jinv, self.Jinv
            )
        return self.detJ[:, None, None] * jnp.einsum(
            "ctd,csd->cts", self.Jinv, self.Jinv
        )

    def phys_grad_u(self) -> jnp.ndarray:
        """(nc, nq, nu_el, gdim) physical velocity-basis gradients."""
        if not self.is_affine:
            return jnp.einsum("qit,cqtd->cqid", self.dphi_u, self.Jinv)
        return jnp.einsum("qit,ctd->cqid", self.dphi_u, self.Jinv)


@dataclass
class AssemblyContext(_ContextBase):
    """Static per-(mesh, spaces) assembly data for the mixed
    velocity-pressure space: tabulations, geometry factors, reference
    tensors and the shared mixed sparsity pattern.

    A pytree: pass it as a jit argument (see base class).
    """

    spaces: FunctionSpaces = None  # type: ignore[assignment]
    phi_p: jnp.ndarray = None  # (nq, np_el)
    dphi_p: jnp.ndarray = None  # (nq, np_el, tdim)
    cell_nodes_u: jnp.ndarray = None  # (nc, nu_el) int32
    mixed_cell_dofs: jnp.ndarray = None  # (nc, ndofs_el) int32

    _LEAF_FIELDS = _ContextBase._LEAF_FIELDS + (
        "phi_p", "dphi_p", "cell_nodes_u", "mixed_cell_dofs",
    )
    _LEAF_CACHED = _ContextBase._LEAF_CACHED + ("M0_p", "B0")
    _AUX_FIELDS = _ContextBase._AUX_FIELDS + ("spaces",)

    @classmethod
    def build(cls, spaces: FunctionSpaces, quad_degree: int | None = None) -> "AssemblyContext":
        from lsafw_tpu.meshing.mesh import CellType

        mesh = spaces.velocity.mesh
        if mesh.cell_type in (CellType.QUADRILATERAL, CellType.HEXAHEDRON):
            # the mixed kernels consume per-cell (affine) geometry
            # factors; that is exact on parallelogram/parallelepiped
            # tensor cells (structured channel grids), where the
            # Q2/Q1 pair is the tensor Taylor-Hood element
            if not is_parallelogram_cells(mesh):
                raise NotImplementedError(
                    "Mixed spaces on curvilinear quad/hex cells need "
                    "per-quadrature-point geometry in the NS kernels; "
                    "only parallelogram/parallelepiped tensor cells are "
                    "supported (or use simplices)."
                )
        deg = quad_degree or spaces.quad_degree
        rule = quadrature_rule(mesh.cell_type, deg)
        tab_u = spaces.velocity.element.tabulate(rule.points)
        tab_p = spaces.pressure.element.tabulate(rule.points)
        detJ, Jinv = affine_geometry(mesh)
        pattern = build_sparsity(
            spaces.mixed_cell_dofs, shape=(spaces.num_dofs, spaces.num_dofs)
        )
        ctx = cls(
            rule=rule,
            w=jnp.asarray(rule.weights),
            phi_u=jnp.asarray(tab_u.phi),
            dphi_u=jnp.asarray(tab_u.grad),
            detJ=jnp.asarray(detJ),
            Jinv=jnp.asarray(Jinv),
            pattern=pattern,
            spaces=spaces,
            phi_p=jnp.asarray(tab_p.phi),
            dphi_p=jnp.asarray(tab_p.grad),
            cell_nodes_u=jnp.asarray(spaces.velocity.cell_nodes),
            mixed_cell_dofs=jnp.asarray(spaces.mixed_cell_dofs),
        )
        ctx._warm()
        _ = (ctx.M0_p, ctx.B0)
        return ctx

    def _row_cell_dofs(self):
        return self.spaces.mixed_cell_dofs

    @property
    def gdim(self) -> int:
        return self.spaces.velocity.mesh.gdim

    @property
    def np_el(self) -> int:
        return int(self.phi_p.shape[1])

    @property
    def ndofs_el(self) -> int:
        return self.nu_el * self.gdim + self.np_el


jax.tree_util.register_pytree_node_class(AssemblyContext)


@dataclass
class SpaceContext(_ContextBase):
    """Assembly context for a single (scalar or blocked-vector) space —
    the membrane benchmark and elasticity EVP live here
    (parity: ``Elasticity/operators.py``, ``tests/benchmark/vibrating_membrane.py``)."""

    space: FunctionSpace = None  # type: ignore[assignment]
    cell_dofs: jnp.ndarray = None  # (nc, ndofs_el*bs) int32

    _LEAF_FIELDS = _ContextBase._LEAF_FIELDS + ("cell_dofs",)
    _AUX_FIELDS = _ContextBase._AUX_FIELDS + ("space",)

    @classmethod
    def build(cls, space: FunctionSpace, quad_degree: int | None = None) -> "SpaceContext":
        from lsafw_tpu.meshing.mesh import CellType

        mesh = space.mesh
        deg = quad_degree or 2 * space.element.degree
        rule = quadrature_rule(mesh.cell_type, deg)
        tab = space.element.tabulate(rule.points)
        if mesh.cell_type in (CellType.QUADRILATERAL, CellType.HEXAHEDRON):
            # tensor-product cells: bilinear/trilinear maps need per-qp
            # geometry (non-affine path)
            detJ, Jinv = nonaffine_geometry(mesh, rule.points)
        else:
            detJ, Jinv = affine_geometry(mesh)
        pattern = build_sparsity(space.cell_dofs, shape=(space.num_dofs, space.num_dofs))
        ctx = cls(
            rule=rule,
            w=jnp.asarray(rule.weights),
            phi_u=jnp.asarray(tab.phi),
            dphi_u=jnp.asarray(tab.grad),
            detJ=jnp.asarray(detJ),
            Jinv=jnp.asarray(Jinv),
            pattern=pattern,
            space=space,
            cell_dofs=jnp.asarray(space.cell_dofs),
        )
        ctx._warm()
        return ctx

    def _row_cell_dofs(self):
        return self.space.cell_dofs

    @property
    def gdim(self) -> int:
        return self.space.mesh.gdim

    def scatter(self, element_mats: jnp.ndarray) -> CSRMatrix:
        return CSRMatrix(
            self.pattern,
            scatter_entries(self, element_mats),
            self.pattern_dev,
        )

    def scatter_vec(self, element_vecs: jnp.ndarray) -> jnp.ndarray:
        from lsafw_tpu.ops.exact import segment_sum_fast

        return segment_sum_fast(
            element_vecs.reshape(-1), self.cell_dofs.reshape(-1), self.space.num_dofs
        )


jax.tree_util.register_pytree_node_class(SpaceContext)


# ---------------------------------------------------------------------------
# Scalar element kernels
# ---------------------------------------------------------------------------


def mass_scalar(ctx: AssemblyContext) -> jnp.ndarray:
    """(nc, nu_el, nu_el) element mass matrices (affine: detJ * M0;
    non-affine quad/hex: per-qp |detJ| contraction)."""
    if not ctx.is_affine:
        return jnp.einsum("q,cq,qi,qj->cij", ctx.w, ctx.detJ, ctx.phi_u, ctx.phi_u)
    return ctx.detJ[:, None, None] * ctx.M0[None]


def stiffness_scalar(ctx: AssemblyContext) -> jnp.ndarray:
    """(nc, nu_el, nu_el) element Laplacian: contraction of the static
    reference tensor with the per-cell metric (an MXU matmul); the
    non-affine path contracts per quadrature point."""
    if not ctx.is_affine:
        return jnp.einsum("q,qit,cqts,qjs->cij", ctx.w, ctx.dphi_u, ctx.metric, ctx.dphi_u)
    return jnp.einsum("cts,tsij->cij", ctx.metric, ctx.K0)


def divergence_block(ctx: AssemblyContext) -> jnp.ndarray:
    """(nc, np_el, nu_el, gdim): integral phi_p,k * d(phi_u,j)/dx_d.

    Row = pressure test k, col = velocity trial (j, component d)
    (the reference's divergence form, ``FEM/operators.py:274-276``).
    """
    dJinv = ctx.detJ[:, None, None] * ctx.Jinv
    return jnp.einsum("tkj,ctd->ckjd", ctx.B0, dJinv)


def convection_scalar(ctx: AssemblyContext, ub_el: jnp.ndarray) -> jnp.ndarray:
    """(nc, nu_el, nu_el): integral phi_i * (u_b . grad phi_j).

    ``ub_el``: (nc, nu_el, gdim) baseflow velocity at element nodes.
    Component-diagonal part of the convection operator
    (``VariationalForms.convection_shear`` with base as coefficient,
    ``FEM/operators.py:244-251``).
    """
    gu = ctx.phys_grad_u()  # (nc, nq, j, d)
    ubq = jnp.einsum("qi,cid->cqd", ctx.phi_u, ub_el)  # (nc, nq, d)
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    return jnp.einsum("cq,qi,cqd,cqjd->cij", wdet, ctx.phi_u, ubq, gu)


def shear_tensor(ctx: AssemblyContext, ub_el: jnp.ndarray) -> jnp.ndarray:
    """(nc, nu_el, nu_el, gdim, gdim): integral phi_i phi_j * d(u_b,d)/dx_e.

    Trial component e feeds test component d through grad(u_b)
    (``VariationalForms.convection_shear`` with trial as coefficient).
    """
    gu = ctx.phys_grad_u()
    gub = jnp.einsum("cid,cqie->cqde", ub_el, gu)  # (nc, nq, d, e)
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    return jnp.einsum("cq,qi,qj,cqde->cijde", wdet, ctx.phi_u, ctx.phi_u, gub)


# ---------------------------------------------------------------------------
# Mixed-block composition
# ---------------------------------------------------------------------------


def expand_vector_diag(scalar_el: jnp.ndarray, gdim: int) -> jnp.ndarray:
    """Lift (nc, i, j) scalar blocks to component-diagonal vector blocks
    (nc, i*gdim, j*gdim) in node-major/component-minor DOF order."""
    nc, a, b = scalar_el.shape
    eye = jnp.eye(gdim, dtype=scalar_el.dtype)
    return jnp.einsum("cij,de->cidje", scalar_el, eye).reshape(nc, a * gdim, b * gdim)


def compose_mixed(
    ctx: AssemblyContext,
    vv: jnp.ndarray | None = None,
    vp: jnp.ndarray | None = None,
    pv: jnp.ndarray | None = None,
    pp: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Place blocks into full (nc, ndofs_el, ndofs_el) element matrices.

    vv: (nc, nud, nud), vp: (nc, nud, np_el), pv: (nc, np_el, nud),
    pp: (nc, np_el, np_el); missing blocks are zero.
    """
    nc = ctx.detJ.shape[0]
    nud = ctx.nu_el * ctx.gdim
    npl = ctx.np_el
    dtype = ctx.detJ.dtype
    A = jnp.zeros((nc, nud + npl, nud + npl), dtype=dtype)
    if vv is not None:
        A = A.at[:, :nud, :nud].add(vv)
    if vp is not None:
        A = A.at[:, :nud, nud:].add(vp)
    if pv is not None:
        A = A.at[:, nud:, :nud].add(pv)
    if pp is not None:
        A = A.at[:, nud:, nud:].add(pp)
    return A


def scatter_entries(ctx: _ContextBase, element_mats: jnp.ndarray) -> jnp.ndarray:
    """Full-cell element matrices -> flat CSR data.

    Dispatches to the row-gather formulation
    (:mod:`lsafw_tpu.fem.rowassembly`) when the context carries a
    :class:`RowPlan` (the TPU default — the per-index scatter wall costs
    ~8 ns/entry x 4 channels; the row-gather path replaces it with slice
    gathers + a one-hot reduction), else the exact segment-sum scatter.
    The dispatch is static at trace time (pytree structure)."""
    if ctx.row_plan is not None:
        from lsafw_tpu.fem.rowassembly import assemble_rows

        return assemble_rows(ctx.row_plan, ctx.pattern_dev.slots, element_mats)
    return assemble_csr_data(ctx.pattern_dev, element_mats)


def scatter_matrix(ctx: AssemblyContext, element_mats: jnp.ndarray) -> CSRMatrix:
    """Element matrices -> global CSR on the shared mixed pattern."""
    return CSRMatrix(
        ctx.pattern, scatter_entries(ctx, element_mats), ctx.pattern_dev
    )


def scatter_vector(ctx: AssemblyContext, element_vecs: jnp.ndarray) -> jnp.ndarray:
    """(nc, ndofs_el) element vectors -> (num_dofs,) global vector."""
    from lsafw_tpu.ops.exact import segment_sum_fast

    return segment_sum_fast(
        element_vecs.reshape(-1), ctx.mixed_cell_dofs.reshape(-1), ctx.spaces.num_dofs
    )


def gather_velocity_nodes(ctx: AssemblyContext, w_mixed: jnp.ndarray) -> jnp.ndarray:
    """Gather (nc, nu_el, gdim) nodal velocity values of a mixed vector."""
    from lsafw_tpu.ops.exact import gather_f64_fast

    g = ctx.gdim
    u = w_mixed[: ctx.spaces.velocity.num_dofs].reshape(-1, g)
    return gather_f64_fast(u, ctx.cell_nodes_u)


# ---------------------------------------------------------------------------
# Dirichlet BC application (dolfinx semantics)
# ---------------------------------------------------------------------------


def dirichlet_matrix_data(
    pattern: SparsityPattern | PatternDev,
    data: jnp.ndarray,
    bc_mask: jnp.ndarray,
    diag_value: float = 1.0,
) -> jnp.ndarray:
    """Zero BC rows *and* columns, put ``diag_value`` on BC diagonals.

    Matches ``dolfinx.fem.petsc.assemble_matrix(form, bcs)`` semantics
    (``FEM/operators.py:220-231``; identity-row property tested by the
    reference at ``tests/unit/FEM/test_operators.py:35-47``).  Using
    ``diag_value=0.0`` for the mass matrix turns the reference's
    spurious sigma=1 Dirichlet modes into harmless infinite eigenvalues
    (cf. filtering at ``tests/benchmark/vibrating_membrane.py:169-173``).
    """
    if isinstance(pattern, SparsityPattern) and not pattern.has_full_diagonal:
        # the zeros sentinel in PatternDev.diag_slots would silently
        # clobber nnz slot 0 instead of writing BC diagonals
        raise ValueError(
            "Dirichlet application needs a pattern with stored diagonal "
            "entries (build the sparsity from square cell DOF maps)."
        )
    dev = pattern.dev if isinstance(pattern, SparsityPattern) else pattern
    kill = bc_mask[dev.row_ids] | bc_mask[dev.indices]
    data = jnp.where(kill, 0.0, data)
    new_diag = jnp.where(bc_mask, diag_value, data[dev.diag_slots])
    return data.at[dev.diag_slots].set(new_diag)


def dirichlet_lift(
    A_nobc: CSRMatrix,
    b: jnp.ndarray,
    bc_mask: jnp.ndarray,
    bc_values: jnp.ndarray,
) -> jnp.ndarray:
    """Apply lifting then set BC rows: b <- b - A g on free rows,
    b[bc] = g[bc] (parity: ``dfem.apply_lifting`` + ``set_bc``,
    ``FEM/operators.py:225-231``)."""
    g = jnp.where(bc_mask, bc_values, 0.0)
    lifted = b - (A_nobc @ g)
    return jnp.where(bc_mask, bc_values, lifted)
