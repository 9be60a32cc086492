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

from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.quadrature import QuadratureRule, quadrature_rule
from lsafw_tpu.fem.spaces import FunctionSpace, FunctionSpaces  # noqa: F401
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.ops.sparse import (
    CSRMatrix,
    SparsityPattern,
    assemble_csr_data,
    build_sparsity,
)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def affine_geometry(mesh: Mesh) -> tuple[np.ndarray, np.ndarray]:
    """(detJ, Jinv) of the affine map per cell (simplices).

    J columns are edge vectors v_i - v_0; detJ is the absolute value
    (orientation-normalized, matching positive quadrature weights).
    """
    v = mesh.vertices[mesh.cells]  # (nc, nverts, gdim)
    J = np.transpose(v[:, 1:] - v[:, :1], (0, 2, 1))  # (nc, gdim, tdim)
    if mesh.tdim != mesh.gdim:
        raise NotImplementedError("Embedded manifolds not supported.")
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)  # (nc, tdim, gdim)
    return detJ, Jinv


# ---------------------------------------------------------------------------
# Assembly context
# ---------------------------------------------------------------------------


@dataclass
class _ContextBase:
    """Shared tabulation/geometry data.  ``phi_u``/``dphi_u`` name the
    *primary* basis (velocity for mixed problems, the single basis for
    scalar/vector problems) so element kernels work on both contexts."""

    rule: QuadratureRule
    w: jnp.ndarray  # (nq,)
    phi_u: jnp.ndarray  # (nq, nu_el)
    dphi_u: jnp.ndarray  # (nq, nu_el, tdim)
    detJ: jnp.ndarray  # (nc,)
    Jinv: jnp.ndarray  # (nc, tdim, gdim)
    pattern: SparsityPattern
    _jit_cache: dict = field(default_factory=dict, repr=False)

    @property
    def nu_el(self) -> int:
        return int(self.phi_u.shape[1])

    def jitted(self, key: str, factory):
        """Compile-once cache for assembler closures over this context
        (one XLA executable per (context, kernel), shared by all
        assembler instances)."""
        if key not in self._jit_cache:
            self._jit_cache[key] = factory()
        return self._jit_cache[key]

    def _warm(self) -> None:
        """Evaluate the cached reference tensors eagerly.  They must not
        be first computed inside a jit trace (the cached value would be
        a leaked tracer)."""
        _ = (self.M0, self.K0, self.metric)

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

    @cached_property
    def metric(self) -> jnp.ndarray:
        """G[c,t,s] = detJ * Jinv @ Jinv^T (per-cell viscous geometry factor)."""
        return self.detJ[:, None, None] * jnp.einsum(
            "ctd,csd->cts", self.Jinv, self.Jinv
        )

    def phys_grad_u(self) -> jnp.ndarray:
        """(nc, nq, nu_el, gdim) physical velocity-basis gradients."""
        return jnp.einsum("qit,ctd->cqid", self.dphi_u, self.Jinv)


@dataclass
class AssemblyContext(_ContextBase):
    """Static per-(mesh, spaces) assembly data for the mixed
    velocity-pressure space: tabulations, geometry factors, reference
    tensors and the shared mixed sparsity pattern.

    Device-resident jnp members are constants under jit; numpy members
    are compile-time structure.
    """

    spaces: FunctionSpaces = None  # type: ignore[assignment]
    phi_p: jnp.ndarray = None  # (nq, np_el)
    dphi_p: jnp.ndarray = None  # (nq, np_el, tdim)
    cell_nodes_u: jnp.ndarray = None  # (nc, nu_el) int32
    mixed_cell_dofs: jnp.ndarray = None  # (nc, ndofs_el) int32

    @classmethod
    def build(cls, spaces: FunctionSpaces, quad_degree: int | None = None) -> "AssemblyContext":
        mesh = spaces.velocity.mesh
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

    @property
    def gdim(self) -> int:
        return self.spaces.velocity.mesh.gdim

    @property
    def np_el(self) -> int:
        return int(self.phi_p.shape[1])

    @property
    def ndofs_el(self) -> int:
        return self.nu_el * self.gdim + self.np_el


@dataclass
class SpaceContext(_ContextBase):
    """Assembly context for a single (scalar or blocked-vector) space —
    the membrane benchmark and elasticity EVP live here
    (parity: ``Elasticity/operators.py``, ``tests/benchmark/vibrating_membrane.py``)."""

    space: FunctionSpace = None  # type: ignore[assignment]
    cell_dofs: jnp.ndarray = None  # (nc, ndofs_el*bs) int32

    @classmethod
    def build(cls, space: FunctionSpace, quad_degree: int | None = None) -> "SpaceContext":
        mesh = space.mesh
        deg = quad_degree or 2 * space.element.degree
        rule = quadrature_rule(mesh.cell_type, deg)
        tab = space.element.tabulate(rule.points)
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

    @property
    def gdim(self) -> int:
        return self.space.mesh.gdim

    def scatter(self, element_mats: jnp.ndarray) -> CSRMatrix:
        return CSRMatrix(self.pattern, assemble_csr_data(self.pattern, element_mats))

    def scatter_vec(self, element_vecs: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(
            element_vecs.reshape(-1),
            self.cell_dofs.reshape(-1),
            num_segments=self.space.num_dofs,
        )


# ---------------------------------------------------------------------------
# Scalar element kernels
# ---------------------------------------------------------------------------


def mass_scalar(ctx: AssemblyContext) -> jnp.ndarray:
    """(nc, nu_el, nu_el) element mass matrices (affine: detJ * M0)."""
    return ctx.detJ[:, None, None] * ctx.M0[None]


def stiffness_scalar(ctx: AssemblyContext) -> jnp.ndarray:
    """(nc, nu_el, nu_el) element Laplacian: contraction of the static
    reference tensor with the per-cell metric (an MXU matmul)."""
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


def scatter_matrix(ctx: AssemblyContext, element_mats: jnp.ndarray) -> CSRMatrix:
    """Element matrices -> global CSR on the shared mixed pattern."""
    return CSRMatrix(ctx.pattern, assemble_csr_data(ctx.pattern, element_mats))


def scatter_vector(ctx: AssemblyContext, element_vecs: jnp.ndarray) -> jnp.ndarray:
    """(nc, ndofs_el) element vectors -> (num_dofs,) global vector."""
    return jax.ops.segment_sum(
        element_vecs.reshape(-1),
        ctx.mixed_cell_dofs.reshape(-1),
        num_segments=ctx.spaces.num_dofs,
    )


def gather_velocity_nodes(ctx: AssemblyContext, w_mixed: jnp.ndarray) -> jnp.ndarray:
    """Gather (nc, nu_el, gdim) nodal velocity values of a mixed vector."""
    g = ctx.gdim
    u = w_mixed[: ctx.spaces.velocity.num_dofs].reshape(-1, g)
    return u[ctx.cell_nodes_u]


# ---------------------------------------------------------------------------
# Dirichlet BC application (dolfinx semantics)
# ---------------------------------------------------------------------------


def dirichlet_matrix_data(
    pattern: SparsityPattern,
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
    row_ids = jnp.asarray(pattern.row_ids)
    col_ids = jnp.asarray(pattern.indices.astype(np.int32))
    kill = bc_mask[row_ids] | bc_mask[col_ids]
    data = jnp.where(kill, 0.0, data)
    diag_slots = jnp.asarray(pattern.diag_slots)
    new_diag = jnp.where(bc_mask, diag_value, data[diag_slots])
    return data.at[diag_slots].set(new_diag)


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
