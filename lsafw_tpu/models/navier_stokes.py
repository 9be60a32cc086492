"""Stokes, stationary Navier-Stokes and linearized Navier-Stokes operators.

TPU-native counterpart of ``FEM/operators.py``: the reference's UFL
variational forms (``VariationalForms:236-284``) become compositions of
the batched element kernels in :mod:`lsafw_tpu.fem.assembly`; the
reference's ``ufl.derivative`` Jacobian (``FEM/operators.py:366-368``)
is replaced by the *analytic* linearization (convection + shear around
the current state), assembled by the very same kernels that build the
eigensystem operator — one code path for Newton and stability analysis.

All hot entry points are module-level jitted functions taking the
assembly context (a pytree) as an argument — the TPU compilation
contract of :mod:`lsafw_tpu.ops.sparse`.

Sign conventions follow the reference exactly:
  residual form  F(w) = -(u.grad)u.v - (1/Re) grad u : grad v
                        + p div v + q div u + f.v  (+ boundary terms)
  eigen operator A = dF/dw at the baseflow; mass M = (u, v) on the
  velocity block; eigenproblem A x = sigma M x
  (``FEM/operators.py:449-509``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import (
    AssemblyContext,
    compose_mixed,
    convection_scalar,
    dirichlet_lift,
    dirichlet_matrix_data,
    divergence_block,
    expand_vector_diag,
    mass_scalar,
    scatter_entries,
    scatter_matrix,
    scatter_vector,
    shear_tensor,
    stiffness_scalar,
)
from lsafw_tpu.fem.bcs import BoundaryConditions
from lsafw_tpu.fem.facets import (
    FacetContext,
    build_facet_context,
    neumann_pressure_load,
    neumann_velocity_load,
    robin_matrix_data,
    viscous_outlet_matrix_data,
)
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.ops.sparse import CSRMatrix, assemble_csr_data, spmv


# ---------------------------------------------------------------------------
# Element-level composites (pure functions of the context pytree)
# ---------------------------------------------------------------------------


def _split_local(ctx: AssemblyContext, w: jnp.ndarray):
    """Gather per-cell local mixed DOFs and split into (u_el, p_el)."""
    w_el = w[ctx.mixed_cell_dofs]  # (nc, ndofs_el)
    nud = ctx.nu_el * ctx.gdim
    u_el = w_el[:, :nud].reshape(-1, ctx.nu_el, ctx.gdim)
    p_el = w_el[:, nud:]
    return u_el, p_el


def linearized_ns_elements(ctx: AssemblyContext, w_base: jnp.ndarray, re) -> jnp.ndarray:
    """Element matrices of the linearized NS operator around ``w_base``
    (parity: ``assemble_linear_operator``, ``FEM/operators.py:449-488``):
    shear + convection + viscous + pressure-gradient + divergence."""
    g = ctx.gdim
    ub_el, _ = _split_local(ctx, w_base)
    conv = convection_scalar(ctx, ub_el)  # (nc, i, j)
    sh = shear_tensor(ctx, ub_el)  # (nc, i, j, d, e)
    visc = stiffness_scalar(ctx)
    nc = visc.shape[0]
    vv = expand_vector_diag(-conv - visc / re, g)
    vv = vv - jnp.transpose(sh, (0, 1, 3, 2, 4)).reshape(nc, ctx.nu_el * g, ctx.nu_el * g)
    dvg = divergence_block(ctx)  # (nc, k, j, d)
    vp = jnp.transpose(dvg, (0, 2, 3, 1)).reshape(nc, ctx.nu_el * g, ctx.np_el)
    pv = dvg.reshape(nc, ctx.np_el, ctx.nu_el * g)
    return compose_mixed(ctx, vv=vv, vp=vp, pv=pv)


def mass_elements(ctx: AssemblyContext) -> jnp.ndarray:
    """Element mass matrices, velocity block only
    (parity: ``assemble_mass_matrix``, ``FEM/operators.py:490-509``)."""
    return compose_mixed(ctx, vv=expand_vector_diag(mass_scalar(ctx), ctx.gdim))


def stokes_elements(ctx: AssemblyContext, re) -> jnp.ndarray:
    """Element matrices of the steady Stokes bilinear form
    (parity: ``StokesAssembler._build_forms``, ``FEM/operators.py:198-203``):
    (1/Re) grad u : grad v - p div v + q div u."""
    g = ctx.gdim
    visc = stiffness_scalar(ctx)
    nc = visc.shape[0]
    vv = expand_vector_diag(visc / re, g)
    dvg = divergence_block(ctx)
    vp = -jnp.transpose(dvg, (0, 2, 3, 1)).reshape(nc, ctx.nu_el * g, ctx.np_el)
    pv = dvg.reshape(nc, ctx.np_el, ctx.nu_el * g)
    return compose_mixed(ctx, vv=vv, vp=vp, pv=pv)


def ns_residual_elements(
    ctx: AssemblyContext, w: jnp.ndarray, re, f: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-cell residual vectors of the stationary NS form F(w)
    (parity: ``StationaryNavierStokesAssembler._build_forms``,
    ``FEM/operators.py:338-368``)."""
    g = ctx.gdim
    u_el, p_el = _split_local(ctx, w)
    gu = ctx.phys_grad_u()  # (nc, q, i, d)
    uq = jnp.einsum("qi,cid->cqd", ctx.phi_u, u_el)
    graduq = jnp.einsum("cid,cqie->cqde", u_el, gu)  # du_d/dx_e
    pq = jnp.einsum("qk,ck->cq", ctx.phi_p, p_el)
    divuq = jnp.trace(graduq, axis1=-2, axis2=-1)
    convq = jnp.einsum("cqe,cqde->cqd", uq, graduq)  # (u.grad u)_d
    wdet = ctx.w[None, :] * ctx.detJ[:, None]

    r_v = (
        -jnp.einsum("cq,qi,cqd->cid", wdet, ctx.phi_u, convq)
        - (1.0 / re) * jnp.einsum("cq,cqde,cqie->cid", wdet, graduq, gu)
        + jnp.einsum("cq,cq,cqid->cid", wdet, pq, gu)
    )
    if f is not None:
        r_v = r_v + jnp.einsum("cq,qi,d->cid", wdet, ctx.phi_u, f)
    r_p = jnp.einsum("cq,qk,cq->ck", wdet, ctx.phi_p, divuq)
    nc = r_v.shape[0]
    return jnp.concatenate([r_v.reshape(nc, -1), r_p], axis=1)


# ---------------------------------------------------------------------------
# Module-level jitted assembly entry points (ctx is an argument pytree)
# ---------------------------------------------------------------------------


def _mat(ctx: AssemblyContext, data: jnp.ndarray) -> CSRMatrix:
    return CSRMatrix(ctx.pattern, data, ctx.pattern_dev)


@jax.jit
def _jit_stokes_system(ctx, re, mask, bc_values, f, neumann_v, neumann_p):
    A0 = scatter_matrix(ctx, stokes_elements(ctx, re))
    b = jnp.zeros(A0.shape[0], dtype=A0.dtype)
    if f is not None:
        wdet = ctx.w[None, :] * ctx.detJ[:, None]
        r_v = jnp.einsum("cq,qi,d->cid", wdet, ctx.phi_u, f)
        nc = r_v.shape[0]
        el = jnp.zeros((nc, ctx.ndofs_el), dtype=A0.dtype)
        el = el.at[:, : ctx.nu_el * ctx.gdim].set(r_v.reshape(nc, -1))
        b = b + scatter_vector(ctx, el)
    for fc, g in neumann_v:
        b = b + neumann_velocity_load(fc, ctx, g)
    for fc, h in neumann_p:
        b = b + neumann_pressure_load(fc, ctx, h)
    b = dirichlet_lift(A0, b, mask, bc_values)
    data_bc = dirichlet_matrix_data(ctx.pattern_dev, A0.data, mask, 1.0)
    return data_bc, b


@jax.jit
def _jit_ns_residual(ctx, w, re, f, outlets, robin):
    r = scatter_vector(ctx, ns_residual_elements(ctx, w, re, f))
    for fc in outlets:
        data = viscous_outlet_matrix_data(fc, ctx, 1.0)
        r = r + (1.0 / re) * spmv(_mat(ctx, data), w)
    for fc, alpha, g in robin:
        data = robin_matrix_data(fc, ctx, alpha)
        r = r + spmv(_mat(ctx, data), w) + alpha * neumann_velocity_load(fc, ctx, g)
    return r


@jax.jit
def _jit_ns_jacobian_data(ctx, w, re, mask, outlets, robin):
    data = scatter_entries(ctx, linearized_ns_elements(ctx, w, re))
    for fc in outlets:
        data = data + (1.0 / re) * viscous_outlet_matrix_data(fc, ctx, 1.0)
    for fc, alpha, _ in robin:
        data = data + robin_matrix_data(fc, ctx, alpha)
    return dirichlet_matrix_data(ctx.pattern_dev, data, mask, 1.0)


@jax.jit
def _jit_linearized_data(ctx, w, re, mask, outlets):
    data = scatter_entries(ctx, linearized_ns_elements(ctx, w, re))
    for fc in outlets:
        data = data + (1.0 / re) * viscous_outlet_matrix_data(fc, ctx, 1.0)
    return dirichlet_matrix_data(ctx.pattern_dev, data, mask, 1.0)


@jax.jit
def _jit_mass_data(ctx, mask, diag):
    data = scatter_entries(ctx, mass_elements(ctx))
    return dirichlet_matrix_data(ctx.pattern_dev, data, mask, diag)


@jax.jit
def convective_linearization_data(ctx, b: jnp.ndarray) -> jnp.ndarray:
    """CSR data of C(b): the convection-only part of the linearized NS
    operator about the mixed state ``b`` — exactly
    ``linearized_ns_elements(ctx, b, re) - linearized_ns_elements(ctx, 0, re)``
    (convection is bilinear; viscous/pressure/divergence are
    b-independent), assembled WITHOUT any Dirichlet masking.

    C(b) v = -[(b . grad) v + (v . grad) b] tested against velocity test
    functions.  By the symmetry of the convection bilinear form this one
    matrix supplies every coupling block of the coupled self-consistent
    (harmonic-balance) Jacobian: d/dU [A(U) q] = C(q) and
    d/dq {-1/2 [(q.grad)q]} = 1/2 C(q)."""
    g = ctx.gdim
    ub_el, _ = _split_local(ctx, b)
    conv = convection_scalar(ctx, ub_el)
    sh = shear_tensor(ctx, ub_el)
    nc = conv.shape[0]
    vv = expand_vector_diag(-conv, g)
    vv = vv - jnp.transpose(sh, (0, 1, 3, 2, 4)).reshape(
        nc, ctx.nu_el * g, ctx.nu_el * g)
    return scatter_entries(ctx, compose_mixed(ctx, vv=vv))


# ---------------------------------------------------------------------------
# Assemblers
# ---------------------------------------------------------------------------


def _check_homogeneous_natural(bcs: BoundaryConditions) -> None:
    """Reject non-homogeneous natural BCs for the eigenproblem
    (parity: ``FEM/operators.py:414-417,565-582``)."""
    for _, gv in bcs.velocity_neumann:
        if any(abs(x) > 0 for x in gv):
            raise ValueError(
                "Non-homogeneous natural (flux) boundary conditions are not yet stable."
            )
    for _, gp in bcs.pressure_neumann:
        if abs(gp) > 0:
            raise ValueError(
                "Non-homogeneous natural (flux) boundary conditions are not yet stable."
            )
    for _, _, gv in bcs.robin:
        if any(abs(x) > 0 for x in gv):
            raise ValueError(
                "Non-homogeneous natural (flux) boundary conditions are not yet stable."
            )


@dataclass
class _NSBase:
    ctx: AssemblyContext
    mesh: Mesh
    bcs: BoundaryConditions

    @property
    def bc_mask(self) -> jnp.ndarray:
        return jnp.asarray(self.bcs.dirichlet_mask)

    @property
    def bc_values(self) -> jnp.ndarray:
        return jnp.asarray(self.bcs.dirichlet_values)

    def _outlet_contexts(self) -> tuple[FacetContext, ...]:
        return tuple(
            build_facet_context(self.ctx, self.mesh, m) for m in self.bcs.outlet_markers
        )


class StokesAssembler(_NSBase):
    """Steady Stokes operator + RHS (parity: ``StokesAssembler``,
    ``FEM/operators.py:158-233``)."""

    def __init__(
        self,
        spaces_ctx: AssemblyContext,
        mesh: Mesh,
        bcs: BoundaryConditions,
        *,
        re: float,
        f: tuple[float, ...] | None = None,
    ) -> None:
        super().__init__(ctx=spaces_ctx, mesh=mesh, bcs=bcs)
        self.re = re
        self.f = jnp.asarray(f) if f is not None else None
        self._neumann_v = tuple(
            (build_facet_context(self.ctx, mesh, m), jnp.asarray(g))
            for m, g in bcs.velocity_neumann
        )
        self._neumann_p = tuple(
            (build_facet_context(self.ctx, mesh, m), jnp.asarray(h))
            for m, h in bcs.pressure_neumann
        )

    def get_matrix_forms(self) -> tuple[CSRMatrix, jnp.ndarray]:
        """Assemble (A_bc, b_lifted) ready for a linear solve."""
        data, b = _jit_stokes_system(
            self.ctx, self.re, self.bc_mask, self.bc_values, self.f,
            self._neumann_v, self._neumann_p,
        )
        return CSRMatrix(self.ctx.pattern, data), b


class StationaryNavierStokesAssembler(_NSBase):
    """Residual + analytic Jacobian of stationary NS
    (parity: ``StationaryNavierStokesAssembler``, ``FEM/operators.py:287-396``).

    ``re`` is a *traced* argument so a Reynolds ramp reuses one compiled
    executable.
    """

    def __init__(
        self,
        spaces_ctx: AssemblyContext,
        mesh: Mesh,
        bcs: BoundaryConditions,
        *,
        f: tuple[float, ...] | None = None,
    ) -> None:
        super().__init__(ctx=spaces_ctx, mesh=mesh, bcs=bcs)
        self.f = jnp.asarray(f) if f is not None else None
        self._outlets = self._outlet_contexts()
        self._robin = tuple(
            (build_facet_context(self.ctx, mesh, m), a, jnp.asarray(g))
            for m, a, g in bcs.robin
        )

    def residual(self, w, re) -> jnp.ndarray:
        return _jit_ns_residual(self.ctx, w, re, self.f, self._outlets, self._robin)

    def jacobian_data(self, w, re) -> jnp.ndarray:
        return _jit_ns_jacobian_data(
            self.ctx, w, re, self.bc_mask, self._outlets, self._robin
        )

    def jacobian(self, w: jnp.ndarray, re) -> CSRMatrix:
        """Assembled Jacobian with Dirichlet rows/cols eliminated."""
        return CSRMatrix(self.ctx.pattern, self.jacobian_data(w, re))


class LinearizedNavierStokesAssembler(_NSBase):
    """Eigensystem (A, M) around a baseflow
    (parity: ``LinearizedNavierStokesAssembler``, ``FEM/operators.py:399-562``).

    Dirichlet handling: A gets identity BC rows/cols; M gets *zero* BC
    rows/cols, which maps the reference's spurious sigma=1 Dirichlet
    modes (filtered at ``tests/benchmark/vibrating_membrane.py:169-173``)
    to infinity where shift-invert never sees them.
    """

    def __init__(
        self,
        base_flow: np.ndarray | jnp.ndarray,
        spaces_ctx: AssemblyContext,
        re: float,
        bcs: BoundaryConditions,
        mesh: Mesh,
        *,
        mass_diag: float = 0.0,
    ) -> None:
        if np.asarray(base_flow).shape != (spaces_ctx.spaces.num_dofs,):
            raise ValueError("Baseflow must be defined on the mixed function space.")
        _check_homogeneous_natural(bcs)
        super().__init__(ctx=spaces_ctx, mesh=mesh, bcs=bcs)
        self.base_flow = jnp.asarray(base_flow)
        self.re = re
        self.mass_diag = mass_diag
        self._outlets = self._outlet_contexts()

    def assemble_linear_operator(self) -> CSRMatrix:
        data = _jit_linearized_data(
            self.ctx, self.base_flow, self.re, self.bc_mask, self._outlets
        )
        return CSRMatrix(self.ctx.pattern, data)

    def assemble_mass_matrix(self) -> CSRMatrix:
        data = _jit_mass_data(self.ctx, self.bc_mask, self.mass_diag)
        return CSRMatrix(self.ctx.pattern, data)

    def assemble_eigensystem(self) -> tuple[CSRMatrix, CSRMatrix]:
        """(A, M) on the shared pattern (``FEM/operators.py:511-527``)."""
        return self.assemble_linear_operator(), self.assemble_mass_matrix()

    def element_matrices(self) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(A_el, M_el, dofs): element matrices of the eigensystem plus
        their DOF maps — the matrix-free form the shift-invert
        refinement applies (``ops.elementop.CElementOperator``).

        Viscous-outlet facet contributions are appended as extra
        element blocks (with zero mass) so the element operator matches
        the assembled operator exactly."""
        from lsafw_tpu.fem.facets import viscous_outlet_element_blocks

        A_el = linearized_ns_elements(self.ctx, self.base_flow, self.re)
        M_el = mass_elements(self.ctx)
        dofs = self.ctx.mixed_cell_dofs
        if self._outlets:
            nd = self.ctx.ndofs_el
            nud = self.ctx.nu_el * self.ctx.gdim
            extra_A, extra_dofs = [], []
            for fc in self._outlets:
                vv = viscous_outlet_element_blocks(fc, self.ctx, self.re)
                full = jnp.zeros((vv.shape[0], nd, nd), dtype=vv.dtype)
                extra_A.append(full.at[:, :nud, :nud].set(vv))
                extra_dofs.append(fc.cell_dofs)
            A_el = jnp.concatenate([A_el] + extra_A, axis=0)
            M_el = jnp.concatenate(
                [M_el, jnp.zeros((A_el.shape[0] - M_el.shape[0], nd, nd), M_el.dtype)],
                axis=0,
            )
            dofs = jnp.concatenate([dofs] + extra_dofs, axis=0)
        return A_el, M_el, dofs

    def pressure_nullspace_vector(self) -> np.ndarray:
        """Normalized constant-pressure vector (parity:
        ``attach_pressure_nullspace``, ``FEM/operators.py:534-545``)."""
        spaces = self.ctx.spaces
        v = np.zeros(spaces.num_dofs)
        v[spaces.dofs_p] = 1.0
        return v / np.linalg.norm(v)

    def extract_subblocks(self, mat: CSRMatrix) -> dict[str, "np.ndarray"]:
        """(vv, vp, pv, pp) scipy subblocks for tests/visualization
        (parity: ``extract_subblocks``, ``FEM/operators.py:547-562``)."""
        spaces = self.ctx.spaces
        s = mat.to_scipy()
        nu = spaces.num_velocity_dofs
        return {
            "vv": s[:nu, :nu],
            "vp": s[:nu, nu:],
            "pv": s[nu:, :nu],
            "pp": s[nu:, nu:],
        }
