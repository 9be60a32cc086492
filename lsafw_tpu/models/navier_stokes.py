"""Stokes, stationary Navier-Stokes and linearized Navier-Stokes operators.

TPU-native counterpart of ``FEM/operators.py``: the reference's UFL
variational forms (``VariationalForms:236-284``) become compositions of
the batched element kernels in :mod:`lsafw_tpu.fem.assembly`; the
reference's ``ufl.derivative`` Jacobian (``FEM/operators.py:366-368``)
is replaced by the *analytic* linearization (convection + shear around
the current state), assembled by the very same kernels that build the
eigensystem operator — one code path for Newton and stability analysis.

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
from lsafw_tpu.ops.sparse import CSRMatrix


# ---------------------------------------------------------------------------
# Element-level composites (jit-friendly pure functions)
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

    def _outlet_contexts(self) -> list[FacetContext]:
        return [
            build_facet_context(self.ctx, self.mesh, m) for m in self.bcs.outlet_markers
        ]


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
        self.f = f
        self._neumann_ctxs = [
            (build_facet_context(self.ctx, mesh, m), g) for m, g in bcs.velocity_neumann
        ]
        self._neumann_p_ctxs = [
            (build_facet_context(self.ctx, mesh, m), h) for m, h in bcs.pressure_neumann
        ]

    def get_matrix_forms(self) -> tuple[CSRMatrix, jnp.ndarray]:
        """Assemble (A_bc, b_lifted) ready for a linear solve."""
        ctx = self.ctx
        assemble = ctx.jitted(
            "stokes", lambda: jax.jit(lambda re: scatter_matrix(ctx, stokes_elements(ctx, re)))
        )
        A0 = assemble(self.re)
        b = jnp.zeros(ctx.spaces.num_dofs, dtype=A0.dtype)
        if self.f is not None:
            fvec = jnp.asarray(self.f)
            wdet = ctx.w[None, :] * ctx.detJ[:, None]
            r_v = jnp.einsum("cq,qi,d->cid", wdet, ctx.phi_u, fvec)
            nc = r_v.shape[0]
            el = jnp.zeros((nc, ctx.ndofs_el), dtype=A0.dtype)
            el = el.at[:, : ctx.nu_el * ctx.gdim].set(r_v.reshape(nc, -1))
            b = b + scatter_vector(ctx, el)
        for fc, g in self._neumann_ctxs:
            b = b + neumann_velocity_load(fc, ctx, g)
        for fc, h in self._neumann_p_ctxs:
            b = b + neumann_pressure_load(fc, ctx, h)
        b = dirichlet_lift(A0, b, self.bc_mask, self.bc_values)
        A_bc = CSRMatrix(
            ctx.pattern, dirichlet_matrix_data(ctx.pattern, A0.data, self.bc_mask, 1.0)
        )
        return A_bc, b


class StationaryNavierStokesAssembler(_NSBase):
    """Residual + analytic Jacobian of stationary NS
    (parity: ``StationaryNavierStokesAssembler``, ``FEM/operators.py:287-396``).

    ``re`` is a *traced* argument of the jitted residual/Jacobian so a
    Reynolds ramp reuses one compiled executable.
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
        self._robin = [
            (build_facet_context(self.ctx, mesh, m), a, g) for m, a, g in bcs.robin
        ]
        ctx = self.ctx
        outlets = self._outlets
        robin = self._robin
        fvec = self.f

        def _residual(w, re):
            r = scatter_vector(ctx, ns_residual_elements(ctx, w, re, fvec))
            # boundary terms of the residual: for w satisfying Dirichlet
            # data, outlet/robin matrices act on w directly
            for fc in outlets:
                data = viscous_outlet_matrix_data(fc, ctx, 1.0)  # 1/re applied below
                r = r + (1.0 / re) * spmv_data(ctx, data, w)
            for fc, alpha, g in robin:
                data = robin_matrix_data(fc, ctx, alpha)
                r = r + spmv_data(ctx, data, w) + alpha * neumann_velocity_load(fc, ctx, g)
            return r

        def _jacobian_data(w, re):
            data = assemble_jac_elements(w, re)
            for fc in outlets:
                data = data + (1.0 / re) * viscous_outlet_matrix_data(fc, ctx, 1.0)
            for fc, alpha, _ in robin:
                data = data + robin_matrix_data(fc, ctx, alpha)
            return data

        def assemble_jac_elements(w, re):
            from lsafw_tpu.ops.sparse import assemble_csr_data

            return assemble_csr_data(ctx.pattern, linearized_ns_elements(ctx, w, re))

        self.residual = jax.jit(_residual)
        self.jacobian_data = jax.jit(_jacobian_data)

    def jacobian(self, w: jnp.ndarray, re) -> CSRMatrix:
        """Assembled Jacobian with Dirichlet rows/cols eliminated."""
        data = self.jacobian_data(w, re)
        return CSRMatrix(
            self.ctx.pattern,
            dirichlet_matrix_data(self.ctx.pattern, data, self.bc_mask, 1.0),
        )


def spmv_data(ctx: AssemblyContext, data: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """SpMV with raw nnz data on the shared mixed pattern."""
    from lsafw_tpu.ops.sparse import spmv

    return spmv(CSRMatrix(ctx.pattern, data), x)


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
        ctx = self.ctx
        outlets = self._outlets

        def _assemble(w, re, mask):
            from lsafw_tpu.ops.sparse import assemble_csr_data

            data = assemble_csr_data(ctx.pattern, linearized_ns_elements(ctx, w, re))
            for fc in outlets:
                data = data + (1.0 / re) * viscous_outlet_matrix_data(fc, ctx, 1.0)
            return dirichlet_matrix_data(ctx.pattern, data, mask, 1.0)

        if not hasattr(self, "_lin_jit"):
            self._lin_jit = jax.jit(_assemble)
        return CSRMatrix(ctx.pattern, self._lin_jit(self.base_flow, self.re, self.bc_mask))

    def assemble_mass_matrix(self) -> CSRMatrix:
        ctx = self.ctx

        def _assemble(mask, diag):
            from lsafw_tpu.ops.sparse import assemble_csr_data

            data = assemble_csr_data(ctx.pattern, mass_elements(ctx))
            return dirichlet_matrix_data(ctx.pattern, data, mask, diag)

        fn = ctx.jitted("mass_ns", lambda: jax.jit(_assemble))
        return CSRMatrix(ctx.pattern, fn(self.bc_mask, self.mass_diag))

    def assemble_eigensystem(self) -> tuple[CSRMatrix, CSRMatrix]:
        """(A, M) on the shared pattern (``FEM/operators.py:511-527``)."""
        return self.assemble_linear_operator(), self.assemble_mass_matrix()

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
