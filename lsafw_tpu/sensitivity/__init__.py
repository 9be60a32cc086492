"""Adjoint-based eigenvalue sensitivity.

Counterpart of ``Sensitivity/__init__.py``: direct eigenpair near a
target, adjoint (left) eigenpair of (A^H, M^H) at sigma*, baseflow
sensitivity du/dRe from a steady-Jacobian solve, the total derivative
d sigma/d Re = explicit + implicit (base-flow convection) terms, and
the structural-sensitivity "wavemaker" field
Sw(x) = |u_adj(x)| |u(x)| / |<u_adj, u>| (Fabre et al. AMR 2019).

A and M are *real* here, so the Hermitian transpose of the reference's
``_hermitian`` (``Sensitivity/__init__.py:47-57``) is a plain host CSR
transpose, and every sesquilinear scalar form I(conj(a), v) evaluates
as four real batched quadrature sums — pure device einsum work via the
assembly context (no complex dtype needed).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import BoundaryConditions
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    StationaryNavierStokesAssembler,
)
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.direct import SparseLU
from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# Real scalar-form kernels (device): building blocks for sesquilinear forms
# ---------------------------------------------------------------------------


def _u_at_qp(ctx: AssemblyContext, w: np.ndarray) -> jnp.ndarray:
    """(nc, nq, gdim) velocity of a real mixed vector at quadrature points."""
    g = ctx.gdim
    u = jnp.asarray(w)[: ctx.spaces.velocity.num_dofs].reshape(-1, g)
    u_el = u[ctx.cell_nodes_u]
    return jnp.einsum("qi,cid->cqd", ctx.phi_u, u_el)


def _grad_u_at_qp(ctx: AssemblyContext, w: np.ndarray) -> jnp.ndarray:
    """(nc, nq, gdim, gdim) velocity gradient d u_d / d x_e at qps."""
    g = ctx.gdim
    u = jnp.asarray(w)[: ctx.spaces.velocity.num_dofs].reshape(-1, g)
    u_el = u[ctx.cell_nodes_u]
    gu = ctx.phys_grad_u()
    return jnp.einsum("cid,cqie->cqde", u_el, gu)


def grad_inner_integral(ctx: AssemblyContext, w1: np.ndarray, w2: np.ndarray) -> float:
    """integral <grad u1, grad u2> dx for real mixed vectors."""
    g1 = _grad_u_at_qp(ctx, w1)
    g2 = _grad_u_at_qp(ctx, w2)
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    return float(jnp.einsum("cq,cqde,cqde->", wdet, g1, g2))


def convection_integral(ctx: AssemblyContext, wm: np.ndarray, w1: np.ndarray, w2: np.ndarray) -> float:
    """integral <(u_m . grad) u1, u2> dx for real mixed vectors."""
    um = _u_at_qp(ctx, wm)
    g1 = _grad_u_at_qp(ctx, w1)
    u2 = _u_at_qp(ctx, w2)
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    return float(jnp.einsum("cq,cqe,cqde,cqd->", wdet, um, g1, u2))


def velocity_inner_integral(ctx: AssemblyContext, w1: np.ndarray, w2: np.ndarray) -> float:
    """integral <u1, u2> dx."""
    u1 = _u_at_qp(ctx, w1)
    u2 = _u_at_qp(ctx, w2)
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    return float(jnp.einsum("cq,cqd,cqd->", wdet, u1, u2))


def _sesquilinear(real_form, a: np.ndarray, v: np.ndarray, *args) -> complex:
    """Evaluate I(conj(a), v) for a real-bilinear integrand: four real
    evaluations combined as [I(ar,vr)+I(ai,vi)] + i [I(ar,vi)-I(ai,vr)]."""
    ar, ai = np.real(a), np.imag(a)
    vr, vi = np.real(v), np.imag(v)
    re = real_form(*args, ar, vr) + real_form(*args, ai, vi)
    im = real_form(*args, ar, vi) - real_form(*args, ai, vr)
    return complex(re, im)


# ---------------------------------------------------------------------------
# Sensitivity solver (parity: EigenSensitivitySolver, Sensitivity/__init__.py:60)
# ---------------------------------------------------------------------------


class EigenSensitivitySolver:
    """Eigenvalue sensitivity d sigma / d Re via adjoint modes
    (parity: ``EigenSensitivitySolver``, ``Sensitivity/__init__.py:60-445``)."""

    def __init__(
        self,
        ctx: AssemblyContext,
        mesh: Mesh,
        bcs: BoundaryConditions,
        baseflow: np.ndarray,
        re: float,
        *,
        A: CSRMatrix | None = None,
        M: CSRMatrix | None = None,
        perturbation_bcs: BoundaryConditions | None = None,
        target: complex | None = None,
        tol_direct: float = 1e-9,
        tol_adjoint: float = 1e-8,
        tol_baseflow: float = 1e-10,
        max_it: int = 200,
        max_modes: int = 5,
        si_method: str = "lu",
    ) -> None:
        self._ctx = ctx
        self._mesh = mesh
        self._bcs = bcs
        self._pert_bcs = perturbation_bcs or bcs.homogeneous()
        self._baseflow = np.asarray(baseflow)
        self._re = re
        self._target = target
        self._tol_direct = tol_direct
        self._tol_adjoint = tol_adjoint
        self._tol_baseflow = tol_baseflow
        self._max_it = max_it
        self._max_modes = max_modes
        self._si_method = si_method  # "banded" = device band LU path
        if A is None or M is None:
            asm = LinearizedNavierStokesAssembler(
                self._baseflow, ctx, re, self._pert_bcs, mesh
            )
            A, M = asm.assemble_eigensystem()
        self._A, self._M = A, M
        self._sigma: complex | None = None
        self._v: np.ndarray | None = None  # direct eigenvector (complex)
        self._a: np.ndarray | None = None  # adjoint eigenvector (complex)
        self._baseflow_sens: np.ndarray | None = None
        logger.info("Initialized eigenvalue sensitivity solver for Re = %.2f", re)

    # --- direct mode (parity: solve_direct_mode, :158-228) ---
    def solve_direct_mode(self, target: complex | None = None) -> tuple[complex, np.ndarray]:
        target = target if target is not None else self._target
        es = EigenSolver(
            self._A, self._M,
            EigensolverConfig(num_eig=self._max_modes, atol=self._tol_direct, max_it=self._max_it),
        )
        if target is not None:
            es.set_st_type(STType.SINVERT)
            es.set_target(target)
            es.set_st_pc_type(self._si_method)
        pairs = es.solve()
        if not pairs:
            raise RuntimeError("No eigenpairs returned by the eigensolver.")
        if target is not None:
            sigma, v = min(pairs, key=lambda p: abs(p[0] - target))
        else:
            sigma, v = max(pairs, key=lambda p: p[0].real)
        self._sigma, self._v = sigma, v
        logger.info("Direct eigenpair: sigma = %.4e %+.4e j", sigma.real, sigma.imag)
        return sigma, v

    # --- adjoint mode (parity: solve_adjoint_mode, :230-311) ---
    def solve_adjoint_mode(
        self, sigma: complex | None = None, v: np.ndarray | None = None
    ) -> np.ndarray:
        sigma = sigma if sigma is not None else self._sigma
        v = v if v is not None else self._v
        if sigma is None or v is None:
            raise RuntimeError("Direct eigenpair must be computed before adjoint solve.")
        # real matrices: Hermitian transpose == transpose (host CSR)
        # shared transposed pattern keeps the banded/BCSR fast paths
        # available for the adjoint factorization
        from lsafw_tpu.ops.sparse import transpose_pair

        A_H, M_H = transpose_pair(self._A, self._M)
        es = EigenSolver(
            A_H, M_H,
            EigensolverConfig(num_eig=self._max_modes, atol=self._tol_adjoint, max_it=self._max_it),
        )
        es.set_st_type(STType.SINVERT)
        es.set_st_pc_type(self._si_method)
        # conj(sigma) is an *exact* eigenvalue of A^T (same spectrum as A),
        # so shifting exactly there makes the shift-invert factorization
        # singular to machine precision and pollutes the eigenvector.
        # Offset the shift slightly; the wanted mode still dominates the
        # transformed spectrum by orders of magnitude.
        offset = 1e-3 * (1.0 + abs(sigma))
        es.set_target(np.conj(sigma) + offset)
        pairs = es.solve()
        if not pairs:
            raise RuntimeError("No eigenpairs returned by the adjoint eigensolver.")
        sig_adj, a = min(pairs, key=lambda p: abs(p[0] - np.conj(sigma)))
        # bi-orthonormal normalization a^H M v = 1 (:281-287)
        Mv = self._M.to_scipy() @ v
        prod = np.vdot(a, Mv)  # a^H M v
        if prod == 0:
            raise RuntimeError("Bi-orthonormal normalization failed (a^H M v = 0).")
        a = a / np.conj(prod)
        self._a = a
        logger.info("Adjoint eigenpair computed (sigma* = %.4e %+.4e j).", sig_adj.real, sig_adj.imag)
        return a

    # --- baseflow sensitivity (parity: compute_baseflow_sensitivity, :313-352) ---
    def compute_baseflow_sensitivity(self, tol: float | None = None) -> np.ndarray:
        ctx = self._ctx
        asm = StationaryNavierStokesAssembler(ctx, self._mesh, self._bcs)
        J = asm.jacobian(jnp.asarray(self._baseflow), self._re)
        # RHS: -(1/Re^2) <grad u_base, grad v_test> as a linear functional
        # of the velocity test functions
        g = ctx.gdim
        gu_base = _grad_u_at_qp(ctx, self._baseflow)  # (nc, nq, d, e)
        gphi = ctx.phys_grad_u()  # (nc, nq, i, e)
        wdet = ctx.w[None, :] * ctx.detJ[:, None]
        r_v = -(1.0 / self._re**2) * jnp.einsum("cq,cqde,cqie->cid", wdet, gu_base, gphi)
        nc = r_v.shape[0]
        el = jnp.zeros((nc, ctx.ndofs_el), dtype=r_v.dtype)
        el = el.at[:, : ctx.nu_el * g].set(r_v.reshape(nc, -1))
        from lsafw_tpu.fem.assembly import scatter_vector

        rhs = scatter_vector(ctx, el)
        # BC rows: d(bc value)/dRe = 0 -> zero rows (:328-337)
        rhs = jnp.where(jnp.asarray(self._bcs.dirichlet_mask), 0.0, rhs)
        logger.info("Solving baseflow sensitivity linear system (steady Jacobian).")
        sens = SparseLU(J).solve(np.asarray(rhs))
        self._baseflow_sens = sens
        return sens

    # --- total sensitivity (parity: evaluate_sensitivity, :354-385) ---
    def evaluate_sensitivity(
        self,
        re: float | None = None,
        v: np.ndarray | None = None,
        a: np.ndarray | None = None,
        baseflow_sens: np.ndarray | None = None,
    ) -> complex:
        re_val = re if re is not None else self._re
        v = v if v is not None else self._v
        a = a if a is not None else self._a
        s = baseflow_sens if baseflow_sens is not None else self._baseflow_sens
        if v is None or a is None or s is None:
            raise RuntimeError(
                "Direct mode, adjoint mode, and baseflow sensitivity are required "
                "to evaluate d sigma/d Re."
            )
        ctx = self._ctx
        # First-principles sensitivity with F-residual conventions
        # (A = dF/dw, viscous in F is -(1/Re) <grad u, grad v>):
        #   d sigma/dRe = a^H (dA/dRe) v + a^H (dA/dU . u_mu) v
        # explicit: dA/dRe = +(1/Re^2) K  ->  +(1/Re^2) <grad v, grad conj(a)>
        d_exp = (1.0 / re_val**2) * _sesquilinear(
            lambda x, y: grad_inner_integral(ctx, x, y), a, v
        )
        # implicit: dA/dU in direction u_mu applied to v is
        # -[(u_mu . grad) v + (v . grad) u_mu]
        # (the reference's equivalent terms, ``Sensitivity/__init__.py:379-383``,
        # up to UFL's inner-conjugation convention; signs validated against
        # finite differences in tests/benchmark/test_sensitivity.py)
        sr = np.real(s)

        def base_term(x, y):
            # x plays conj(a)-component, y plays v-component
            return convection_integral(ctx, sr, y, x) + convection_integral(ctx, y, sr, x)

        d_base = -_sesquilinear(base_term, a, v)
        return d_exp + d_base

    def evaluate(self, target: complex | None = None) -> complex:
        """Full pipeline (parity: ``evaluate``, :387-402)."""
        self.solve_direct_mode(target=target)
        self.solve_adjoint_mode()
        self.compute_baseflow_sensitivity()
        d_sigma = self.evaluate_sensitivity()
        logger.info("Computed eigenvalue sensitivity: %.4e %+.4e j.", d_sigma.real, d_sigma.imag)
        return d_sigma

    # --- wavemaker (parity: compute_wavemaker, :404-445) ---
    def compute_wavemaker(
        self, *, v: np.ndarray | None = None, a: np.ndarray | None = None
    ) -> np.ndarray:
        v = v if v is not None else self._v
        a = a if a is not None else self._a
        if v is None or a is None:
            raise RuntimeError("Compute direct and adjoint modes before Sw.")
        ctx = self._ctx
        denom = _sesquilinear(lambda x, y: velocity_inner_integral(ctx, x, y), a, v)
        denom_abs = abs(denom)
        if denom_abs == 0.0:
            raise RuntimeError("Denominator <u_adj, u> = 0; normalization issue.")
        # pointwise |u_adj| |u| at quadrature points
        ar, ai = np.real(a), np.imag(a)
        vr, vi = np.real(v), np.imag(v)
        a2 = _u_at_qp(ctx, ar) ** 2 + _u_at_qp(ctx, ai) ** 2
        v2 = _u_at_qp(ctx, vr) ** 2 + _u_at_qp(ctx, vi) ** 2
        Sw_qp = jnp.sqrt(a2.sum(-1)) * jnp.sqrt(v2.sum(-1)) / denom_abs  # (nc, nq)
        # L2-project onto the pressure space: M_p q = (phi_p, Sw) (:117-148)
        from lsafw_tpu.fem.assembly import SpaceContext, mass_scalar
        from lsafw_tpu.solver.linear import cg
        from lsafw_tpu.solver.precond import jacobi
        from lsafw_tpu.ops.sparse import spmv
        import jax

        pctx = SpaceContext.build(ctx.spaces.pressure)
        # use the mixed rule for the RHS (consistent Sw sampling)
        wdet = ctx.w[None, :] * ctx.detJ[:, None]
        rhs_el = jnp.einsum("cq,qk,cq->ck", wdet, ctx.phi_p, Sw_qp)
        from lsafw_tpu.ops.exact import segment_sum_fast

        rhs = segment_sum_fast(
            rhs_el.reshape(-1),
            jnp.asarray(ctx.spaces.pressure.cell_nodes).reshape(-1),
            ctx.spaces.pressure.num_dofs,
        )
        Mp = pctx.scatter(mass_scalar(pctx))
        res = cg(lambda x: spmv(Mp, x), rhs, tol=1e-12, maxiter=2000, M=jacobi(Mp))
        Sw_p = np.asarray(res.x)
        # pack into mixed function: u = 0, p = Sw (:440-445)
        out = np.zeros(ctx.spaces.num_dofs)
        out[ctx.spaces.dofs_p] = Sw_p
        return out
