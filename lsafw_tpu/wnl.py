"""Weakly nonlinear (Stuart-Landau) expansion about the Hopf point.

Sipp & Lebedev (2007) / Chomaz (2005): from the critical fixed point
ALONE — baseflow at Re_c, the marginal eigenpair, its adjoint, and two
forced linear solves — predict the entire weakly supercritical branch:

  dA/dt = lambda'(Re - Re_c) A - mu |A|^2 A,

so amplitude A(Re) = 2 sqrt(Re(lambda)/Re(mu)) (global-energy norm, the
convention of :mod:`lsafw_tpu.scm`) and limit-cycle frequency
omega(Re) = omega_c + Im(lambda) - Im(mu) |A_wnl|^2.  This closes the
mean-flow triangle: WNL (a priori, from the fixed point), SCM (nonlinear
marginality), and DNS (time integration) must agree near onset.

Derivation in the code's conventions (dynamics ``M dv/dt = A v +
B(v, v)`` with ``A`` the linearized operator about the critical base
and ``B(a, b) = -1/2[(a.grad)b + (b.grad)a]`` tested — the symmetric
bilinear convection, so ``B(v, v) = -(v.grad)v``):

  order e^2, mean:      q20 = -A^{-1} 2 B(q1, q1*)
  order e^2, harmonic:  q22 = -(A - 2 i omega M)^{-1} B(q1, q1)
  order e^3, resonance: mu  = -2 a^H [ B(q1, q20) + B(q1*, q22) ]

with q1 the direct mode at unit global energy, a the adjoint mode
normalized a^H M q1 = 1 (both from
:class:`lsafw_tpu.sensitivity.EigenSensitivitySolver`, which also
supplies the TOTAL eigenvalue slope lambda' = d sigma/d Re along the
baseflow branch — this absorbs the order-e^2 delta-Re mean correction
of the two-parameter expansion).

The two forced solves are host sparse LU on the assembled operator
(one real, one complex at shift 2 i omega) — a one-off analysis, not an
inner loop.  All physics validated against the self-consistent model
and DNS on the cylinder (``tests/benchmark/test_wnl.py``,
``examples/wnl_landau.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext, scatter_vector
from lsafw_tpu.sensitivity import (
    EigenSensitivitySolver,
    _grad_u_at_qp,
    _u_at_qp,
)
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def convective_bilinear_load(
    ctx: AssemblyContext, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """B(a, b) = -1/2 [(a.grad)b + (b.grad)a] tested against velocity
    test functions, scattered to the mixed vector (zero pressure rows).

    Complex inputs combine the four real evaluations by bilinearity.
    ``B(q, q*)`` is real and equals ``2 * SelfConsistentModel.unit_load``;
    ``B(v, v) = -(v.grad)v`` is the quadratic convection residual."""
    a = np.asarray(a)
    b = np.asarray(b)
    if np.iscomplexobj(a) or np.iscomplexobj(b):
        ar, ai = a.real, a.imag
        br, bi = b.real, b.imag
        re = convective_bilinear_load(ctx, ar, br) - convective_bilinear_load(
            ctx, ai, bi)
        im = convective_bilinear_load(ctx, ar, bi) + convective_bilinear_load(
            ctx, ai, br)
        return re + 1j * im

    uqa = _u_at_qp(ctx, a)
    gqa = _grad_u_at_qp(ctx, a)
    uqb = _u_at_qp(ctx, b)
    gqb = _grad_u_at_qp(ctx, b)
    convq = 0.5 * (
        jnp.einsum("cqe,cqde->cqd", uqa, gqb)
        + jnp.einsum("cqe,cqde->cqd", uqb, gqa)
    )
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    r_v = -jnp.einsum("cq,qi,cqd->cid", wdet, ctx.phi_u, convq)
    el = jnp.zeros((ctx.detJ.shape[0], ctx.ndofs_el))
    el = el.at[:, : ctx.nu_el * ctx.gdim].set(r_v.reshape(r_v.shape[0], -1))
    return np.asarray(scatter_vector(ctx, el))


@dataclass
class WNLResult:
    """Stuart-Landau model coefficients and predictors."""

    re_c: float
    omega_c: float
    lambda_p: complex  # total d sigma / d Re at criticality
    mu: complex  # Landau coefficient (Re(mu) > 0: supercritical)
    q1: np.ndarray  # marginal mode, unit global energy
    q20: np.ndarray  # mean-flow correction field (per |A_wnl|^2)
    q22: np.ndarray  # second-harmonic field (per A_wnl^2)
    baseflow: np.ndarray = field(repr=False, default=None)

    def x_wnl(self, re: float) -> float:
        """|A_wnl|^2 of the expansion variable at ``re`` (0 below onset)."""
        lam_r = self.lambda_p.real * (re - self.re_c)
        return max(lam_r / self.mu.real, 0.0)

    def amplitude(self, re: float) -> float:
        """Saturated amplitude in the global-energy convention of
        :class:`lsafw_tpu.scm.SelfConsistentModel` (A_scm = 2 A_wnl:
        the SCM forcing A^2/2 B(q1,q1*) matches the expansion's
        2|A_wnl|^2 B(q1,q1*))."""
        return 2.0 * float(np.sqrt(self.x_wnl(re)))

    def frequency(self, re: float) -> float:
        """Saturated limit-cycle frequency at ``re``."""
        return (self.omega_c
                + self.lambda_p.imag * (re - self.re_c)
                - self.mu.imag * self.x_wnl(re))

    def mean_flow(self, re: float, baseflow_sens: np.ndarray | None = None
                  ) -> np.ndarray:
        """Predicted saturated MEAN flow at ``re``: critical base +
        amplitude-squared distortion (+ the Re drift when the baseflow
        sensitivity dU/dRe is supplied)."""
        U = self.baseflow + self.x_wnl(re) * self.q20
        if baseflow_sens is not None:
            U = U + (re - self.re_c) * np.asarray(baseflow_sens)
        return U


def weakly_nonlinear(
    ctx: AssemblyContext,
    mesh,
    bcs,
    bcs_pert,
    re_c: float,
    baseflow: np.ndarray,
    *,
    target: complex | None = None,
    si_method: str = "lu",
) -> WNLResult:
    """Compute the Stuart-Landau coefficients at the Hopf point.

    ``re_c``/``baseflow``: the critical Reynolds number and its fixed
    point (find them with :func:`find_critical_re`).  ``target``: shift
    for the marginal eigenpair (default 0 + 0.75j, the cylinder band).
    """
    import scipy.sparse.linalg as spla

    sens = EigenSensitivitySolver(
        ctx, mesh, bcs, baseflow, re_c,
        perturbation_bcs=bcs_pert,
        target=target if target is not None else 0.0 + 0.75j,
        si_method=si_method,
    )
    sigma, v = sens.solve_direct_mode()
    if sigma.imag < 0:  # fix the +omega branch before the adjoint
        sigma, v = sigma.conjugate(), v.conj()
    Ms = sens._M.to_scipy()
    energy = float(np.real(np.vdot(v, Ms @ v)))
    q1 = v / np.sqrt(energy)
    a = sens.solve_adjoint_mode(sigma, q1)  # a^H M q1 = 1
    # pass (q1, a) explicitly: the +omega branch may be the conjugate
    # of what solve_direct_mode stored
    lambda_p = complex(sens.evaluate_sensitivity(
        v=q1, a=a, baseflow_sens=sens.compute_baseflow_sensitivity()))
    omega_c = float(sigma.imag)
    if abs(sigma.real) > 0.2 * abs(lambda_p.real):
        logger.warning(
            "WNL expansion point is not marginal (sigma_r = %.3e vs "
            "lambda'_r = %.3e): Re_c is off by ~%.2f.",
            sigma.real, lambda_p.real, sigma.real / lambda_p.real)

    As = sens._A.to_scipy()
    mask_p = np.asarray(bcs_pert.dirichlet_mask, dtype=bool)

    # order e^2: mean distortion (real solve on the marginal operator —
    # nonsingular: 0 is not an eigenvalue at a Hopf point)
    rhs20 = 2.0 * np.real(convective_bilinear_load(ctx, q1, q1.conj()))
    rhs20[mask_p] = 0.0
    q20 = -spla.splu(As.tocsc()).solve(rhs20)

    # order e^2: second harmonic (complex solve at shift 2 i omega —
    # nonsingular unless 2 i omega is itself an eigenvalue, i.e. a
    # 1:2 resonance, which generic Hopf points do not have)
    rhs22 = convective_bilinear_load(ctx, q1, q1)
    rhs22[mask_p] = 0.0
    K22 = (As.astype(complex) - 2j * omega_c * Ms.astype(complex)).tocsc()
    q22 = -spla.splu(K22).solve(rhs22)

    # order e^3 resonance: project the slow forcing on the adjoint
    f31 = (convective_bilinear_load(ctx, q1, q20)
           + convective_bilinear_load(ctx, q1.conj(), q22))
    mu = complex(-2.0 * np.vdot(a, f31))
    logger.info(
        "WNL at Re_c = %.3f: omega_c = %.5f, lambda' = %+.4e %+.4e j, "
        "mu = %+.4e %+.4e j (%s bifurcation)",
        re_c, omega_c, lambda_p.real, lambda_p.imag, mu.real, mu.imag,
        "supercritical" if mu.real > 0 else "SUBCRITICAL")
    return WNLResult(re_c, omega_c, lambda_p, mu, q1, q20, q22,
                     baseflow=np.asarray(baseflow))


def find_critical_re(
    ctx: AssemblyContext,
    mesh,
    bcs,
    bcs_pert,
    re_lo: float,
    re_hi: float,
    *,
    target: complex | None = None,
    tol: float = 1e-3,
    max_it: int = 12,
    linear_solver: str = "lu",
    si_method: str = "lu",
) -> tuple[float, np.ndarray, complex]:
    """Locate the Hopf point by a secant on sigma_r(Re).

    ``[re_lo, re_hi]`` must bracket the onset (sigma_r changes sign).
    Returns (Re_c, baseflow at Re_c, marginal sigma).  Each iteration is
    one baseflow Newton (warm-started along the branch) plus one
    eigensolve."""
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType

    tgt = target if target is not None else 0.0 + 0.75j
    w = None
    v0 = None

    def sigma_at(re: float):
        nonlocal w, v0
        if w is None:
            w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=re).solve(
                ramp=True, steps=4, tol=1e-10, max_it=40,
                linear_solver=linear_solver))
        else:  # warm start along the branch
            from lsafw_tpu.solver.newton import NewtonSolver
            from lsafw_tpu.models.navier_stokes import (
                StationaryNavierStokesAssembler,
            )
            res = NewtonSolver(
                StationaryNavierStokesAssembler(ctx, mesh, bcs),
                linear_solver=linear_solver,
            ).solve(w, re, tol=1e-10, max_it=30)
            w = np.asarray(res.w)
        asm = LinearizedNavierStokesAssembler(
            jnp.asarray(w), ctx, re, bcs_pert, mesh)
        A, M = asm.assemble_eigensystem()
        es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-9))
        es.set_st_type(STType.SINVERT)
        es.set_target(tgt)
        es.set_st_pc_type(si_method)
        if v0 is not None:
            es.set_initial_vector(v0)
        pairs = es.solve()
        sigma, v = max(
            ((lam.conjugate(), vv.conj()) if lam.imag < 0 else (lam, vv)
             for lam, vv in pairs),
            key=lambda p: p[0].real)
        v0 = v
        return sigma

    r0, r1 = float(re_lo), float(re_hi)
    s0 = sigma_at(r0)
    s1 = sigma_at(r1)
    if s0.real * s1.real > 0:
        raise ValueError(
            f"[{re_lo}, {re_hi}] does not bracket the onset: "
            f"sigma_r = {s0.real:.3e}, {s1.real:.3e}")
    for _ in range(max_it):
        r2 = r1 - s1.real * (r1 - r0) / (s1.real - s0.real)
        s2 = sigma_at(r2)
        logger.info("find_critical_re: Re = %.4f, sigma_r = %+.3e",
                    r2, s2.real)
        r0, s0, r1, s1 = r1, s1, r2, s2
        if abs(s1.real) < tol * max(abs(s1.imag), 1e-3):
            break
    return r1, w, s1
