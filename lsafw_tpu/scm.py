"""Self-consistent mean-flow model (Mantic-Lugo, Arratia & Gallaire 2014).

Predicts the saturated limit cycle — mean flow, oscillation frequency
AND amplitude — WITHOUT time integration, closing the mean-flow story
that RZIF (``examples/meanflow_eigen.py``) opens: the saturated mean is
the flow whose leading eigenvalue is marginal, and the Reynolds stress
that drives it comes from the marginal mode itself.

Unknowns (U, q_hat, A, omega), equations:

  1. mean:   R(U) + A^2 L(q_hat) = 0,
     L_v = -1/2 Re[(u_hat . grad) u_hat*] tested against velocity test
     functions — the phase-averaged Reynolds-stress divergence of the
     first harmonic (for real bilinear N, the mean of N(Re(a e), Re(a e))
     is 1/2 Re N(a, a*), which reduces to the two REAL convection terms
     (u_r . grad) u_r + (u_i . grad) u_i);
  2. mode:   J(U) q_hat = sigma M q_hat, ||u_hat||_E = 1;
  3. closure: sigma_r = 0 selects the amplitude A.

Algorithm: alternate (mean solve with the frozen-mode load) and
(eigensolve about the new mean, warm-started), driving sigma_r(A) to
zero by a guarded secant on A — g(A) is monotonically decreasing from
the Hopf growth rate at A = 0.

Everything reuses the existing stack: the loaded mean solve is the
standard Newton with a constant extra load (Jacobian unchanged), the
eigensolve is the standard shift-invert Krylov-Schur.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext, scatter_vector
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    StationaryNavierStokesAssembler,
)
from lsafw_tpu.solver.newton import NewtonSolver
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class SCMResult:
    amplitude: float
    sigma: complex  # final mean-flow eigenvalue (sigma_r ~ 0)
    mean: np.ndarray
    mode: np.ndarray  # complex, unit energy
    converged: bool
    history: list = field(default_factory=list)  # (A, sigma_r, omega)


class _LoadedAssembler:
    """Stationary assembler + a constant momentum load (the Reynolds
    stress of the frozen harmonic); the Jacobian is untouched."""

    def __init__(self, base: StationaryNavierStokesAssembler, load):
        self._base = base
        self.load = load
        self.bc_mask = base.bc_mask
        self.bcs = base.bcs

    def residual(self, w, re):
        return self._base.residual(w, re) + self.load

    def jacobian(self, w, re):
        return self._base.jacobian(w, re)


class SelfConsistentModel:
    def __init__(
        self,
        ctx: AssemblyContext,
        mesh,
        bcs,
        bcs_pert,
        re: float,
        *,
        linear_solver: str = "lu",
        si_method: str = "lu",
        target: complex | None = None,
        ncv: int = 30,
        atol: float = 1e-8,
    ) -> None:
        self.ctx = ctx
        self.mesh = mesh
        self.bcs = bcs
        self.bcs_pert = bcs_pert
        self.re = float(re)
        self.linear_solver = linear_solver
        self.si_method = si_method
        self.target = target
        self.ncv = ncv
        self.atol = atol
        self._base_asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
        # mass matrix assembled ONCE (state-independent): the energy
        # norm and the eigensystem M of every _eig_about call
        self._Mmat = LinearizedNavierStokesAssembler(
            jnp.zeros(ctx.spaces.num_dofs), ctx, self.re, bcs_pert, mesh
        ).assemble_mass_matrix()
        self._Ms = self._Mmat.to_scipy()

    # ------------------------------------------------------------------
    def unit_load(self, mode: np.ndarray) -> jnp.ndarray:
        """Reynolds-stress load of the UNIT-amplitude harmonic:
        L_v = -1/2 [(u_r.grad)u_r + (u_i.grad)u_i] tested, scattered to
        the mixed vector (zero pressure rows)."""
        from lsafw_tpu.sensitivity import _grad_u_at_qp, _u_at_qp

        ctx = self.ctx
        el = jnp.zeros((ctx.detJ.shape[0], ctx.ndofs_el))
        wdet = ctx.w[None, :] * ctx.detJ[:, None]
        for part in (mode.real, mode.imag):
            uq = _u_at_qp(ctx, part)
            gq = _grad_u_at_qp(ctx, part)
            convq = jnp.einsum("cqe,cqde->cqd", uq, gq)
            r_v = -0.5 * jnp.einsum("cq,qi,cqd->cid", wdet, ctx.phi_u, convq)
            el = el.at[:, : ctx.nu_el * ctx.gdim].add(
                r_v.reshape(r_v.shape[0], -1))
        return scatter_vector(ctx, el)

    def _normalize(self, v: np.ndarray) -> np.ndarray:
        e = np.real(np.vdot(v, self._Ms @ v))
        return v / np.sqrt(e)

    def _eig_about(self, U: np.ndarray, target: complex, v0=None,
                   omega_ref: float | None = None):
        """Leading eigenpair near ``target``; when ``omega_ref`` is
        given, FOLLOW the oscillatory branch: reject modes whose
        frequency left the +-40% band around it (heavily forced means
        can grow spurious steady modes that would hijack a max-real
        selection).  Returns None if the branch is lost."""
        from lsafw_tpu.solver.eigen import (
            EigenSolver, EigensolverConfig, STType,
        )

        asm = LinearizedNavierStokesAssembler(
            jnp.asarray(U), self.ctx, self.re, self.bcs_pert, self.mesh)
        A = asm.assemble_linear_operator()  # M is state-independent
        M = self._Mmat
        es = EigenSolver(A, M, EigensolverConfig(
            num_eig=3, atol=self.atol, ncv=self.ncv))
        es.set_st_type(STType.SINVERT)
        es.set_target(target)
        es.set_st_pc_type(self.si_method)
        if v0 is not None:
            es.set_initial_vector(v0)
        pairs = es.solve()
        if omega_ref is not None:
            band = [p for p in pairs
                    if abs(abs(p[0].imag) - omega_ref) < 0.4 * omega_ref]
            if not band:
                logger.info(
                    "Oscillatory branch not in returned set (omega_ref "
                    "%.3f): eigenvalues %s", omega_ref,
                    np.array2string(np.array([p[0] for p in pairs]),
                                    precision=4))
                return None
            # the branch member with positive frequency, largest growth
            return max(
                ((lam.conjugate(), v.conj()) if lam.imag < 0 else (lam, v)
                 for lam, v in band),
                key=lambda p: p[0].real,
            )
        return max(pairs, key=lambda p: p[0].real)

    def _mean_solve(self, load, U0, tol=1e-9):
        """Returns the mean state or None when Newton fails (a garbage
        'partial result' would poison the following eigensolve).
        Strongly forced means can defeat undamped Newton — retry down
        a damping ladder before giving up."""
        asm = _LoadedAssembler(self._base_asm, jnp.asarray(load))
        for damping in (1.0, 0.5, 0.25):
            newton = NewtonSolver(
                asm, linear_solver=self.linear_solver, damping=damping)
            res = newton.solve(U0, self.re, tol=tol,
                               max_it=40 if damping == 1.0 else 120)
            if res.converged and np.isfinite(res.w).all():
                return res.w
        logger.info("SCM mean solve failed (|F| = %.2e).",
                    res.residual_norm)
        return None

    # ------------------------------------------------------------------
    def solve(
        self,
        baseflow: np.ndarray,
        *,
        A0: float = 0.1,
        tol_sigma: float = 1e-4,
        max_outer: int = 30,
        inner: int = 6,
    ) -> SCMResult:
        """Find (mean, mode, A, omega) with sigma_r = 0.

        ``baseflow``: the (unstable) fixed point to start from.
        ``inner``: max mean<->mode sweeps per amplitude (stops early
        once sigma_r settles; the load is under-relaxed across
        sweeps)."""
        U0 = np.asarray(baseflow)
        sigma, mode = self._eig_about(
            U0, self.target if self.target is not None else 0.05 + 0.75j)
        mode = self._normalize(mode)
        g_hopf, omega = sigma.real, abs(sigma.imag)
        if g_hopf <= 0:
            logger.info("Baseflow already stable (sigma_r = %.3e); A = 0.",
                        g_hopf)
            return SCMResult(0.0, sigma, U0, mode, True,
                             [(0.0, sigma.real, sigma.imag)])
        history = [(0.0, sigma.real, sigma.imag)]

        # Stuart-Landau: g(x), x = A^2, decreases ~linearly from
        # g_hopf.  Phase 1 marches x up (x *= 1.6, warm-started) until
        # g < 0 brackets the root; phase 2 bisects with a secant-
        # accelerated midpoint.  A failed trial (mean Newton diverged /
        # oscillatory branch lost) counts as "x too large": shrink
        # toward the last good x instead of aborting.
        state = (U0, mode, sigma)
        U = U0
        x_good = 0.0  # the x the held state was computed at
        x_lo, g_lo = 0.0, g_hopf
        x_hi = g_hi = None
        x = float(A0) ** 2
        converged = False
        outer = 0
        x_fail_min = np.inf
        while outer < max_outer:
            outer += 1
            trial_ok = True
            Ut, modet, sigmat = state
            load = None
            g_seq = []
            for sweep in range(inner):
                # under-relaxed load: stabilizes the mean<->mode
                # ping-pong that otherwise keeps g noisy in x
                new_load = x * self.unit_load(modet)
                load = (new_load if load is None
                        else 0.3 * load + 0.7 * new_load)
                Um = self._mean_solve(load, Ut)
                if Um is None:
                    trial_ok = False
                    break
                Ut = Um
                pair = self._eig_about(
                    Ut, sigmat.real + 1j * abs(sigmat.imag), v0=modet,
                    omega_ref=omega)
                if pair is None:
                    trial_ok = False
                    break
                sigmat, modet = pair[0], self._normalize(pair[1])
                g_seq.append(sigmat.real)
                if (sweep >= 1
                        and abs(g_seq[-1] - g_seq[-2]) < 0.2 * tol_sigma):
                    break  # self-consistent at this x
            if not trial_ok:
                x_fail_min = min(x_fail_min, x)
                x_new = 0.5 * (x + x_lo)
                logger.info(
                    "SCM outer %d: trial failed at x = %.4f; retrying "
                    "x = %.4f.", outer, x, x_new)
                if abs(x_new - x) < 1e-6 * max(x, 1.0):
                    logger.warning("SCM stalled against a failing x; "
                                   "stopping at the last good state.")
                    break
                x = x_new
                continue
            state = (Ut, modet, sigmat)
            U, mode, sigma = state
            x_good = x
            if x >= x_fail_min:
                x_fail_min = np.inf  # a success above disproves the wall
            g, omega = sigma.real, abs(sigma.imag)
            history.append((float(np.sqrt(x)), sigma.real, sigma.imag))
            logger.info("SCM outer %d: A = %.5f, sigma = %+.5f %+.5f j",
                        outer, np.sqrt(x), sigma.real, sigma.imag)
            if abs(g) < tol_sigma:
                converged = True
                break
            if g > 0:
                x_lo, g_lo = x, g
            else:
                x_hi, g_hi = x, g
            if (x_hi is not None and x_hi - x_lo < 1e-4 * x_hi
                    and abs(g) < 20 * tol_sigma):
                # bracket collapsed onto the inner-sweep noise floor of
                # g: as converged as the alternation can resolve
                converged = True
                break
            if x_hi is None:
                # marching toward the bracket; never blindly overstep
                # the Stuart-Landau root estimate (g ~ linear in x)
                x_next = min(1.6 * x, 0.5 * (x + x_fail_min))
                if g < g_hopf:  # slope information available
                    x_star = x * g_hopf / max(g_hopf - g, 1e-14)
                    x_next = min(x_next, 1.15 * x_star)
                x = max(x_next, 1.02 * x)
            else:
                # secant-accelerated bisection inside [x_lo, x_hi]
                x_sec = x_lo - g_lo * (x_hi - x_lo) / (g_hi - g_lo)
                x_mid = 0.5 * (x_lo + x_hi)
                x = x_sec if x_lo < x_sec < x_hi else x_mid
        # report the amplitude of the state actually HELD (x may be a
        # pending trial value after a failure or max_outer exhaustion)
        return SCMResult(float(np.sqrt(x_good)), sigma, U, mode, converged,
                         history)
