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

Robustness stack for strongly supercritical Re (each layer engages
when the previous fails):
  1. damping ladder + LOAD-fraction continuation in the frozen-load
     mean Newton;
  2. the COUPLED relaxation (:meth:`SelfConsistentModel._coupled_relax`)
     — a few damped Newton steps interleaved with mode refreshes, which
     passes the FOLD of the frozen-mode forced-mean branch (where the
     frozen-load equation has no solution at all, the alternation of
     Mantic-Lugo et al. taken at the sub-Newton scale);
  3. Re-continuation (:func:`scm_continuation`) — warm-start each Re
     from the previous converged (mean, mode, sigma) with A^2
     extrapolated along the curve;
  4. wall acceptance — if a residual Newton wall still pins the march
     inside the alternation's noise floor of marginality, the held
     state is reported converged at that floor;
  5. the fully COUPLED Newton (:meth:`SelfConsistentModel.solve_coupled`)
     — one monolithic Newton on (U, q, omega) with the amplitude
     absorbed into ||q||_E and marginality (sigma_r = 0) hardwired,
     i.e. the first-harmonic harmonic-balance system.  Quadratic
     convergence where the alternation can only wall-limit; every
     coupling block is the ONE convective-linearization matrix C(b)
     (:func:`lsafw_tpu.models.navier_stokes.convective_linearization_data`)
     evaluated at q_r / q_i, by the symmetry of the convection form.

Everything reuses the existing stack: the loaded mean solve is the
standard Newton with a constant extra load (Jacobian unchanged), the
eigensolve is the standard shift-invert Krylov-Schur.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import jax
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
    # Stuart-Landau zero-crossing extrapolation of the amplitude when
    # the march is wall-limited below marginality (g(A^2) is ~linear;
    # the forced-mean fold blocks reaching the root itself) — None
    # when the root was actually reached
    amplitude_sl: float | None = None
    # second-harmonic field (solve_coupled with harmonics=2 only)
    q2: np.ndarray | None = None


@partial(jax.jit, static_argnames=("tol", "max_its", "m"))
def _bordered_gcr(K0, blu, c, r, f, g, Jop=None, *, tol: float,
                  max_its: int = 400, m: int = 16):
    """GCR(m) on the FULL bordered system [[K0, c], [r^T, 0]] with the
    f32 banded factor of K0 (border passed through) as preconditioner.

    K0 is nearly singular at the converged marginal point (that is why
    the system is bordered), so Schur bordering through K0^-1 is
    ill-conditioned; iterating on the full system instead keeps the
    border's regularization in every step — the banded PC's ~2-dim
    weak subspace (the marginal complex pair) costs GCR a couple of
    extra directions, nothing more.  Device counterpart of the
    reference-style host splu of the bordered matrix."""
    from lsafw_tpu.ops.dots import ddot
    from lsafw_tpu.ops.sparse import spmv
    from lsafw_tpu.solver.linear import SolveResult

    def kmv(x, y):
        Kx = (Jop.matvec(x) if Jop is not None else spmv(K0, x)) + c * y
        return Kx, ddot(r, x)

    def psolve(u, s):
        if hasattr(blu, "solve_vec"):
            return blu.solve_vec(u), s
        ur, _ = blu.solve_pair(u, jnp.zeros_like(u))
        return ur, s

    bnorm = jnp.maximum(jnp.sqrt(ddot(f, f) + g * g), 1e-300)
    x, y = psolve(f, g)
    Kx, kx = kmv(x, y)
    rr, rs = f - Kx, g - kx
    n = f.shape[0]
    D = jnp.zeros((m, n))
    Ds = jnp.zeros((m,))
    CD = jnp.zeros((m, n))
    CDs = jnp.zeros((m,))

    def cond(st):
        _, _, rr, rs, *_, k = st
        rn = jnp.sqrt(ddot(rr, rr) + rs * rs)
        return jnp.isfinite(rn) & (rn > tol * bnorm) & (k < max_its)

    def body(st):
        x, y, rr, rs, D, Ds, CD, CDs, k = st
        d, ds = psolve(rr, rs)
        Cd, cds = kmv(d, ds)
        beta = CD @ Cd + CDs * cds
        Cd = Cd - CD.T @ beta
        cds = cds - CDs @ beta
        d = d - D.T @ beta
        ds = ds - Ds @ beta
        nrm = jnp.maximum(jnp.sqrt(ddot(Cd, Cd) + cds * cds), 1e-300)
        d, ds, Cd, cds = d / nrm, ds / nrm, Cd / nrm, cds / nrm
        alpha = ddot(Cd, rr) + cds * rs
        x = x + alpha * d
        y = y + alpha * ds
        rr = rr - alpha * Cd
        rs = rs - alpha * cds
        slot = jnp.mod(k, m)
        D = jax.lax.dynamic_update_index_in_dim(D, d, slot, 0)
        Ds = Ds.at[slot].set(ds)
        CD = jax.lax.dynamic_update_index_in_dim(CD, Cd, slot, 0)
        CDs = CDs.at[slot].set(cds)
        return x, y, rr, rs, D, Ds, CD, CDs, k + 1

    x, y, rr, rs, *_, k = jax.lax.while_loop(
        cond, body, (x, y, rr, rs, D, Ds, CD, CDs, jnp.int32(0)))
    res = jnp.sqrt(ddot(rr, rr) + rs * rs) / bnorm
    return SolveResult(jnp.concatenate([x, y[None]]), k, res, res <= tol)


def _scm_device_gate() -> bool:
    env = os.environ.get("LSAFW_SCM_DEVICE")
    if env is not None:
        return env not in ("0", "false", "no")
    return jax.default_backend() == "tpu"


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
        mass=None,
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
        # norm and the eigensystem M of every _eig_about call.  A
        # Re-continuation sweep passes the previous model's matrix in.
        self._Mmat = mass if mass is not None else (
            LinearizedNavierStokesAssembler(
                jnp.zeros(ctx.spaces.num_dofs), ctx, self.re, bcs_pert, mesh
            ).assemble_mass_matrix())
        self._Ms = self._Mmat.to_scipy()
        # device bordered-solve cache (pattern, band plan, BCSR op plan)
        self._bord_cache: dict | None = None

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
        a damping ladder, then by LOAD continuation (ramp the Reynolds
        stress up in fractions, warm-starting each rung: the strongly
        supercritical regime where the full load sits outside the
        Newton basin, Mantic-Lugo et al. 2014 §IV)."""
        load = jnp.asarray(load)
        asm = _LoadedAssembler(self._base_asm, load)
        for damping in (1.0, 0.5, 0.25):
            newton = NewtonSolver(
                asm, linear_solver=self.linear_solver, damping=damping)
            res = newton.solve(U0, self.re, tol=tol,
                               max_it=40 if damping == 1.0 else 120)
            if res.converged and np.isfinite(res.w).all():
                return res.w
        logger.info("SCM mean damping ladder failed (|F| = %.2e); "
                    "trying load continuation.", res.residual_norm)
        w = U0
        for frac in (0.25, 0.5, 0.75, 1.0):
            asm_f = _LoadedAssembler(self._base_asm, frac * load)
            newton = NewtonSolver(
                asm_f, linear_solver=self.linear_solver, damping=0.5)
            res = newton.solve(w, self.re, tol=tol, max_it=120)
            if not (res.converged and np.isfinite(res.w).all()):
                logger.info("SCM load continuation failed at fraction "
                            "%.2f (|F| = %.2e).", frac, res.residual_norm)
                return None
            w = res.w
        return w

    def _coupled_relax(self, x, Ut, modet, sigmat, omega,
                       *, sweeps: int = 80, tol: float = 1e-8):
        """Interleaved damped-Newton / mode-refresh relaxation for
        amplitudes past the FOLD of the frozen-mode forced-mean branch.

        At strongly supercritical Re the forced-mean equation with a
        FROZEN Reynolds-stress load loses its solution branch (a
        saddle-node in the load amplitude) below the marginal
        amplitude — no damping ladder or load continuation can solve a
        system with no solution.  The coupled system is still solvable
        because the mode weakens as the mean distorts; this relaxation
        approximates it without bordered algebra: take a FEW damped
        Newton steps on the current load, refresh (mode, sigma) about
        the new mean, rebuild the load, repeat — the alternation of
        Mantic-Lugo et al. 2014 taken at the sub-Newton scale.
        Returns (U, mode, sigma) or None."""
        load = None
        scale = None
        res_hist = []
        for sweep in range(sweeps):
            new_load = x * self.unit_load(modet)
            # heavy load under-relaxation: the alternation's
            # instability near/above the root is load overcorrection
            load = new_load if load is None else 0.7 * load + 0.3 * new_load
            if scale is None:
                scale = max(float(jnp.linalg.norm(new_load)), 1e-30)
            asm = _LoadedAssembler(self._base_asm, jnp.asarray(load))
            newton = NewtonSolver(
                asm, linear_solver=self.linear_solver, damping=0.4)
            res = newton.solve(Ut, self.re, tol=tol, max_it=2)
            if not np.isfinite(res.w).all():
                return None
            Ut = res.w
            pair = self._eig_about(
                Ut, sigmat.real + 1j * abs(sigmat.imag), v0=modet,
                omega_ref=omega)
            if pair is None:
                return None
            sigmat, modet = pair[0], self._normalize(pair[1])
            res_hist.append(float(res.residual_norm))
            # settled: the forced residual is small ON THE SCALE OF THE
            # LOAD with the load built from the CURRENT mode — the
            # coupled state exists here, so the frozen-load Newton now
            # has a solution; the POLISH supplies the final accuracy,
            # the threshold only needs to reach its basin
            if res.converged or res_hist[-1] < 1e-4 * scale:
                return self._relax_polish(
                    Ut, modet, sigmat, omega, new_load, sweep, res_hist)
            # diverging: residual grew far above its best, past the
            # initial transient
            if sweep >= 5 and res_hist[-1] > 30.0 * min(res_hist):
                logger.info(
                    "SCM coupled relaxation diverged (|F| = %.2e).",
                    res_hist[-1])
                return None
            # plateaued far from the target: stop burning sweeps
            if (sweep >= 20 and res_hist[-1] > 1e-3 * scale
                    and res_hist[-1] > 0.5 * res_hist[-10]):
                logger.info(
                    "SCM coupled relaxation plateaued (|F| = %.2e of "
                    "scale %.2e).", res_hist[-1], scale)
                return None
        if res_hist[-1] < 1e-2 * scale:
            # out of sweeps but close: let the polish try to finish
            return self._relax_polish(
                Ut, modet, sigmat, omega, x * self.unit_load(modet),
                sweeps - 1, res_hist)
        logger.info("SCM coupled relaxation did not settle in %d sweeps "
                    "(|F| = %.2e of scale %.2e).", sweeps, res_hist[-1],
                    scale)
        return None

    def _relax_polish(self, Ut, modet, sigmat, omega, load, sweep,
                      res_hist):
        """Final full Newton at the settled load + eigensolve refresh
        (the relaxation's exit path — direct-quality end state)."""
        Um = self._mean_solve(load, Ut)
        if Um is not None:
            Ut = Um
            pair = self._eig_about(
                Ut, sigmat.real + 1j * abs(sigmat.imag), v0=modet,
                omega_ref=omega)
            if pair is None:
                return None
            sigmat, modet = pair[0], self._normalize(pair[1])
        logger.info(
            "SCM coupled relaxation settled in %d sweeps (|F| = %.2e%s).",
            sweep + 1, res_hist[-1], ", polished" if Um is not None else "")
        return Ut, modet, sigmat

    # ------------------------------------------------------------------
    # Fully coupled (harmonic-balance) Newton
    # ------------------------------------------------------------------
    def _convective_matrix(self, b: np.ndarray):
        """C(b) as scipy CSR (unmasked; see
        ``convective_linearization_data``)."""
        from lsafw_tpu.models.navier_stokes import (
            convective_linearization_data,
        )
        from lsafw_tpu.ops.sparse import CSRMatrix

        data = convective_linearization_data(self.ctx, jnp.asarray(b))
        return CSRMatrix(self.ctx.pattern, data).to_scipy()

    def _linearized_scipy(self, U: np.ndarray):
        asm = LinearizedNavierStokesAssembler(
            jnp.asarray(U), self.ctx, self.re, self.bcs_pert, self.mesh)
        return asm.assemble_linear_operator().to_scipy()

    def _coupled_residual(self, U, qr, qi, om, Aop, avec, bvec,
                          mask_m, mask_p):
        """Residual of the coupled system F(U, q, omega):

          F1 = R(U) - 1/2 [(q_r.grad)q_r + (q_i.grad)q_i].v   (mean)
          F2 = (A(U) - i omega M) q                           (mode)
          F3 = Im <q_ref, q>_M                                (phase)

        with the BC-row masking convention of :class:`NewtonSolver`
        (rows zeroed; the Jacobian's identity rows keep the deltas
        zero there)."""
        load = np.asarray(self.unit_load(qr + 1j * qi))
        F1 = np.where(mask_m, 0.0, np.asarray(
            self._base_asm.residual(jnp.asarray(U), self.re)) + load)
        Ms = self._Ms
        F2r = np.where(mask_p, 0.0, Aop @ qr + om * (Ms @ qi))
        F2i = np.where(mask_p, 0.0, Aop @ qi - om * (Ms @ qr))
        F3 = float(avec @ qi - bvec @ qr)
        return np.concatenate([F1, F2r, F2i, [F3]])

    def _coupled_matrix(self, U, qr, qi, om, Aop, avec, bvec, zm, zp):
        """Bordered Jacobian of ``_coupled_residual`` (scipy CSC).

        Layout (rows F1/F2r/F2i/F3 x cols U/q_r/q_i/omega):

          [ J_mean(U)   1/2 Zm C(q_r)  1/2 Zm C(q_i)   0      ]
          [ Zp C(q_r)   A(U)           omega M         M q_i  ]
          [ Zp C(q_i)  -omega M        A(U)           -M q_r  ]
          [ 0          -(M^T q_ref_i)  (M^T q_ref_r)    0      ]

        J_mean/A carry identity Dirichlet rows from their assemblers;
        the coupling blocks get their equation's rows zeroed (Zm/Zp).
        Their BC *columns* stay — harmless, as those deltas are pinned
        to zero by the identity rows + zero residuals."""
        import scipy.sparse as sp

        Ms = self._Ms
        Jm = self._base_asm.jacobian(jnp.asarray(U), self.re).to_scipy()
        Cr = self._convective_matrix(qr)
        Ci = self._convective_matrix(qi)
        col_r = sp.csr_matrix((Ms @ qi)[:, None])
        col_i = sp.csr_matrix((-(Ms @ qr))[:, None])
        return sp.bmat(
            [
                [Jm, 0.5 * (zm @ Cr), 0.5 * (zm @ Ci), None],
                [zp @ Cr, Aop, om * Ms, col_r],
                [zp @ Ci, -om * Ms, Aop, col_i],
                [None, sp.csr_matrix(-bvec[None, :]),
                 sp.csr_matrix(avec[None, :]), None],
            ],
            format="csc",
        )

    # -- second-harmonic balance (HB2) ---------------------------------
    # Physical ansatz (same convention as HB1 / the alternation):
    #   v = Re(q1 e^{i w t}) + Re(q2 e^{2 i w t}),  U the true time-mean.
    # Collecting harmonics of M dv/dt = R(U) + C(U) v + B(v, v):
    #   F0 = R(U) + 1/2 B(q1,q1*) + 1/2 B(q2,q2*)          (mean)
    #   F1 = (A(U) - i w M) q1 + B(q1*, q2)                (E^1)
    #   F2 = (A(U) - 2 i w M) q2 + 1/2 B(q1, q1)           (E^2)
    #   F3 = Im <q_ref, q1>_M                              (phase)
    # where B(a,b) = -1/2[(a.grad)b + (b.grad)a] tested and every
    # Jacobian coupling block is 1/2 C(.) by d B(a,x)/dx = 1/2 C(a).

    def _hb2_residual(self, U, q1, q2, om, Aop, avec, bvec,
                      mask_m, mask_p):
        from lsafw_tpu.wnl import convective_bilinear_load as B

        ctx, Ms = self.ctx, self._Ms
        F0 = np.where(mask_m, 0.0, np.asarray(
            self._base_asm.residual(jnp.asarray(U), self.re))
            + 0.5 * np.real(B(ctx, q1, q1.conj()))
            + 0.5 * np.real(B(ctx, q2, q2.conj())))
        F1 = Aop @ q1 - 1j * om * (Ms @ q1) + B(ctx, q1.conj(), q2)
        F2 = Aop @ q2 - 2j * om * (Ms @ q2) + 0.5 * B(ctx, q1, q1)
        F1 = np.where(mask_p, 0.0, F1)
        F2 = np.where(mask_p, 0.0, F2)
        F3 = float(avec @ q1.imag - bvec @ q1.real)
        return np.concatenate([
            F0, F1.real, F1.imag, F2.real, F2.imag, [F3]])

    def _hb2_matrix(self, U, q1, q2, om, Aop, avec, bvec, zm, zp):
        """Bordered HB2 Jacobian (scipy CSC), block order
        (U, q1r, q1i, q2r, q2i, omega)."""
        import scipy.sparse as sp

        Ms = self._Ms
        Jm = self._base_asm.jacobian(jnp.asarray(U), self.re).to_scipy()
        C1r = self._convective_matrix(q1.real)
        C1i = self._convective_matrix(q1.imag)
        C2r = self._convective_matrix(q2.real)
        C2i = self._convective_matrix(q2.imag)
        wM = om * Ms
        col1r = sp.csr_matrix((Ms @ q1.imag)[:, None])
        col1i = sp.csr_matrix((-(Ms @ q1.real))[:, None])
        col2r = sp.csr_matrix((2.0 * (Ms @ q2.imag))[:, None])
        col2i = sp.csr_matrix((-2.0 * (Ms @ q2.real))[:, None])
        h = 0.5
        return sp.bmat(
            [
                # F0: mean
                [Jm, h * (zm @ C1r), h * (zm @ C1i),
                 h * (zm @ C2r), h * (zm @ C2i), None],
                # F1r = A q1r + w M q1i + Re B(q1*, q2)
                [zp @ C1r, Aop + h * (zp @ C2r), wM + h * (zp @ C2i),
                 h * (zp @ C1r), h * (zp @ C1i), col1r],
                # F1i = A q1i - w M q1r + Im B(q1*, q2)
                [zp @ C1i, -wM + h * (zp @ C2i), Aop - h * (zp @ C2r),
                 -h * (zp @ C1i), h * (zp @ C1r), col1i],
                # F2r = A q2r + 2w M q2i + 1/2 Re B(q1, q1)
                [zp @ C2r, h * (zp @ C1r), -h * (zp @ C1i),
                 Aop, 2.0 * wM, col2r],
                # F2i = A q2i - 2w M q2r + 1/2 Im B(q1, q1)
                [zp @ C2i, h * (zp @ C1i), h * (zp @ C1r),
                 -2.0 * wM, Aop, col2i],
                [None, sp.csr_matrix(-bvec[None, :]),
                 sp.csr_matrix(avec[None, :]), None, None, None],
            ],
            format="csc",
        )

    def _bordered_solve(self, K, F) -> np.ndarray:
        """Solve the bordered coupled-Newton system K dz = F.

        Device path (default on TPU; force with LSAFW_SCM_DEVICE=1):
        banded f32 device factorization of the principal block K0 (its
        pattern, RCM band plan and BCSR matvec plan are built once and
        reused every Newton iteration — refactorization is one scatter
        + the factor scan) driving :func:`_bordered_gcr` on the full
        system.  Host scipy splu otherwise, and as the degradation
        fallback (the reference's MUMPS -> SuperLU chain)."""
        import scipy.sparse.linalg as spla

        if _scm_device_gate():
            from lsafw_tpu.ops.bcsr import operator_for_budget
            from lsafw_tpu.ops.sparse import CSRMatrix
            from lsafw_tpu.solver.band import factor_auto, plan_for_csr

            K0 = K[:-1, :-1].tocsr()
            K0.sort_indices()
            c = np.asarray(K[:-1, -1].todense()).ravel()
            r = np.asarray(K[-1, :-1].todense()).ravel()
            cache = self._bord_cache
            if cache is None or not np.array_equal(
                    cache["indices"], K0.indices):
                K0m = CSRMatrix.from_scipy(K0)
                plan = plan_for_csr(K0m, real=True)
                cache = self._bord_cache = {
                    "indices": K0.indices.copy(),
                    "pattern": K0m.pattern,
                    "plan": plan,
                }
            K0m = CSRMatrix(cache["pattern"], jnp.asarray(K0.data))
            # block refill rides the plan cached on the stable pattern
            Jop = operator_for_budget(K0m)
            blu, _ = factor_auto(cache["plan"], K0m.data,
                                 diag_slots=K0m.pattern.diag_slots)
            res = _bordered_gcr(
                K0m, blu, jnp.asarray(c), jnp.asarray(r),
                jnp.asarray(F[:-1]), jnp.asarray(float(F[-1])), Jop,
                tol=1e-11)
            dz = np.asarray(res.x)
            if bool(res.converged) and np.isfinite(dz).all():
                return dz
            if float(res.residual) < 1e-8 and np.isfinite(dz).all():
                logger.info("Accepting inexact device bordered solve "
                            "(rel res %.1e).", float(res.residual))
                return dz
            logger.warning(
                "Device bordered GCR stalled (rel res %.2e); degrading "
                "to host splu for this step.", float(res.residual))
        return spla.splu(K).solve(F)

    def solve_coupled(
        self,
        U0: np.ndarray,
        q0: np.ndarray,
        omega0: float,
        *,
        tol: float = 1e-8,
        max_it: int = 25,
        harmonics: int = 1,
        q20: np.ndarray | None = None,
    ) -> SCMResult:
        """Monolithic Newton on the coupled SCM system (Mantic-Lugo et
        al. 2014's closure at strongly supercritical Re; equivalently
        the harmonic-balance Newton of order ``harmonics``).

        ``harmonics=1``: unknowns (U, q_r, q_i, omega), 3N+1 equations:
        forced mean (N), marginal mode (A(U) - i omega M) q = 0 (2N),
        and the phase condition Im <q_ref, q>_M = 0 with q_ref = q0.
        The amplitude is ||q||_E — NOT a separate unknown — so
        marginality is hardwired and the fold of the frozen-load mean
        branch (which stalls the alternation) is invisible to this
        formulation.

        ``harmonics=2``: adds the second-harmonic field q2 (5N+1
        unknowns; see the HB2 block comment above), retaining the
        first-harmonic feedback B(q1*, q2) that HB1/the alternation
        truncate — the frequency moves from the SCM prediction toward
        the DNS value.  ``q20`` optionally seeds q2; default is the
        weakly-nonlinear-style linear solve
        (A - 2 i omega M) q2 = -1/2 B(q1, q1).

        ``q0`` must carry the amplitude (A * unit mode), e.g. from a
        wall-limited :meth:`solve` (use ``amplitude_sl``).  The
        bordered matrix is factored by host sparse LU per iteration —
        the coupled solve is a polish step (a handful of iterations),
        not the production inner loop."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        if harmonics not in (1, 2):
            raise ValueError("harmonics must be 1 or 2")
        n = self.ctx.spaces.num_dofs
        mask_m = np.asarray(self._base_asm.bc_mask, dtype=bool)
        bcv_m = np.asarray(self._base_asm.bc_values, dtype=float)
        mask_p = np.asarray(self.bcs_pert.dirichlet_mask, dtype=bool)
        zm = sp.diags(np.where(mask_m, 0.0, 1.0))
        zp = sp.diags(np.where(mask_p, 0.0, 1.0))

        U = np.where(mask_m, bcv_m, np.asarray(U0, dtype=float))
        q1 = np.where(mask_p, 0.0, np.asarray(q0, dtype=complex))
        om = float(omega0)
        # phase reference: frozen initial mode (standard bordering)
        avec = self._Ms.T @ q1.real
        bvec = self._Ms.T @ q1.imag

        Aop = self._linearized_scipy(U)
        if harmonics == 2:
            from lsafw_tpu.wnl import convective_bilinear_load as B

            if q20 is not None:
                q2 = np.where(mask_p, 0.0, np.asarray(q20, dtype=complex))
            else:
                rhs = 0.5 * B(self.ctx, q1, q1)
                rhs[mask_p] = 0.0
                K2 = (Aop.astype(complex)
                      - 2j * om * self._Ms.astype(complex)).tocsc()
                q2 = -spla.splu(K2).solve(rhs)
        else:
            q2 = None

        def resid(Uv, q1v, q2v, omv, Av):
            if harmonics == 1:
                return self._coupled_residual(
                    Uv, q1v.real, q1v.imag, omv, Av, avec, bvec,
                    mask_m, mask_p)
            return self._hb2_residual(
                Uv, q1v, q2v, omv, Av, avec, bvec, mask_m, mask_p)

        F = resid(U, q1, q2, om, Aop)
        normF = float(np.linalg.norm(F))
        history = []
        converged = False
        for it in range(1, max_it + 1):
            amp = float(np.sqrt(
                np.real(np.vdot(q1, self._Ms @ q1))))
            history.append((amp, 0.0, om))
            if normF < tol:
                converged = True
                break
            if harmonics == 1:
                K = self._coupled_matrix(
                    U, q1.real, q1.imag, om, Aop, avec, bvec, zm, zp)
            else:
                K = self._hb2_matrix(
                    U, q1, q2, om, Aop, avec, bvec, zm, zp)
            dz = self._bordered_solve(K, -F)
            accepted = False
            for alpha in (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125):
                Ut = U + alpha * dz[:n]
                q1t = q1 + alpha * (dz[n:2 * n] + 1j * dz[2 * n:3 * n])
                q2t = (q2 + alpha * (dz[3 * n:4 * n]
                                     + 1j * dz[4 * n:5 * n])
                       if harmonics == 2 else None)
                omt = om + alpha * float(dz[-1])
                At = self._linearized_scipy(Ut)
                Ft = resid(Ut, q1t, q2t, omt, At)
                normFt = float(np.linalg.norm(Ft))
                if np.isfinite(normFt) and normFt < (1 - 1e-4 * alpha) * normF:
                    U, q1, q2, om, Aop, F, normF = (
                        Ut, q1t, q2t, omt, At, Ft, normFt)
                    accepted = True
                    break
            logger.info("SCM coupled Newton (HB%d) %d: |F| = %.3e, "
                        "A = %.5f, omega = %.5f%s", harmonics, it,
                        normF, amp, om, "" if accepted else " (no descent)")
            if not accepted:
                logger.warning(
                    "SCM coupled Newton stalled at |F| = %.3e.", normF)
                break
        amp = float(np.sqrt(np.real(np.vdot(q1, self._Ms @ q1))))
        mode = q1 / max(amp, 1e-300)
        return SCMResult(amp, complex(0.0, om), U, mode, converged,
                         history, None, q2)

    # ------------------------------------------------------------------
    def solve(
        self,
        baseflow: np.ndarray,
        *,
        A0: float = 0.1,
        tol_sigma: float = 1e-4,
        max_outer: int = 30,
        inner: int = 6,
        state0: tuple | None = None,
        x0: float | None = None,
    ) -> SCMResult:
        """Find (mean, mode, A, omega) with sigma_r = 0.

        ``baseflow``: the (unstable) fixed point to start from.
        ``inner``: max mean<->mode sweeps per amplitude (stops early
        once sigma_r settles; the load is under-relaxed across
        sweeps).
        ``state0``/``x0``: Re-continuation warm start — the converged
        ``(mean, mode, sigma)`` of a NEARBY Re and the x = A^2 to open
        with (typically extrapolated along the A^2(Re) curve).  The
        first trial then builds its load from the previous mode and
        starts the mean Newton from the previous mean, which sits
        inside the Newton basin where a cold march from the (strongly
        unstable) fixed point is not."""
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
        if state0 is not None:
            Us0, ms0, ss0 = state0
            state = (np.asarray(Us0), self._normalize(np.asarray(ms0)),
                     complex(ss0))
        else:
            state = (U0, mode, sigma)
        U = U0
        x_good = 0.0  # the x the held state was computed at
        x_lo, g_lo = 0.0, g_hopf
        x_hi = g_hi = None
        x = float(A0) ** 2 if x0 is None else float(x0)
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
                    # frozen-load fold: try the coupled relaxation
                    # (mode refreshed every few Newton steps)
                    cr = self._coupled_relax(x, Ut, modet, sigmat, omega)
                    if cr is None:
                        trial_ok = False
                        break
                    Ut, modet, sigmat = cr
                    g_seq.append(sigmat.real)
                    break  # relaxation is already self-consistent
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
                # a trial failure within 1% of the last good x is a
                # wall probe, not a real step: each one costs a full
                # relaxation attempt, and the coupled Newton (the
                # polish of scm_continuation / the CLI) resolves the
                # root far more cheaply from the held state
                if x - x_lo < 1e-2 * max(x, 1.0):
                    # the forced-mean Newton has a hard wall just above
                    # the last good x; if the held state is already
                    # inside the alternation's noise floor of
                    # marginality, that IS the root as well as this
                    # formulation can resolve it (same criterion as the
                    # bracket-collapse exit)
                    if abs(sigma.real) < 20 * tol_sigma:
                        logger.info(
                            "SCM wall at x = %.4f with near-marginal "
                            "sigma_r = %+.2e: accepting.", x, sigma.real)
                        converged = True
                    else:
                        logger.warning("SCM stalled against a failing x; "
                                       "stopping at the last good state.")
                    break
                logger.info(
                    "SCM outer %d: trial failed at x = %.4f; retrying "
                    "x = %.4f.", outer, x, x_new)
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
            if (g > 0 and np.isfinite(x_fail_min)
                    and x_fail_min - x < 2e-3 * max(x, 1.0)
                    and abs(g) < 20 * tol_sigma):
                # pinned against the forced-mean Newton wall from the
                # good side, already inside the alternation's noise
                # floor: wall-limited convergence
                logger.info(
                    "SCM wall-limited convergence at x = %.4f "
                    "(sigma_r = %+.2e).", x, g)
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
        if (not converged and x_good > 0
                and abs(sigma.real) < 20 * tol_sigma):
            logger.info(
                "SCM outer budget exhausted near marginality "
                "(sigma_r = %+.2e): accepting.", sigma.real)
            converged = True
        amplitude_sl = None
        if not converged and x_good > 0:
            # wall-limited below marginality: extrapolate the root of
            # the ~linear g(x) through the reachable points (Stuart-
            # Landau law); reported SEPARATELY from converged results
            pts = np.array([(a * a, g) for a, g, _ in history
                            if a * a > 0.3 * x_good])
            if len(pts) >= 2 and np.ptp(pts[:, 0]) > 0:
                slope, icept = np.polyfit(pts[:, 0], pts[:, 1], 1)
                if slope < 0:
                    x_star = -icept / slope
                    if x_star > x_good:
                        amplitude_sl = float(np.sqrt(x_star))
                        logger.info(
                            "SCM Stuart-Landau extrapolated amplitude "
                            "A* = %.4f (wall-limited at A = %.4f, "
                            "sigma_r = %+.3e).",
                            amplitude_sl, np.sqrt(x_good), sigma.real)
        return SCMResult(float(np.sqrt(x_good)), sigma, U, mode, converged,
                         history, amplitude_sl)


def scm_continuation(
    ctx: AssemblyContext,
    mesh,
    bcs,
    bcs_pert,
    res: list[float],
    baseflow_fn,
    **kw,
) -> list[tuple[float, SCMResult]]:
    """Re-continuation of the self-consistent model up the A(Re) curve.

    Solves the SCM at each Reynolds number of ``res`` (ascending, the
    first weakly supercritical), warm-starting every solve from the
    previous converged (mean, mode, sigma) and opening at an x = A^2
    extrapolated linearly along the curve — the continuation practice
    of Mantic-Lugo et al. 2014 that reaches strongly supercritical Re
    where a cold start's forced-mean Newton diverges below the marginal
    amplitude.

    ``baseflow_fn(re)``: the (unstable) fixed point at ``re``.
    ``coupled``: when a point comes out wall-limited (the alternation's
    forced-mean fold), finish it with the monolithic coupled Newton
    (:meth:`SelfConsistentModel.solve_coupled`) seeded from the held
    state at the Stuart-Landau amplitude estimate.
    ``kw``: forwarded to :class:`SelfConsistentModel` (solver choices)
    and :meth:`SelfConsistentModel.solve` (tolerances) — split on the
    constructor's signature.
    """
    import inspect

    coupled = kw.pop("coupled", True)
    ctor_keys = set(inspect.signature(
        SelfConsistentModel.__init__).parameters) - {
            "self", "ctx", "mesh", "bcs", "bcs_pert", "re", "mass"}
    ctor_kw = {k: v for k, v in kw.items() if k in ctor_keys}
    solve_kw = {k: v for k, v in kw.items() if k not in ctor_keys}
    out: list[tuple[float, SCMResult]] = []
    mass = None
    xs: list[tuple[float, float]] = []  # converged (re, x) points
    state = None
    for re in res:
        model = SelfConsistentModel(
            ctx, mesh, bcs, bcs_pert, re, mass=mass, **ctor_kw)
        mass = model._Mmat
        x0 = None
        if len(xs) >= 2:  # linear extrapolation of x(Re)
            (r1, x1), (r2, x2) = xs[-2], xs[-1]
            x0 = max(x2 + (x2 - x1) * (re - r2) / (r2 - r1), 0.25 * x2)
        elif xs:
            x0 = xs[-1][1]
        res_i = None
        if coupled and state is not None and x0 is not None:
            # true continuation: the coupled Newton directly from the
            # previous Re's converged state at the extrapolated
            # amplitude — one bordered solve per iteration, no
            # alternation march.  Falls back to the alternation when
            # the warm start is outside the Newton basin.
            Us, ms, ss = state
            cres = model.solve_coupled(
                np.asarray(Us),
                float(np.sqrt(x0)) * np.asarray(ms),
                abs(complex(ss).imag), max_it=12)
            if cres.converged:
                logger.info("SCM continuation: coupled Newton solved "
                            "Re = %g directly (A = %.4f).",
                            re, cres.amplitude)
                res_i = cres
        if res_i is None:
            res_i = model.solve(baseflow_fn(re), state0=state, x0=x0,
                                **solve_kw)
        tol_sig = solve_kw.get("tol_sigma", 1e-4)
        if coupled and res_i.amplitude > 0 and (
                not res_i.converged
                or abs(res_i.sigma.real) > tol_sig):
            # wall-limited OR accepted only at the alternation's noise
            # floor: hand the held state to the coupled Newton at the
            # Stuart-Landau amplitude estimate — it resolves the true
            # root (sigma_r = 0 exactly) in a few bordered solves
            A0 = res_i.amplitude_sl or res_i.amplitude
            cres = model.solve_coupled(
                res_i.mean, A0 * res_i.mode, abs(res_i.sigma.imag))
            if cres.converged:
                logger.info("SCM continuation: coupled Newton closed "
                            "Re = %g at A = %.4f (from A = %.4f, "
                            "sigma_r = %+.1e).", re, cres.amplitude,
                            res_i.amplitude, res_i.sigma.real)
                res_i = cres
        out.append((re, res_i))
        if res_i.amplitude > 0:
            # a wall-limited state is still the best warm start for the
            # next Re; the curve extrapolation uses the Stuart-Landau
            # root estimate when the march could not reach marginality
            state = (res_i.mean, res_i.mode, res_i.sigma)
            xs.append((re, (res_i.amplitude_sl or res_i.amplitude) ** 2))
        if not res_i.converged:
            logger.warning("SCM continuation: Re = %g wall-limited "
                           "(A = %.3f, A_SL = %s).", re, res_i.amplitude,
                           res_i.amplitude_sl)
    return out
