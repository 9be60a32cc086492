"""Unsteady incompressible Navier-Stokes: nonlinear time integration.

Beyond the reference (ferdean/lsa-fw stops at steady states and
eigenmodes): a theta-scheme (Crank-Nicolson default) marching of

    M dq/dt = R(q),

with ``R`` the stationary-NS residual (momentum + continuity +
Dirichlet rows; the SIGN is fixed by the framework's stability
convention — the eigensystem operator A equals the stationary
Jacobian dR/dq and sigma_real > 0 means unstable, so perturbations
evolve as M dq'/dt = +J q') and ``M`` the velocity mass with zero
pressure/BC rows
— exactly the matrices the stability machinery already assembles, on
one shared sparsity pattern.  Enables limit-cycle (saturated
vortex-shedding) studies that close the loop on the linear analyses:
the Hopf mode's sigma_im predicts the shedding frequency at onset.

Per step, Newton on

    G(q1) = M (q1 - q0) - dt [theta R(q1) + (1-theta) R_mom(q0)] = 0,

where the explicit part ``R_mom`` is masked to momentum rows only so
the continuity row enforces div q1 = 0 IMPLICITLY (a theta-averaged
continuity row lets div oscillate at the 2-step mode instead of
vanishing).  The Newton matrix  M - dt theta J(q1)  shares the
stationary Jacobian's pattern, so its data is one fused add; it is
factored by host SuperLU or the device band LU and FROZEN (chord
Newton) across iterations and, optionally, across steps
(``refactor_every`` — the operator drifts O(dt) per step).

Dirichlet rows: M is zero there and J carries identity, so the Newton
matrix has -dt*theta on the BC diagonal while G is masked to zero —
updates leave BC values exactly where the initial state put them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    StationaryNavierStokesAssembler,
)
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.direct import SparseLU
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class StepStats:
    t: float
    newton_iters: int
    residual: float
    refactored: bool


@dataclass
class UnsteadyResult:
    t: np.ndarray  # (n_saved,)
    probes: np.ndarray  # (n_saved, n_probes)
    q: np.ndarray  # final state
    stats: list = field(default_factory=list)


class UnsteadySolver:
    """theta-scheme marching with chord-Newton steps.

    Args:
        ctx, mesh, bcs: as for :class:`BaseFlowSolver` (inhomogeneous
            BCs belong in ``bcs``; the state carries the lift).
        re: Reynolds number.
        theta: 0.5 = Crank-Nicolson (default), 1.0 = backward Euler.
        method: "lu" (host SuperLU) or "banded" (device band LU).
        refactor_every: steps between Newton-matrix refactorizations
            (the chord factor absorbs O(dt) drift; Newton still
            converges on the exact residual).
    """

    def __init__(
        self,
        ctx: AssemblyContext,
        mesh,
        bcs,
        re: float,
        *,
        theta: float = 0.5,
        method: str = "lu",
        newton_tol: float = 1e-9,
        newton_maxit: int = 12,
        refactor_every: int = 1,
    ) -> None:
        self.ctx = ctx
        self.re = float(re)
        self.theta = float(theta)
        self.method = method
        self.newton_tol = float(newton_tol)
        self.newton_maxit = int(newton_maxit)
        self.refactor_every = max(1, int(refactor_every))
        self._asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
        self._bc_mask = jnp.asarray(self._asm.bc_mask)
        nu = ctx.spaces.num_velocity_dofs
        n = ctx.spaces.num_dofs
        mom = np.zeros(n, dtype=bool)
        mom[:nu] = True
        mom &= ~np.asarray(self._asm.bc_mask)
        self._mom_mask = jnp.asarray(mom)
        # velocity mass on the stationary Jacobian's pattern (zero
        # pressure/BC rows) — LinearizedNavierStokesAssembler builds it
        # from the same ctx, so the patterns are identical
        lin = LinearizedNavierStokesAssembler(
            jnp.zeros(n), ctx, self.re, bcs, mesh
        )
        self._M = lin.assemble_mass_matrix()
        assert self._M.pattern is ctx.pattern
        self._factor = None
        self._steps_since_factor = 0

    # ------------------------------------------------------------------
    def _newton_matrix_data(self, q, dt: float) -> jnp.ndarray:
        Jd = self._asm.jacobian_data(q, self.re)
        return self._M.data - (dt * self.theta) * Jd

    def _build_factor(self, data):
        """Backend-dispatched factorization of a Newton-matrix data
        array on the shared pattern (used by both the theta and BDF2
        steps)."""
        if self.method == "banded":
            from lsafw_tpu.solver.band import factor_auto, plan_for_csr

            A = CSRMatrix(self.ctx.pattern, data)
            if not hasattr(self, "_plan"):
                self._plan = plan_for_csr(A, real=True)
            blu, _ = factor_auto(
                self._plan, data, diag_slots=self.ctx.pattern.diag_slots
            )
            return ("banded", blu, A)
        import scipy.sparse as sp

        A = sp.csr_matrix(
            (np.asarray(data), self.ctx.pattern.indices,
             self.ctx.pattern.indptr),
            shape=self.ctx.pattern.shape,
        )
        return ("lu", SparseLU(A.tocsc()), None)

    def _refactor(self, q, dt: float) -> None:
        self._factor = self._build_factor(self._newton_matrix_data(q, dt))
        self._factor_dt = float(dt)
        self._steps_since_factor = 0

    def _solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return self._solve_with(self._factor, b)

    def _solve_with(self, factor, b: jnp.ndarray) -> jnp.ndarray:
        kind, fac, A = factor
        if kind == "banded":
            from lsafw_tpu.solver.eigen import BandedSIOp, banded_solve_raw

            if not hasattr(self, "_jraw"):
                self._jraw = jax.jit(lambda op, v: banded_solve_raw(
                    op, v, tol=1e-11, max_its=40))
            op = BandedSIOp(A=A, M=None, blu=fac,
                            sig_re=jnp.asarray(0.0), sig_im=jnp.asarray(0.0))
            xr, _ = self._jraw(op, (b, jnp.zeros_like(b)))
            return xr
        return jnp.asarray(fac.solve(np.asarray(b)))

    # ------------------------------------------------------------------
    def _jit_step(self):
        """One FUSED chord-Newton step (banded backend): residual
        assembly, band solve and the Newton while_loop trace into ONE
        program — one dispatch per time step on high-latency runtimes
        (the axon tunnel costs ~150 ms per eager op)."""
        from lsafw_tpu.models.navier_stokes import _jit_ns_residual
        from lsafw_tpu.solver.eigen import banded_solve_raw

        theta, re = self.theta, self.re
        tol, maxit = self.newton_tol, self.newton_maxit

        def step(ctx, Mmat, dop, bc, mom, f, outlets, robin, q0, dt,
                 load0, load1):
            Fm0 = _jit_ns_residual(ctx, q0, re, f, outlets, robin) + load0
            expl = (dt * (1.0 - theta)) * jnp.where(mom, Fm0, 0.0)
            Mq0 = Mmat.matvec(q0)
            scale = jnp.maximum(jnp.linalg.norm(Mq0), 1.0)

            def G_of(q1):
                F = _jit_ns_residual(ctx, q1, re, f, outlets, robin) + load1
                F = jnp.where(bc, 0.0, F)
                return Mmat.matvec(q1) - Mq0 - (dt * theta) * F - expl

            G0 = G_of(q0)
            res0 = jnp.linalg.norm(G0)

            def cond(st):
                _, _, res, it = st
                return (res > tol * scale) & (res > 1e-6 * res0) & (it < maxit)

            def body(st):
                q1, G, _, it = st
                dq, _ = banded_solve_raw(
                    dop, (-G, jnp.zeros_like(G)), tol=1e-11, max_its=40
                )
                q1 = q1 + dq
                G = G_of(q1)
                return q1, G, jnp.linalg.norm(G), it + 1

            # it counts UPDATES; starting at 0 allows the same maxit
            # corrections as the eager LU path
            q1, _, res, it = jax.lax.while_loop(
                cond, body, (q0, G0, res0, jnp.int32(0))
            )
            return q1, res, it

        return jax.jit(step)

    def step(
        self,
        q0: jnp.ndarray,
        dt: float,
        t: float = 0.0,
        load0: jnp.ndarray | None = None,
        load1: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, StepStats]:
        """One theta step from ``q0`` (must satisfy the Dirichlet BCs).

        ``load0``/``load1``: optional assembled body-force vectors at
        t and t+dt (e.g. ``M @ (P f) * g(t)`` for harmonic forcing —
        the resolvent's right-hand side), added to R on momentum rows.
        """
        q0 = jnp.asarray(q0)
        z = jnp.zeros(self._M.shape[0])
        load0 = z if load0 is None else jnp.asarray(load0)
        load1 = z if load1 is None else jnp.asarray(load1)
        refactored = False
        if (self._factor is None
                or self._steps_since_factor >= self.refactor_every
                or getattr(self, "_factor_dt", None) != float(dt)):
            self._refactor(q0, dt)
            refactored = True
        if self._factor[0] == "banded":
            # fused path: the whole step is one device program
            from lsafw_tpu.solver.eigen import BandedSIOp

            if not hasattr(self, "_jstep"):
                self._jstep = self._jit_step()
            _, blu, A = self._factor
            dop = BandedSIOp(A=A, M=None, blu=blu,
                             sig_re=jnp.asarray(0.0), sig_im=jnp.asarray(0.0))
            q1, res, it = self._jstep(
                self.ctx, self._M, dop, self._bc_mask, self._mom_mask,
                self._asm.f, self._asm._outlets, self._asm._robin, q0, dt,
                load0, load1,
            )
            res, it = float(res), int(it)
            if it >= self.newton_maxit and res > 1e3 * self.newton_tol * max(
                float(jnp.linalg.norm(self._M.matvec(q0))), 1.0
            ):
                logger.warning(
                    "Unsteady Newton slow at t=%.3f (res %.2e); refactoring.",
                    t, res,
                )
                self._refactor(q1, dt)
                refactored = True
            self._steps_since_factor += 1
            return q1, StepStats(t + dt, it, res, refactored)
        expl = (dt * (1.0 - self.theta)) * jnp.where(
            self._mom_mask,
            self._asm.residual(q0, self.re) + load0, 0.0,
        )
        Mq0 = self._M.matvec(q0)
        q1 = q0
        res = res0 = np.inf
        for it in range(1, self.newton_maxit + 1):
            G = (self._M.matvec(q1) - Mq0
                 - (dt * self.theta) * jnp.where(
                     self._bc_mask, 0.0,
                     self._asm.residual(q1, self.re) + load1)
                 - expl)
            res = float(jnp.linalg.norm(G))
            if it == 1:
                res0 = res
            # absolute floor (f64 rounding of the G evaluation) OR
            # relative drop from the step's initial defect
            scale = max(float(jnp.linalg.norm(Mq0)), 1.0)
            if res <= self.newton_tol * scale or res <= 1e-6 * res0:
                break
            dq = self._solve(-G)
            q1 = q1 + dq
        else:
            it = self.newton_maxit
            if res > 1e3 * self.newton_tol * (float(jnp.linalg.norm(Mq0)) + dt):
                # chord factor too stale — refactor at the current
                # iterate and warn (keeps marching robust near strong
                # transients)
                logger.warning(
                    "Unsteady Newton slow at t=%.3f (res %.2e); refactoring.",
                    t, res,
                )
                self._refactor(q1, dt)
                refactored = True
        self._steps_since_factor += 1
        return q1, StepStats(t + dt, it, res, refactored)

    # ------------------------------------------------------------------
    def step_bdf2(
        self,
        q1: jnp.ndarray,
        q0: jnp.ndarray,
        dt: float,
        t: float = 0.0,
        load2: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, StepStats]:
        """One BDF2 step (L-stable; preferred for long stiff marches —
        CN only neutrally damps the unresolved saddle modes):

            G(q2) = M (1.5 q2 - 2 q1 + 0.5 q0) - dt (R(q2) + load2) = 0,

        Newton matrix 1.5 M - dt J(q2); fully implicit, so continuity
        and BC rows need no explicit-side masking.  Bootstrap the first
        step with :meth:`step` (CN).  A dedicated chord factor
        (``_factor_bdf2``) goes through the same backend dispatch as
        the theta step (host SuperLU or device band LU)."""
        q1 = jnp.asarray(q1)
        q0 = jnp.asarray(q0)
        z = jnp.zeros(self._M.shape[0])
        load2 = z if load2 is None else jnp.asarray(load2)
        refactored = False
        if (getattr(self, "_factor_bdf2", None) is None
                or self._bdf2_steps_since >= self.refactor_every
                or getattr(self, "_bdf2_dt", None) != float(dt)):
            Jd = self._asm.jacobian_data(q1, self.re)
            self._factor_bdf2 = self._build_factor(
                1.5 * self._M.data - dt * Jd)
            self._bdf2_dt = float(dt)
            self._bdf2_steps_since = 0
            refactored = True
        rhs = self._M.matvec(2.0 * q1 - 0.5 * q0)
        q2 = q1
        res = res0 = np.inf
        scale = max(float(jnp.linalg.norm(rhs)), 1.0)
        for it in range(1, self.newton_maxit + 1):
            G = (1.5 * self._M.matvec(q2) - rhs
                 - dt * jnp.where(self._bc_mask, 0.0,
                                  self._asm.residual(q2, self.re) + load2))
            res = float(jnp.linalg.norm(G))
            if it == 1:
                res0 = res
            if res <= self.newton_tol * scale or res <= 1e-6 * res0:
                break
            dq = self._solve_with(self._factor_bdf2, -G)
            q2 = q2 + dq
        self._bdf2_steps_since += 1
        return q2, StepStats(t + dt, it, res, refactored)

    def run(
        self,
        q0: jnp.ndarray,
        dt: float,
        n_steps: int,
        *,
        probe_dofs=None,
        save_every: int = 1,
        t0: float = 0.0,
        load_fn=None,
        scheme: str = "theta",
        checkpoint_path=None,
        checkpoint_every: int = 200,
    ) -> UnsteadyResult:
        """March ``n_steps``; record ``q[probe_dofs]`` every
        ``save_every`` steps (the shedding-frequency signal).
        ``load_fn(t)``: optional assembled body-force vector at time t
        (harmonic forcing studies).  ``scheme``: "theta" (the solver's
        theta rule) or "bdf2" (L-stable; CN-bootstrapped).
        ``checkpoint_path``: .npz written every ``checkpoint_every``
        steps; a rerun with the same path resumes from the last
        checkpoint (state, BDF2 history, probe series — long
        saturation marches survive interruption; in-solver resume
        beyond the reference, SURVEY section 5)."""
        probe_dofs = np.asarray(probe_dofs if probe_dofs is not None else [0])
        q = jnp.asarray(q0)
        q_prev = None
        ts, probes, stats = [], [], []
        t = t0
        k0 = 0
        if checkpoint_path is not None:
            import os
            from pathlib import Path

            # np.savez appends .npz; normalize so resume finds the file
            cp = Path(checkpoint_path)
            if cp.suffix != ".npz":
                cp = cp.with_suffix(cp.suffix + ".npz")
            if cp.exists():
                d = np.load(cp, allow_pickle=False)
                k0 = int(d["k"])
                t = float(d["t"])
                q = jnp.asarray(d["q"])
                q_prev = jnp.asarray(d["q_prev"]) if d["has_prev"] else None
                ts = list(d["ts"])
                probes = list(d["probes"])
                logger.info(
                    "Resuming unsteady march from checkpoint %s "
                    "(step %d, t=%.3f).", cp, k0, t,
                )

            def _save(k):
                # atomic: an interrupted write must not corrupt the
                # only copy (interruption is what checkpoints are FOR)
                tmp = cp.with_suffix(".tmp.npz")
                np.savez(
                    tmp, k=k, t=t, q=np.asarray(q),
                    q_prev=np.asarray(q_prev if q_prev is not None else q),
                    has_prev=q_prev is not None,
                    ts=np.asarray(ts), probes=np.asarray(probes),
                )
                os.replace(tmp, cp)
        for k in range(k0, n_steps):
            if scheme == "bdf2" and q_prev is not None:
                q_new, st = self.step_bdf2(
                    q, q_prev, dt, t,
                    load2=None if load_fn is None else load_fn(t + dt))
                q_prev, q = q, q_new
            elif load_fn is not None:
                q_prev = q
                q, st = self.step(q, dt, t, load0=load_fn(t),
                                  load1=load_fn(t + dt))
            else:
                q_prev = q
                q, st = self.step(q, dt, t)
            t = st.t
            stats.append(st)
            if (k + 1) % save_every == 0:
                ts.append(t)
                probes.append(np.asarray(q)[probe_dofs])
            if not np.isfinite(st.residual):
                # never persist a poisoned state: a NaN checkpoint
                # would brick every resume
                logger.error("Unsteady solve diverged at t=%.3f.", t)
                break
            if checkpoint_path is not None and (k + 1) % checkpoint_every == 0:
                _save(k + 1)
        return UnsteadyResult(
            np.asarray(ts), np.asarray(probes), np.asarray(q), stats
        )


def dominant_frequency(t: np.ndarray, signal: np.ndarray) -> float:
    """Peak frequency (rad/time) of a uniformly-sampled scalar signal,
    refined by parabolic interpolation of the FFT magnitude peak."""
    s = np.asarray(signal, dtype=np.float64)
    s = s - s.mean()
    n = s.size
    if n < 8:
        raise ValueError("signal too short")
    dt = float(t[1] - t[0])
    win = np.hanning(n)
    spec = np.abs(np.fft.rfft(s * win))
    freqs = np.fft.rfftfreq(n, dt)
    k = int(np.argmax(spec[1:])) + 1
    # parabolic refinement around the peak bin
    if 1 <= k < spec.size - 1:
        a, b, c = spec[k - 1], spec[k], spec[k + 1]
        denom = a - 2 * b + c
        shift = 0.5 * (a - c) / denom if denom != 0 else 0.0
        shift = float(np.clip(shift, -0.5, 0.5))
    else:
        shift = 0.0
    return 2.0 * np.pi * (freqs[k] + shift * (freqs[1] - freqs[0]))
