"""Floquet stability of periodic orbits (e.g. the shedding limit cycle).

The third non-modal/nonlinear analysis beyond the reference's toolbox
(with :mod:`lsafw_tpu.resolvent` and :mod:`lsafw_tpu.transient`): the
eigenvalues of the monodromy operator Phi_T — the linearization of the
period-T flow map around a periodic orbit.  Multipliers |mu| > 1 mean
the cycle is unstable (secondary instability); a limit cycle of an
autonomous system always carries the trivial multiplier mu = 1 (phase
mode, tangent to the orbit) — a built-in self-check.

Discretization: the EXACT linearization of the nonlinear theta-stepper
(:mod:`lsafw_tpu.solver.timestepping`) around stored orbit snapshots
q_0..q_{N-1} (q_N = q_0):

    (M - dt theta J(q_{k+1})) v_{k+1} = (M + dt (1-theta) J_mom(q_k)) v_k

with J the stationary Jacobian (identity BC rows) and J_mom its
momentum-row restriction — the same masks as the stepper, so the
monodromy of a stepper-converged cycle is consistent to machine
precision with what the stepper itself would propagate.

Implementation: N implicit factors are built once (host SuperLU or the
device band LU) and reused across every Arnoldi apply; the explicit
side is a stored-Jacobian-data SpMV.  Multipliers come from ARPACK on
the matrix-free Phi_T action.

Memory scale: storage is N x (factor + Jacobian data).  At the reduced
11k-DOF cycle (N=40) that is comfortable on either backend; at the
167k production mesh the banded factors alone would be N x ~2 GB —
production-scale Floquet needs inexact implicit solves (Krylov + a
reusable preconditioner) instead of prestored factors, which is the
documented next step, not a silent OOM: the constructor logs the
estimated footprint.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    StationaryNavierStokesAssembler,
)
from lsafw_tpu.ops.sparse import CSRMatrix, spmv
from lsafw_tpu.solver.direct import SparseLU
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class FloquetResult:
    period: float
    multipliers: np.ndarray  # (k,) complex, descending |mu|
    modes: np.ndarray  # (k, n) complex
    trivial_error: float  # min_j |mu_j - 1| (phase-mode check)


class FloquetSolver:
    """Monodromy eigenanalysis around snapshots of one period.

    Args:
        ctx, mesh, bcs: the NONLINEAR problem's definition (same
            objects the :class:`UnsteadySolver` marched with).
        re: Reynolds number.
        snapshots: (N, n) states over one period (q_N = q_0 implied,
            uniformly spaced in time).
        dt: snapshot spacing (period = N * dt).
        theta: must match the stepper used to generate the orbit.
        method: "lu" (N host SuperLU factors) or "banded" (N device
            band factors — one shared plan).
    """

    def __init__(
        self,
        ctx: AssemblyContext,
        mesh,
        bcs,
        re: float,
        snapshots: np.ndarray,
        dt: float,
        *,
        theta: float = 0.5,
        method: str = "lu",
    ) -> None:
        self.ctx = ctx
        self.re = float(re)
        self.dt = float(dt)
        self.theta = float(theta)
        self.method = method
        snaps = np.asarray(snapshots)
        self.N = snaps.shape[0]
        self.period = self.N * self.dt
        asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
        n = ctx.spaces.num_dofs
        nu = ctx.spaces.num_velocity_dofs
        mom = np.zeros(n, dtype=bool)
        mom[:nu] = True
        mom &= ~np.asarray(asm.bc_mask)
        self._mom = jnp.asarray(mom)
        lin = LinearizedNavierStokesAssembler(
            jnp.zeros(n), ctx, self.re, bcs, mesh
        )
        Md = lin.assemble_mass_matrix().data
        self._M = CSRMatrix(ctx.pattern, Md)
        logger.info(
            "Floquet: factoring %d implicit steps (%s) over period %.3f",
            self.N, method, self.period,
        )
        # assemble each snapshot Jacobian ONCE; the implicit matrix of
        # step k reuses snapshot k+1's data
        Jdata = [asm.jacobian_data(jnp.asarray(snaps[k]), self.re)
                 for k in range(self.N)]
        self._expl: list[CSRMatrix] = [
            CSRMatrix(ctx.pattern, Jk) for Jk in Jdata
        ]
        self._facs = []  # implicit factors at q_{k+1}
        ew = self.dt * (1.0 - self.theta)
        for k in range(self.N):
            data = Md - (self.dt * self.theta) * Jdata[(k + 1) % self.N]
            if method == "banded":
                from lsafw_tpu.solver.band import factor_auto, plan_for_csr

                if not hasattr(self, "_plan"):
                    self._plan = plan_for_csr(
                        CSRMatrix(ctx.pattern, data), real=True
                    )
                blu, _ = factor_auto(
                    self._plan, data, diag_slots=ctx.pattern.diag_slots
                )
                self._facs.append((blu, CSRMatrix(ctx.pattern, data)))
            else:
                import scipy.sparse as sp

                A = sp.csr_matrix(
                    (np.asarray(data), ctx.pattern.indices, ctx.pattern.indptr),
                    shape=ctx.pattern.shape,
                )
                self._facs.append(SparseLU(A.tocsc()))
        self._ew = ew
        if method == "banded":
            import jax as _jax

            fac_bytes = sum(
                leaf.nbytes
                for blu, _ in self._facs
                for leaf in _jax.tree_util.tree_leaves(blu)
                if hasattr(leaf, "nbytes"))
        else:
            # SuperLU.nnz avoids materializing .L/.U copies just to
            # count them (the copies would transiently double the
            # factors this log line warns about)
            fac_bytes = sum(f._lu.nnz for f in self._facs) * 12
        logger.info(
            "Floquet factor storage: %.2f GB across %d snapshots "
            "(production-scale cycles need inexact implicit solves).",
            fac_bytes / 1e9, self.N,
        )

    # ------------------------------------------------------------------
    def _step_lin(self, k: int, v: np.ndarray) -> np.ndarray:
        """One linearized theta-step k -> k+1 on a complex vector."""
        Jv = np.asarray(spmv(self._expl[k], jnp.asarray(v.real))) + 1j * (
            np.asarray(spmv(self._expl[k], jnp.asarray(v.imag)))
        )
        Jv = np.where(np.asarray(self._mom), Jv, 0.0)
        b = (np.asarray(self._M.matvec(jnp.asarray(v.real)))
             + 1j * np.asarray(self._M.matvec(jnp.asarray(v.imag)))
             + self._ew * Jv)
        fac = self._facs[k]
        if self.method == "banded":
            from lsafw_tpu.solver.eigen import BandedSIOp, banded_solve_raw
            import jax

            blu, A = fac
            if not hasattr(self, "_jraw"):
                self._jraw = jax.jit(lambda op, vv: banded_solve_raw(
                    op, vv, tol=1e-11, max_its=40))
            op = BandedSIOp(A=A, M=None, blu=blu,
                            sig_re=jnp.asarray(0.0), sig_im=jnp.asarray(0.0))
            xr, xi = self._jraw(op, (jnp.asarray(b.real), jnp.asarray(b.imag)))
            return np.asarray(xr) + 1j * np.asarray(xi)
        # real factor: solve the two channels separately
        return fac.solve(np.ascontiguousarray(b.real)) + 1j * fac.solve(
            np.ascontiguousarray(b.imag))

    def monodromy_apply(self, v: np.ndarray) -> np.ndarray:
        """Phi_T v — one trip around the orbit.

        Banded backend: ONE jitted lax.scan over the stacked snapshot
        data and factors (everything in the trip is traceable), so an
        Arnoldi apply costs one dispatch instead of ~6 per snapshot —
        on the ~150 ms/dispatch tunnel that is the difference between
        minutes and an hour per eigensolve."""
        v = np.asarray(v, dtype=np.complex128)
        if self.method == "banded":
            import jax

            from lsafw_tpu.solver.eigen import BandedSIOp, banded_solve_raw

            if not hasattr(self, "_jtrip"):
                expl_stack = jnp.stack([E.data for E in self._expl])
                blu_stack = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[blu for blu, _ in self._facs],
                )
                imp_stack = jnp.stack([A.data for _, A in self._facs])
                pattern = self.ctx.pattern
                ew, mom = self._ew, self._mom
                M = self._M

                def trip(expl_s, blu_s, imp_s, vr, vi):
                    def body(carry, xs):
                        vr, vi = carry
                        ed, blu, idata = xs
                        E = CSRMatrix(pattern, ed)
                        A = CSRMatrix(pattern, idata)
                        br = M.matvec(vr) + ew * jnp.where(mom, spmv(E, vr), 0.0)
                        bi = M.matvec(vi) + ew * jnp.where(mom, spmv(E, vi), 0.0)
                        op = BandedSIOp(
                            A=A, M=None, blu=blu,
                            sig_re=jnp.asarray(0.0), sig_im=jnp.asarray(0.0),
                        )
                        xr, xi = banded_solve_raw(
                            op, (br, bi), tol=1e-11, max_its=40
                        )
                        return (xr, xi), None

                    (vr, vi), _ = jax.lax.scan(
                        body, (vr, vi), (expl_s, blu_s, imp_s)
                    )
                    return vr, vi

                self._jtrip = jax.jit(trip)
                self._stacks = (expl_stack, blu_stack, imp_stack)
            es, bs, is_ = self._stacks
            vr, vi = self._jtrip(es, bs, is_, jnp.asarray(v.real),
                                 jnp.asarray(v.imag))
            return np.asarray(vr) + 1j * np.asarray(vi)
        for k in range(self.N):
            v = self._step_lin(k, v)
        return v

    # ------------------------------------------------------------------
    def solve(self, k: int = 5, *, tol: float = 1e-8) -> FloquetResult:
        """Leading ``k`` Floquet multipliers by |mu| (ARPACK on the
        matrix-free monodromy action)."""
        import scipy.sparse.linalg as spla

        n = self.ctx.spaces.num_dofs
        P = spla.LinearOperator(
            (n, n), matvec=self.monodromy_apply, dtype=np.complex128
        )
        mu, V = spla.eigs(P, k=k, which="LM", tol=tol,
                          ncv=max(2 * k + 4, 20))
        order = np.argsort(-np.abs(mu))
        mu, V = mu[order], V[:, order]
        triv = float(np.min(np.abs(mu - 1.0)))
        logger.info(
            "Floquet multipliers |mu| = %s (trivial-mode error %.2e)",
            np.array2string(np.abs(mu), precision=4), triv,
        )
        return FloquetResult(self.period, mu, V.T.copy(), triv)
