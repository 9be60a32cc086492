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

Memory scale: with prestored factors, storage is N x (factor +
Jacobian data) — comfortable at the reduced 11k-DOF cycle (N=40), but
at the 167k production mesh the banded factors alone would be
N x ~2 GB.  ``inexact=True`` is the production-scale mode: ONE factor
of the CYCLE-MEAN implicit matrix M - dt theta J(q_mean) is the
reusable preconditioner for every snapshot's implicit solve, refined
by the same minimal-residual iteration the shift-invert path uses
(:func:`lsafw_tpu.solver.eigen.banded_solve_raw` — residual matvecs
ride the per-snapshot CSR data, the PC rides the shared factor), so
factor storage drops N-fold while each step stays a direct-quality
solve.  The theta-stepper's implicit matrices differ from the mean
only by dt theta (J(q_k) - J(q_mean)) — an O(dt) perturbation — so the
refinement contracts fast at any dt fine enough to resolve the cycle.
The constructor logs the estimated footprint either way.
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
        method: "lu" (host SuperLU) or "banded" (device band LU).
        inexact: factor ONLY the cycle-mean implicit matrix and use it
            as the reusable preconditioner of a minimal-residual
            refinement per step (production-scale memory: one factor
            instead of N).  False prestores all N factors.
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
        inexact: bool = False,
    ) -> None:
        self.ctx = ctx
        self.re = float(re)
        snaps = np.asarray(snapshots)
        asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
        n = ctx.spaces.num_dofs
        nu = ctx.spaces.num_velocity_dofs
        mom = np.zeros(n, dtype=bool)
        mom[:nu] = True
        mom &= ~np.asarray(asm.bc_mask)
        lin = LinearizedNavierStokesAssembler(
            jnp.zeros(n), ctx, self.re, bcs, mesh
        )
        Md = lin.assemble_mass_matrix().data
        # assemble each snapshot Jacobian ONCE; the implicit matrix of
        # step k reuses snapshot k+1's data
        Jdata = [asm.jacobian_data(jnp.asarray(snaps[k]), self.re)
                 for k in range(snaps.shape[0])]
        self._setup(ctx.pattern, Md, Jdata, mom, dt,
                    theta=theta, method=method, inexact=inexact)

    @classmethod
    def from_operator_data(
        cls,
        pattern,
        Md: jnp.ndarray,
        Jdata: list,
        mom: np.ndarray,
        dt: float,
        *,
        theta: float = 0.5,
        method: str = "lu",
        inexact: bool = False,
    ) -> "FloquetSolver":
        """Monodromy analysis of an arbitrary linear(ized) system on a
        shared sparsity pattern: ``Md`` the mass data, ``Jdata`` one
        Jacobian data array per snapshot (Dirichlet identity rows),
        ``mom`` the explicit-side row mask.  This is the entry the
        quasi-3D spanwise Floquet (:mod:`lsafw_tpu.span`) builds on."""
        self = cls.__new__(cls)
        self.ctx = None
        self.re = None
        self._setup(pattern, Md, Jdata, np.asarray(mom), dt,
                    theta=theta, method=method, inexact=inexact)
        return self

    def _setup(self, pattern, Md, Jdata, mom, dt, *, theta, method,
               inexact) -> None:
        self._pattern = pattern
        self.dt = float(dt)
        self.theta = float(theta)
        self.method = method
        self.inexact = bool(inexact)
        self.N = len(Jdata)
        self.period = self.N * self.dt
        self._mom = jnp.asarray(mom)
        self._M = CSRMatrix(pattern, Md)
        logger.info(
            "Floquet: %s %d implicit steps (%s) over period %.3f",
            "mean-PC refining" if self.inexact else "factoring",
            self.N, method, self.period,
        )
        self._expl: list[CSRMatrix] = [
            CSRMatrix(pattern, Jk) for Jk in Jdata
        ]
        self._Md = Md
        self._ew = self.dt * (1.0 - self.theta)
        if self.inexact:
            self._init_inexact(Jdata, Md)
            return
        self._facs = []  # implicit factors at q_{k+1}
        for k in range(self.N):
            data = Md - (self.dt * self.theta) * Jdata[(k + 1) % self.N]
            if method == "banded":
                from lsafw_tpu.solver.band import factor_auto, plan_for_csr

                if not hasattr(self, "_plan"):
                    self._plan = plan_for_csr(
                        CSRMatrix(pattern, data), real=True
                    )
                blu, _ = factor_auto(
                    self._plan, data, diag_slots=pattern.diag_slots
                )
                self._facs.append((blu, CSRMatrix(pattern, data)))
            else:
                import scipy.sparse as sp

                A = sp.csr_matrix(
                    (np.asarray(data), pattern.indices, pattern.indptr),
                    shape=pattern.shape,
                )
                self._facs.append(SparseLU(A.tocsc()))
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
            "(pass inexact=True for one mean-matrix factor instead).",
            fac_bytes / 1e9, self.N,
        )

    def _init_inexact(self, Jdata, Md) -> None:
        """One factor of the cycle-mean implicit matrix as the shared
        preconditioner; per-snapshot implicit data is rebuilt on the
        fly from the stored Jacobians (an axpy, no second stack)."""
        mean_J = Jdata[0]
        for Jk in Jdata[1:]:
            mean_J = mean_J + Jk
        data_mean = Md - (self.dt * self.theta) * (mean_J / self.N)
        self._facs = None
        if self.method == "banded":
            from lsafw_tpu.solver.band import factor_auto, plan_for_csr

            self._plan = plan_for_csr(
                CSRMatrix(self._pattern, data_mean), real=True)
            blu, _ = factor_auto(
                self._plan, data_mean,
                diag_slots=self._pattern.diag_slots)
            self._fac_mean = blu
            import jax as _jax

            fac_bytes = sum(
                leaf.nbytes for leaf in _jax.tree_util.tree_leaves(blu)
                if hasattr(leaf, "nbytes"))
        else:
            import scipy.sparse as sp

            A = sp.csr_matrix(
                (np.asarray(data_mean), self._pattern.indices,
                 self._pattern.indptr),
                shape=self._pattern.shape,
            )
            self._fac_mean = SparseLU(A.tocsc())
            fac_bytes = self._fac_mean._lu.nnz * 12
        logger.info(
            "Floquet inexact mode: one %.2f GB mean-matrix factor "
            "shared across %d snapshots.", fac_bytes / 1e9, self.N,
        )

    # ------------------------------------------------------------------
    def _imp_data(self, k: int) -> jnp.ndarray:
        """CSR data of step k's implicit matrix M - dt theta J(q_{k+1})
        (an axpy on the stored Jacobian — nothing extra prestored)."""
        return self._Md - (self.dt * self.theta) * self._expl[
            (k + 1) % self.N].data

    def _refine_host(self, A, b, *, tol=1e-12, max_its=200):
        """Host minimal-residual refinement: PC = the mean-matrix LU,
        residual matvecs on the true implicit matrix ``A`` (the host
        twin of :func:`banded_solve_raw`'s loop)."""
        x = self._fac_mean.solve(b)
        r = b - A @ x
        bnorm = max(float(np.linalg.norm(b)), 1e-300)
        for _ in range(max_its):
            if np.linalg.norm(r) <= tol * bnorm:
                break
            d = self._fac_mean.solve(r)
            Ad = A @ d
            alpha = float(Ad @ r) / max(float(Ad @ Ad), 1e-300)
            x += alpha * d
            r -= alpha * Ad
        else:
            logger.warning(
                "Floquet inexact refinement hit max_its (rel res %.2e).",
                np.linalg.norm(r) / bnorm)
        return x

    def _step_lin(self, k: int, v: np.ndarray) -> np.ndarray:
        """One linearized theta-step k -> k+1 on a complex vector."""
        Jv = np.asarray(spmv(self._expl[k], jnp.asarray(v.real))) + 1j * (
            np.asarray(spmv(self._expl[k], jnp.asarray(v.imag)))
        )
        Jv = np.where(np.asarray(self._mom), Jv, 0.0)
        b = (np.asarray(self._M.matvec(jnp.asarray(v.real)))
             + 1j * np.asarray(self._M.matvec(jnp.asarray(v.imag)))
             + self._ew * Jv)
        if self.inexact and self.method != "banded":
            import scipy.sparse as sp

            A = sp.csr_matrix(
                (np.asarray(self._imp_data(k)), self._pattern.indices,
                 self._pattern.indptr),
                shape=self._pattern.shape,
            )
            return (self._refine_host(A, np.ascontiguousarray(b.real))
                    + 1j * self._refine_host(
                        A, np.ascontiguousarray(b.imag)))
        if self.inexact:
            from lsafw_tpu.solver.eigen import BandedSIOp, banded_solve_raw

            op = BandedSIOp(
                A=CSRMatrix(self._pattern, self._imp_data(k)), M=None,
                blu=self._fac_mean,
                sig_re=jnp.asarray(0.0), sig_im=jnp.asarray(0.0))
            xr, xi = banded_solve_raw(
                op, (jnp.asarray(b.real), jnp.asarray(b.imag)),
                tol=1e-11, max_its=120)
            return np.asarray(xr) + 1j * np.asarray(xi)
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

            pattern = self._pattern
            ew, mom = self._ew, self._mom
            M = self._M
            if self.inexact and not hasattr(self, "_jtrip"):
                # one shared factor (a scan ARG, not a per-step xs):
                # implicit data is rebuilt in-scan from the rolled
                # Jacobian stack, so memory is 2 data stacks + 1 factor
                expl_stack = jnp.stack([E.data for E in self._expl])
                next_stack = jnp.roll(expl_stack, -1, axis=0)
                Md, dth = self._Md, self.dt * self.theta

                def trip(expl_s, next_s, blu, vr, vi):
                    def body(carry, xs):
                        vr, vi = carry
                        ed, ed_next = xs
                        E = CSRMatrix(pattern, ed)
                        A = CSRMatrix(pattern, Md - dth * ed_next)
                        br = M.matvec(vr) + ew * jnp.where(mom, spmv(E, vr), 0.0)
                        bi = M.matvec(vi) + ew * jnp.where(mom, spmv(E, vi), 0.0)
                        op = BandedSIOp(
                            A=A, M=None, blu=blu,
                            sig_re=jnp.asarray(0.0), sig_im=jnp.asarray(0.0),
                        )
                        xr, xi = banded_solve_raw(
                            op, (br, bi), tol=1e-11, max_its=120
                        )
                        return (xr, xi), None

                    (vr, vi), _ = jax.lax.scan(
                        body, (vr, vi), (expl_s, next_s)
                    )
                    return vr, vi

                self._jtrip = jax.jit(trip)
                self._stacks = (expl_stack, next_stack, self._fac_mean)
            elif not hasattr(self, "_jtrip"):
                expl_stack = jnp.stack([E.data for E in self._expl])
                blu_stack = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[blu for blu, _ in self._facs],
                )
                imp_stack = jnp.stack([A.data for _, A in self._facs])

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
            a, b_, c = self._stacks
            vr, vi = self._jtrip(a, b_, c, jnp.asarray(v.real),
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

        n = self._pattern.shape[0]
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
