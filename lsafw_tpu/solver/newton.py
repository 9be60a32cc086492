"""Damped Newton for stationary Navier-Stokes.

TPU-native counterpart of the reference's SNES Newton
(``Solver/nonlinear2.py:40-153``: newtonls + basic line search with
damping, GMRES+LU inner solve).  The state ``w`` always satisfies the
Dirichlet data exactly, so the update solves J(w) dw = -F(w) with
identity BC rows and F[bc] = 0 (the lifting semantics of
``Solver/nonlinear2.py:84-107``).

Inner solves: host direct LU (the reference's MUMPS role), the
device-resident blocked band LU (``linear_solver="banded"`` — the
sparsity pattern is fixed across Newton iterations, so each
refactorization is one on-device scatter + factorization through a
shared :class:`~lsafw_tpu.solver.band.BandPlan`), or any jitted Krylov
method from :mod:`lsafw_tpu.solver.linear` with a block-Jacobi
preconditioner.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.models.navier_stokes import StationaryNavierStokesAssembler
from lsafw_tpu.solver.direct import SparseLU
from lsafw_tpu.solver.linear import solve_csr
from lsafw_tpu.solver.precond import block_jacobi_array
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@partial(jax.jit, static_argnames=("tol", "max_its", "m"))
def _banded_mr(J, blu, b, Jop=None, *, tol, max_its: int = 300, m: int = 8):
    """Truncated GCR(m) on the real Jacobian with the f32 banded
    preconditioner: each step orthogonalizes the new search direction's
    image against the last ``m`` kept images, so the residual is
    minimized over a genuine Krylov window (m=1 degenerates to the
    round-3 minimal-residual refinement, whose one-direction contraction
    stalls when the band is budget-TRUNCATED or bf16 — measured 500k
    Stokes: 9e-3 / 2e-1 at the old 60-iteration cap).  Fixed (m, n)
    direction buffers keep the while_loop memory bounded (a full GMRES
    wrapper inlines the band solve at 4+ call sites and OOMs at 10 GB
    bands).  ``Jop``: optional BCSR operator for the residual matvecs
    (slice-gathered blocks instead of the scalar-gather ELL path)."""
    from lsafw_tpu.ops.dots import ddot
    from lsafw_tpu.ops.sparse import spmv
    from lsafw_tpu.solver.linear import SolveResult

    if Jop is not None:
        def jmv(v):
            return Jop.matvec(v)
    else:
        def jmv(v):
            return spmv(J, v)

    def bsolve(v):
        # real factors (RealBandedLU / RealPivotedBandedLU) solve one
        # column; pair factors ride a zero imag channel
        if hasattr(blu, "solve_vec"):
            return blu.solve_vec(v)
        x, _ = blu.solve_pair(v, jnp.zeros_like(v))
        return x

    bnorm = jnp.maximum(jnp.sqrt(ddot(b, b)), 1e-300)
    x = bsolve(b)
    r = b - jmv(x)
    n = b.shape[0]
    D = jnp.zeros((m, n))   # kept directions (image-orthonormalized)
    CD = jnp.zeros((m, n))  # their Jacobian images

    def cond(st):
        _, r, _, _, k = st
        rn = jnp.sqrt(ddot(r, r))
        # exit on non-finite residuals (overflowed factor) so the
        # caller's converged flag triggers the fallback path
        return jnp.isfinite(rn) & (rn > tol * bnorm) & (k < max_its)

    def body(st):
        x, r, D, CD, k = st
        d = bsolve(r)
        Cd = jmv(d)
        # orthogonalize Cd against the kept images (CGS, zero rows of
        # CD contribute nothing)
        beta = CD @ Cd
        Cd = Cd - CD.T @ beta
        d = d - D.T @ beta
        nrm = jnp.sqrt(ddot(Cd, Cd))
        safe = jnp.maximum(nrm, 1e-300)
        dn, Cdn = d / safe, Cd / safe
        alpha = ddot(Cdn, r)
        x = x + alpha * dn
        r = r - alpha * Cdn
        slot = jnp.mod(k, m)
        D = jax.lax.dynamic_update_index_in_dim(D, dn, slot, 0)
        CD = jax.lax.dynamic_update_index_in_dim(CD, Cdn, slot, 0)
        return x, r, D, CD, k + 1

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x, r, D, CD, jnp.int32(0)))
    res = jnp.sqrt(ddot(r, r)) / bnorm
    return SolveResult(x, k, res, res <= tol)


@dataclass
class NewtonResult:
    w: np.ndarray
    iterations: int
    residual_norm: float
    converged: bool
    history: list[float]


class NewtonSolver:
    """Newton with adjustable damping (parity: ``NewtonSolver``,
    ``Solver/nonlinear2.py:40-78``)."""

    def __init__(
        self,
        assembler: StationaryNavierStokesAssembler,
        *,
        damping: float = 1.0,
        linear_solver: str = "lu",
        linear_tol: float = 1e-10,
    ) -> None:
        self._asm = assembler
        self._damping = damping
        self._linear_solver = linear_solver
        self._linear_tol = linear_tol
        self._band_plan = None  # built lazily on the Jacobian pattern
        self._banded_ok = True  # sticky: one failed factor -> stay on LU

    def _masked_residual(self, w: jnp.ndarray, re: float) -> jnp.ndarray:
        F = self._asm.residual(w, re)
        return jnp.where(self._asm.bc_mask, 0.0, F)

    def _banded_solve(self, J, b: jnp.ndarray) -> jnp.ndarray:
        """Device band LU (f32) + f64 refinement on the real Jacobian.

        The plan (RCM order, band geometry, scatter positions) is built
        once on J's pattern and reused every iteration — refactorizing
        is one on-device scatter + the factorization.
        """
        from lsafw_tpu.solver.band import factor_auto, plan_for_csr

        if self._banded_ok:
            if self._band_plan is None:
                # the Jacobian is real: single-channel band (half the
                # memory/traffic of the complex-pair factor)
                self._band_plan = plan_for_csr(J, real=True)
            blu, pivoted = factor_auto(
                self._band_plan, J.data, diag_slots=J.pattern.diag_slots
            )
            # BCSR residual matvecs when the block storage fits (refill
            # per iteration is one device scatter on the shared plan)
            from lsafw_tpu.ops.bcsr import operator_for_budget

            Jop = operator_for_budget(J)
            res = _banded_mr(J, blu, b, Jop, tol=self._linear_tol)
            if bool(res.converged) and bool(np.isfinite(np.asarray(res.x)).all()):
                return res.x
            if float(res.residual) < 1e-3 and bool(
                    np.isfinite(np.asarray(res.x)).all()):
                # INEXACT Newton acceptance (forcing-term theory): the
                # outer |F| criterion alone decides convergence, so a
                # 1e-3-grade step is productive — rejecting it cost an
                # 18-minute host LU per iteration at 500k
                logger.info(
                    "Accepting inexact banded Newton step (rel res %.1e).",
                    float(res.residual))
                return res.x
            if self._band_plan.band_dtype == "bf16":
                # bf16 full-width factors go unstable under pivot-free
                # elimination growth at production sizes (measured 500k:
                # stall/nan); retry with a budget-truncated f32 band —
                # narrower but numerically sound, MR absorbs the
                # truncation against the true operator
                logger.warning(
                    "bf16 full-width band failed (rel res %.2e); retrying "
                    "with a budget-truncated f32 band", float(res.residual))
                del blu, res  # free the failed band BEFORE the new fill
                from lsafw_tpu.solver.band import mark_bf16_unstable

                mark_bf16_unstable(J.pattern)
                self._band_plan = plan_for_csr(J, real=True, force_f32=True)
                blu, _ = factor_auto(
                    self._band_plan, J.data, diag_slots=J.pattern.diag_slots)
                res = _banded_mr(J, blu, b, Jop, tol=self._linear_tol)
                if bool(res.converged) and bool(
                        np.isfinite(np.asarray(res.x)).all()):
                    return res.x
                if float(res.residual) < 1e-3 and bool(
                        np.isfinite(np.asarray(res.x)).all()):
                    logger.info(
                        "Accepting inexact banded Newton step "
                        "(rel res %.1e).", float(res.residual))
                    return res.x
            # pivot-free f32 factors can overflow or precondition badly
            # on unlucky operators; degrade to the host direct solve for
            # the REST of this Newton solve rather than paying a failed
            # banded attempt per iteration (the reference's MUMPS ->
            # SuperLU -> default-PC chain, Solver/eigen2.py:127-150)
            logger.warning(
                "Banded MR solve failed (rel res %.2e); degrading this "
                "Newton solve to host LU", float(res.residual),
            )
            self._banded_ok = False
        return jnp.asarray(SparseLU(J).solve(np.asarray(b)))

    def solve(
        self,
        w0: np.ndarray | jnp.ndarray,
        re: float,
        *,
        max_it: int = 50,
        tol: float = 1e-6,
    ) -> NewtonResult:
        """Iterate to the steady state (parity: ``solve``,
        ``Solver/nonlinear2.py:78-153`` incl. divergence -> warning +
        partial result instead of raising)."""
        asm = self._asm
        # enforce Dirichlet data on the initial state
        w = jnp.asarray(np.where(asm.bcs.dirichlet_mask, asm.bcs.dirichlet_values, np.asarray(w0)))
        history: list[float] = []
        converged = False
        it = 0
        for it in range(1, max_it + 1):
            F = self._masked_residual(w, re)
            rnorm = float(jnp.linalg.norm(F))
            history.append(rnorm)
            if not np.isfinite(rnorm):
                logger.warning("Newton residual is not finite; aborting at it %d", it)
                break
            if rnorm < tol:
                converged = True
                break
            J = asm.jacobian(w, re)
            if self._linear_solver == "lu":
                dw = jnp.asarray(SparseLU(J).solve(-np.asarray(F)))
            elif self._linear_solver == "banded":
                dw = self._banded_solve(J, -F)
            else:
                pc = block_jacobi_array(J, block_size=64)
                res = solve_csr(
                    J, -F, pc,
                    ksp_type=self._linear_solver, pc_kind="bjacobi",
                    tol=self._linear_tol, maxiter=5000,
                )
                if not bool(res.converged):
                    logger.warning(
                        "Inner %s solve stalled (res=%.2e) at Newton it %d",
                        self._linear_solver, float(res.residual), it,
                    )
                dw = res.x
            if not np.isfinite(np.asarray(dw)).all():
                logger.warning("Newton update is not finite; aborting at it %d", it)
                break
            w = w + self._damping * dw
            logger.debug("Newton it %d: |F| = %.3e", it, rnorm)
        else:
            it = max_it
        rfinal = float(jnp.linalg.norm(self._masked_residual(w, re)))
        if rfinal < tol:
            converged = True
        if not converged:
            logger.warning(
                "Newton did not converge in %d iterations (|F| = %.3e); "
                "returning partial result", it, rfinal,
            )
        return NewtonResult(
            w=np.asarray(w),
            iterations=it,
            residual_norm=rfinal,
            converged=converged,
            history=history,
        )
