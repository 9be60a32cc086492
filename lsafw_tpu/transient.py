"""Transient (non-modal) growth: optimal initial-perturbation gain G(T).

The second half of the non-modal toolbox (with :mod:`lsafw_tpu.resolvent`;
both beyond the reference's modal analyses): the largest kinetic-energy
amplification any initial condition can achieve by time ``T`` under the
linearized dynamics ``M dq/dt = A q``,

    G(T) = max_{q0}  ||q(T)||_E^2 / ||q0||_E^2 ,

with the energy norm ``||q||_E^2 = q^H M q`` and ``q0`` supported on
free velocity DOFs.  Stable flows with non-normal operators (every
shear flow) show G >> 1 transients — the standard bypass-transition
diagnostic.

Discretization: Crank-Nicolson.  One CN step is a *Cayley transform*

    q_{n+1} = (M - dt/2 A)^-1 (M + dt/2 A) q_n
            = -(A - s M)^-1 (A + s M) q_n,   s = 2/dt,

which is exactly the antishift apply the eigensolver machinery already
implements (``ShiftInvertOperator(..., antishift=s)``): a REAL shift,
so the banded device path factors one single-channel (half-memory)
band per propagator and reuses it for every step and every Lanczos
iteration.  The adjoint propagator rides the shared transposed pattern
(``ops/sparse.transpose_pair``) — one more real factorization.

The gain operator  T = P^T (S^H)^N M S^N P  is real symmetric PSD;
its leading W-generalized eigenpairs (W = P^T M P) come from the same
W-weighted Lanczos as the resolvent gains.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.ops.sparse import CSRMatrix, transpose_pair
from lsafw_tpu.resolvent import w_weighted_gains
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class GrowthResult:
    """``gain`` is G(T) (energy ratio); ``initial``/``final`` are the
    optimal perturbation and its evolved state, unit initial energy."""

    horizon: float
    n_steps: int
    gains: np.ndarray  # (k,) descending energy gains
    initials: np.ndarray  # (k, n) real
    finals: np.ndarray  # (k, n) real


class TransientGrowthSolver:
    """Optimal-growth solver over the (A, M) eigensystem pair.

    Args mirror :class:`lsafw_tpu.resolvent.ResolventSolver`; the
    propagator is built per ``(horizon, n_steps)`` in :meth:`solve`.
    """

    def __init__(
        self,
        A: CSRMatrix,
        M: CSRMatrix,
        num_velocity_dofs: int,
        dirichlet_mask: np.ndarray,
        *,
        method: str = "lu",
        elements=None,
    ) -> None:
        self.A = A
        self.M = M
        self.method = method
        self._elements = elements
        self._n = A.shape[0]
        fmask = np.zeros(self._n, dtype=bool)
        fmask[:num_velocity_dofs] = True
        fmask &= ~np.asarray(dirichlet_mask, dtype=bool)
        self._fdofs = np.nonzero(fmask)[0]
        if self._fdofs.size == 0:
            raise ValueError("no free velocity DOFs")
        self._Ms = M.to_scipy().tocsr()
        self._W = self._Ms[self._fdofs][:, self._fdofs].tocsc()
        self._At, self._Mt = transpose_pair(A, M)

    # ------------------------------------------------------------------
    def _propagators(self, dt: float):
        """(forward, adjoint) one-step operators.

        Forward CN step S = (M - dt/2 A)^-1 (M + dt/2 A) is minus the
        Cayley apply.  The TRUE adjoint is the product in the REVERSED
        order, S^H = (M + dt/2 A)^T (M - dt/2 A)^-T = -(A^T + s M^T)
        (A^T - s M^T)^-1 (solve first, multiply after) — the two orders
        agree only if A and M commute, so the adjoint cannot reuse the
        Cayley apply."""
        from lsafw_tpu.solver.eigen import ShiftInvertOperator

        s = 2.0 / float(dt)
        if not hasattr(self, "_prop_cache"):
            self._prop_cache = {}
        key = round(s, 12)
        if key not in self._prop_cache:
            fw = ShiftInvertOperator(
                self.A, self.M, s, method=self.method, antishift=s,
                elements=self._elements,
            )
            ad = ShiftInvertOperator(
                self._At, self._Mt, s, method=self.method, elements=None,
            )
            self._prop_cache[key] = (fw, ad)
        fw, ad = self._prop_cache[key]
        return fw, ad, s

    def _march(self, op, x: np.ndarray, n_steps: int) -> np.ndarray:
        """Forward: q_{n+1} = -CayleyApply(q_n).

        Banded backend: ONE jitted fori_loop over all steps (the apply
        is traceable) — high-latency runtimes pay one dispatch per
        march instead of one per step."""
        import jax

        from lsafw_tpu.solver.eigen import banded_si_apply

        if op.method == "banded":
            if not hasattr(op, "_jmarch"):
                op._jmarch = jax.jit(
                    lambda dop, xr, k: jax.lax.fori_loop(
                        0, k,
                        lambda i, st: tuple(
                            -c for c in banded_si_apply(
                                dop, st, tol=op._inner_tol,
                                max_its=op.refine_its)),
                        (xr, jnp.zeros_like(xr)),
                    )[0],
                    static_argnames=("k",),
                )
            return np.asarray(op._jmarch(op.device_op, jnp.asarray(x), n_steps))
        xr = jnp.asarray(x)
        zi = jnp.zeros_like(xr)
        for _ in range(n_steps):
            yr, _ = op.apply((xr, zi))
            xr = -yr
        return np.asarray(xr)

    def _march_adjoint(self, ad, s: float, x: np.ndarray, n_steps: int) -> np.ndarray:
        """Adjoint: z_{n+1} = -(A^T + s M^T) (A^T - s M^T)^-1 z_n."""
        import jax

        from lsafw_tpu.ops.sparse import spmv
        from lsafw_tpu.solver.eigen import banded_solve_raw

        if ad.method == "banded":
            if not hasattr(ad, "_jmarch_adj"):
                def step(dop, At, Mt, st):
                    yr, _ = banded_solve_raw(
                        dop, st, tol=ad._inner_tol, max_its=ad.refine_its)
                    zr = -(spmv(At, yr) + s * spmv(Mt, yr))
                    return (zr, jnp.zeros_like(zr))

                ad._jmarch_adj = jax.jit(
                    lambda dop, At, Mt, xr, k: jax.lax.fori_loop(
                        0, k, lambda i, st: step(dop, At, Mt, st),
                        (xr, jnp.zeros_like(xr)),
                    )[0],
                    static_argnames=("k",),
                )
            return np.asarray(
                ad._jmarch_adj(ad.device_op, self._At, self._Mt,
                               jnp.asarray(x), n_steps))
        xr = jnp.asarray(x)
        zi = jnp.zeros_like(xr)
        for _ in range(n_steps):
            yr, _ = ad.solve_raw((xr, zi))
            xr = -(spmv(self._At, yr) + s * spmv(self._Mt, yr))
        return np.asarray(xr)

    # ------------------------------------------------------------------
    def solve(
        self, horizon: float, n_steps: int, k: int = 1, *, tol: float = 1e-8
    ) -> GrowthResult:
        """Leading ``k`` optimal gains over ``[0, horizon]`` with
        ``n_steps`` CN steps (dt = horizon / n_steps); ``k`` is
        clamped to the forcing-subspace size."""
        k = min(int(k), self._fdofs.size)
        dt = float(horizon) / int(n_steps)
        fw, ad, s = self._propagators(dt)

        def apply_T(fc: np.ndarray) -> np.ndarray:
            x = np.zeros(self._n)
            x[self._fdofs] = fc.real
            q = self._march(fw, x, n_steps)
            z = self._march_adjoint(ad, s, self._Ms @ q, n_steps)
            return z[self._fdofs]

        gam, F = w_weighted_gains(
            apply_T, self._W, k, tol=tol, dtype=np.float64
        )
        gains = np.maximum(gam, 0.0)
        initials = np.zeros((k, self._n))
        finals = np.zeros((k, self._n))
        for j in range(k):
            q0 = np.zeros(self._n)
            q0[self._fdofs] = F[:, j]
            e0 = float(q0 @ (self._Ms @ q0))
            q0 /= np.sqrt(e0)
            initials[j] = q0
            finals[j] = self._march(fw, q0, n_steps)
        logger.info(
            "Transient growth T=%.3f (%d CN steps): G = %s",
            horizon, n_steps, np.array2string(gains, precision=4),
        )
        return GrowthResult(float(horizon), int(n_steps), gains, initials, finals)

    def growth_curve(
        self, horizons, n_steps: int, k: int = 1, *, tol: float = 1e-8
    ) -> list[GrowthResult]:
        """G(T) over several horizons.  Factorization pairs are cached
        per dt = T/n_steps, so horizons scaled with ``n_steps`` (or
        repeated dt values) reuse their factors."""
        return [self.solve(float(T), n_steps, k=k, tol=tol) for T in horizons]
