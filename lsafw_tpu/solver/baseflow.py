"""Baseflow (steady Navier-Stokes) driver.

Counterpart of ``Solver/baseflow.py``: Stokes solve as the Newton
initial guess, optional Reynolds ramp 1.0 -> Re, damped Newton per
step, plus the diagnostics (recirculation length, nondimensional drag)
used to validate cylinder baseflows
(``Solver/baseflow.py:63-213``, ``.examples/analyze_baseflow.py``).
"""

from __future__ import annotations

import numpy as np

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import BoundaryConditions
from lsafw_tpu.fem.facets import build_facet_context, traction_force
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.models.navier_stokes import (
    StationaryNavierStokesAssembler,
    StokesAssembler,
)
from lsafw_tpu.solver.direct import direct_solve
from lsafw_tpu.solver.newton import NewtonResult, NewtonSolver
from lsafw_tpu.utils.logging import get_logger, timed

logger = get_logger(__name__)


class BaseFlowSolver:
    """Solves for the base (stationary) flow
    (parity: ``BaseFlowSolver``, ``Solver/baseflow.py:63-154``)."""

    def __init__(
        self,
        ctx: AssemblyContext,
        mesh: Mesh,
        bcs: BoundaryConditions,
        *,
        re: float,
    ) -> None:
        self._ctx = ctx
        self._mesh = mesh
        self._bcs = bcs
        self._re = re
        self._initial_guess: np.ndarray | None = None
        self._ns_assembler: StationaryNavierStokesAssembler | None = None

    def _solve_stokes_flow(self, linear_solver: str = "lu") -> np.ndarray:
        """Stokes flow as Newton initial guess
        (``Solver/baseflow.py:81-90``)."""
        logger.info("Solving Stokes flow as Newton initial guess.")
        A, b = StokesAssembler(self._ctx, self._mesh, self._bcs, re=self._re).get_matrix_forms()
        if linear_solver == "banded":
            # device band LU + GMRES (host SuperLU takes minutes at
            # production sizes); the plan is shared with Newton's
            # Jacobian (same pattern)
            from lsafw_tpu.solver.band import factor_auto, plan_for_csr
            from lsafw_tpu.solver.newton import _banded_mr

            plan = plan_for_csr(A, real=True)  # Stokes operator is real
            blu, _ = factor_auto(plan, A.data, diag_slots=A.pattern.diag_slots)
            from lsafw_tpu.ops.bcsr import operator_for_budget

            Aop = operator_for_budget(A)
            res = _banded_mr(A, blu, b, Aop, tol=1e-10)
            if bool(res.converged):
                return np.asarray(res.x)
            if plan.band_dtype == "bf16":
                # bf16 full-width factors stall at production sizes
                # (measured 500k); retry with a budget-truncated f32 band
                logger.warning(
                    "bf16 Stokes band stalled (res=%.2e); retrying with a "
                    "budget-truncated f32 band", float(res.residual))
                del blu, res  # free the stalled band BEFORE the new fill
                from lsafw_tpu.solver.band import mark_bf16_unstable

                mark_bf16_unstable(A.pattern)
                plan = plan_for_csr(A, real=True, force_f32=True)
                blu, _ = factor_auto(plan, A.data,
                                     diag_slots=A.pattern.diag_slots)
                res = _banded_mr(A, blu, b, Aop, tol=1e-10)
                if bool(res.converged):
                    return np.asarray(res.x)
            logger.warning(
                "Banded Stokes solve stalled (res=%.2e); falling back to host LU",
                float(res.residual),
            )
        return direct_solve(A, np.asarray(b))

    def solve(
        self,
        *,
        ramp: bool = False,
        steps: int = 3,
        max_it: int = 50,
        tol: float = 1e-6,
        damping_factor: float = 1.0,
        linear_solver: str = "lu",
        cache=None,
        key: str | None = None,
    ) -> np.ndarray:
        """Steady NS solve with optional Reynolds ramp
        (parity: ``solve``, ``Solver/baseflow.py:92-154``)."""
        if cache is not None and key is not None:
            cached = cache.load_array(key)
            if cached is not None:
                self._initial_guess = cached
                return cached

        re_ramp = (
            np.linspace(1.0, self._re, steps).tolist()
            if (ramp and steps > 1)
            else [self._re]
        )

        # in-ramp resume (beyond the reference, which restarts ramps
        # from scratch — SURVEY section 5 "no in-solver resume"): each
        # completed ramp step is checkpointed under a step key; a rerun
        # resumes from the last completed step
        start = 0
        if cache is not None and key is not None:
            for i in range(len(re_ramp) - 1, -1, -1):
                ck = cache.load_array(f"{key}.ramp{i}_{re_ramp[i]:.6g}")
                if ck is not None:
                    self._initial_guess = ck
                    start = i + 1
                    logger.info(
                        "Resuming Reynolds ramp from step %d (Re=%.2f).",
                        start, re_ramp[i],
                    )
                    break
        if self._initial_guess is None:
            self._initial_guess = self._solve_stokes_flow(linear_solver)

        if self._ns_assembler is None:
            self._ns_assembler = StationaryNavierStokesAssembler(
                self._ctx, self._mesh, self._bcs
            )
        newton = NewtonSolver(
            self._ns_assembler, damping=damping_factor, linear_solver=linear_solver
        )
        sol = self._initial_guess
        result: NewtonResult | None = None
        for i in range(start, len(re_ramp)):
            re = re_ramp[i]
            logger.info("Solving stationary Navier-Stokes at Re=%.2f", re)
            with timed(logger, f"Newton at Re={re:.1f}"):
                result = newton.solve(sol, re, max_it=max_it, tol=tol)
            sol = result.w
            if cache is not None and key is not None and result.converged:
                cache.save_array(f"{key}.ramp{i}_{re:.6g}", np.asarray(sol))
        if result is not None and not result.converged:
            logger.warning("Final Newton residual %.3e > tol %.1e", result.residual_norm, tol)

        if cache is not None and key is not None:
            cache.save_array(key, sol)
        return sol


def interpolate_state(
    w_coarse: np.ndarray, spaces_coarse, spaces_fine
) -> np.ndarray:
    """Mixed Taylor-Hood state on one mesh -> the same fields sampled
    on another mesh's spaces: the mesh-SEQUENCED continuation initial
    guess (solve the ramp once on a coarse mesh, Newton-polish on the
    fine one — at 500k DOFs this replaces a multi-stage ramp of
    expensive fine-mesh solves with 2-3 Newton steps).  Beyond the
    reference, which restarts every resolution from the Stokes guess
    (``/root/reference/Solver/baseflow.py:81-90``).

    Linear interpolation through the coarse node clouds
    (component-wise for velocity), nearest-neighbor outside the hull.
    """
    import scipy.interpolate as si
    from scipy.spatial import cKDTree

    w_coarse = np.asarray(w_coarse)
    u_c, p_c = spaces_coarse.split(w_coarse)

    def _interp(pts_c, vals_c, pts_f):
        it = si.LinearNDInterpolator(pts_c, vals_c)
        out = np.atleast_2d(np.asarray(it(pts_f)))
        if out.shape[0] == 1 and pts_f.shape[0] != 1:
            out = out.T
        bad = ~np.isfinite(out).all(axis=1)
        if bad.any():
            _, idx = cKDTree(pts_c).query(pts_f[bad])
            out[bad] = np.atleast_2d(vals_c)[idx] if vals_c.ndim > 1 else \
                vals_c[idx][:, None]
        return out

    u_f = _interp(
        spaces_coarse.velocity.node_coords, u_c,
        spaces_fine.velocity.node_coords)
    p_f = _interp(
        spaces_coarse.pressure.node_coords, p_c[:, None],
        spaces_fine.pressure.node_coords)[:, 0]
    return spaces_fine.combine(u_f, p_f)


def point_interpolation_matrix(pts_c: np.ndarray, pts_f: np.ndarray):
    """Sparse P1 barycentric interpolation matrix from one point cloud
    to another (nearest source point outside the hull)."""
    import scipy.sparse as sp
    from scipy.spatial import Delaunay, cKDTree

    tri = Delaunay(pts_c)
    simp = tri.find_simplex(pts_f)
    inside = simp >= 0
    rows, cols, vals = [], [], []
    if inside.any():
        s = simp[inside]
        X = tri.transform[s]  # (m, tdim+1, tdim)
        d = pts_f[inside] - X[:, -1]
        bary = np.einsum("mij,mj->mi", X[:, :-1], d)
        w = np.concatenate([bary, 1.0 - bary.sum(axis=1, keepdims=True)],
                           axis=1)
        verts = tri.simplices[s]
        idx = np.flatnonzero(inside)
        rows.append(np.repeat(idx, verts.shape[1]))
        cols.append(verts.ravel())
        vals.append(w.ravel())
    if (~inside).any():
        _, nn = cKDTree(pts_c).query(pts_f[~inside])
        rows.append(np.flatnonzero(~inside))
        cols.append(nn)
        vals.append(np.ones(nn.shape[0]))
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(pts_f.shape[0], pts_c.shape[0]))


def interpolation_matrix(spaces_coarse, spaces_fine):
    """Sparse mixed-state prolongation P (fine_dofs x coarse_dofs):
    the MATRIX form of :func:`interpolate_state` (P1 barycentric
    weights through the coarse node clouds; nearest coarse node
    outside the hull).  P is the building block of the two-grid
    shift-invert preconditioner (coarse-mesh SI correction for the
    500k+ eigen inner solves) and satisfies
    ``P @ w_coarse == interpolate_state(w_coarse, ...)`` up to
    roundoff.  Returns ``scipy.sparse.csr_matrix``."""
    import scipy.sparse as sp

    _block = point_interpolation_matrix
    Pu = _block(spaces_coarse.velocity.node_coords,
                spaces_fine.velocity.node_coords)
    Pp = _block(spaces_coarse.pressure.node_coords,
                spaces_fine.pressure.node_coords)
    bs = spaces_fine.velocity.bs
    return sp.block_diag(
        [sp.kron(Pu, sp.identity(bs, format="csr"), format="csr"), Pp],
        format="csr")


def compute_recirculation_length(
    ctx: AssemblyContext,
    baseflow: np.ndarray,
    *,
    restrict_to_centreline: bool = False,
    centreline_tol: float = 1e-6,
) -> float:
    """Max x with u_x < 0 (parity: ``compute_recirculation_length``,
    ``Solver/baseflow.py:157-185``)."""
    spaces = ctx.spaces
    u, _ = spaces.split(baseflow)
    coords = spaces.velocity.node_coords
    mask = u[:, 0] < 0.0
    if restrict_to_centreline:
        mask &= np.abs(coords[:, 1]) <= centreline_tol
    if not mask.any():
        raise RuntimeError("No negative u_x found; no recirculation detected.")
    return float(coords[mask, 0].max())


def compute_drag(
    ctx: AssemblyContext,
    mesh: Mesh,
    baseflow: np.ndarray,
    *,
    re: float,
    cylinder_marker: int,
) -> float:
    """Nondimensional drag |Fx| over the tagged boundary
    (parity: ``compute_drag``, ``Solver/baseflow.py:188-213``)."""
    import jax.numpy as jnp

    fc = build_facet_context(ctx, mesh, cylinder_marker)
    fx = traction_force(fc, ctx, jnp.asarray(baseflow), re, direction=0)
    return abs(float(fx))
