"""Newton/baseflow tests.

Poiseuille flow solves stationary NS exactly (convection vanishes), so
the Newton solver must land on the Stokes solution in one step; the
lid-driven cavity exercises genuine nonlinearity + the Reynolds ramp.
"""

import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh, unit_square
from lsafw_tpu.meshing.tags import facets_with_marker, mark_boundary_facets
from lsafw_tpu.solver.baseflow import BaseFlowSolver, compute_recirculation_length

INLET, OUTLET, WALL, LID = 1, 2, 3, 4


def make_channel(nx=12, ny=6):
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), nx, ny)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = INLET
        out[np.isclose(x[:, 0], 2.0)] = OUTLET
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(
        mesh,
        spaces,
        [BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0))],
    )
    dofs = spaces.velocity.dofs_on_facets(facets_with_marker(mesh, INLET))
    coords = spaces.velocity.dof_coords[dofs]
    comp = dofs % 2
    prof = np.stack([coords[:, 1] * (1 - coords[:, 1]), np.zeros(len(coords))], axis=1)
    bcs.dirichlet_mask[dofs] = True
    bcs.dirichlet_values[dofs] = prof[np.arange(dofs.size), comp]
    return mesh, spaces, bcs


def test_ns_poiseuille_exact():
    mesh, spaces, bcs = make_channel()
    ctx = AssemblyContext.build(spaces)
    solver = BaseFlowSolver(ctx, mesh, bcs, re=50.0)
    w = solver.solve(tol=1e-12, max_it=10)
    u_exact = spaces.velocity.interpolate(
        lambda p: np.stack([p[:, 1] * (1 - p[:, 1]), np.zeros(p.shape[0])], axis=1)
    )
    u, p = spaces.split(w)
    assert np.abs(u.ravel() - u_exact).max() < 1e-9
    # pressure gradient dp/dx = -2/Re
    p_exact = spaces.pressure.interpolate(lambda x: 2.0 * (2.0 - x[:, 0]) / 50.0)
    assert np.abs(p - p_exact).max() < 1e-8


def test_lid_driven_cavity_converges():
    mesh = unit_square(10)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 1], 1.0)] = LID
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(
        mesh,
        spaces,
        [
            BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0)),
            BoundaryConditionsConfig(marker=LID, type="dirichlet_velocity", value=(1.0, 0.0)),
        ],
    )
    # cavity has no pressure BC: pin one pressure DOF to fix the constant
    pin = spaces.dofs_p[0]
    bcs.dirichlet_mask[pin] = True
    bcs.dirichlet_values[pin] = 0.0
    ctx = AssemblyContext.build(spaces)
    solver = BaseFlowSolver(ctx, mesh, bcs, re=100.0)
    w = solver.solve(ramp=True, steps=3, tol=1e-10, max_it=30)
    u, p = spaces.split(w)
    # qualitative checks: primary vortex -> negative u_x near bottom,
    # velocity bounded by lid speed
    assert np.abs(u).max() <= 1.0 + 1e-8
    assert u[:, 0].min() < -0.05
    assert abs(p[0]) < 1e-12
    # recirculation detection works on the cavity flow
    assert compute_recirculation_length(ctx, w) > 0.0


def test_newton_quadratic_convergence():
    mesh, spaces, bcs = make_channel(8, 4)
    ctx = AssemblyContext.build(spaces)
    from lsafw_tpu.models.navier_stokes import StationaryNavierStokesAssembler
    from lsafw_tpu.solver.newton import NewtonSolver

    asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
    newton = NewtonSolver(asm)
    w0 = np.zeros(spaces.num_dofs)
    res = newton.solve(w0, 20.0, max_it=20, tol=1e-12)
    assert res.converged
    # quadratic contraction visible in the residual history tail
    h = res.history
    assert len(h) >= 3
    assert h[-1] < 1e-12 or h[-1] < 1e-6 * h[-2]


def test_ramp_resume_from_checkpoint(tmp_path):
    """In-ramp checkpoint/resume (beyond the reference: SURVEY section 5
    notes its ramps restart from scratch): a rerun with the same cache
    key resumes from the last completed ramp step, and the resumed
    result matches the uninterrupted one."""
    from lsafw_tpu.utils.cache import CacheStore

    mesh, spaces, bcs = make_channel()
    ctx = AssemblyContext.build(spaces)
    cache = CacheStore(tmp_path)

    w_full = BaseFlowSolver(ctx, mesh, bcs, re=40.0).solve(
        ramp=True, steps=3, tol=1e-9, max_it=30, cache=cache, key="bf")
    # ramp step checkpoints exist
    assert cache.load_array("bf.ramp2_40") is not None

    # simulate an interrupted run: final key missing, steps 0-1 cached
    cache2 = CacheStore(tmp_path / "partial")
    for i, re in enumerate([1.0, 20.5]):
        arr = cache.load_array(f"bf.ramp{i}_{re:.6g}")
        assert arr is not None
        cache2.save_array(f"bf.ramp{i}_{re:.6g}", arr)
    w_res = BaseFlowSolver(ctx, mesh, bcs, re=40.0).solve(
        ramp=True, steps=3, tol=1e-9, max_it=30, cache=cache2, key="bf")
    np.testing.assert_allclose(np.asarray(w_res), np.asarray(w_full),
                               rtol=1e-8, atol=1e-10)


def test_interpolate_state_mesh_sequencing():
    """Mesh-sequenced continuation guess (solver/baseflow.py): the
    coarse channel baseflow interpolates onto a finer mesh to
    interpolation accuracy, and same-mesh transfer is exact."""
    import numpy as np

    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.solver.baseflow import interpolate_state

    def make(nx, ny):
        mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), nx, ny)
        mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], np.int32))
        return define_spaces(mesh)

    sc, sf = make(8, 4), make(20, 10)
    # analytic Poiseuille state: u = (4y(1-y), 0), p = 8(2-x)/Re-ish
    def state(spaces):
        y = spaces.velocity.node_coords[:, 1]
        u = np.stack([4 * y * (1 - y), np.zeros_like(y)], axis=1)
        p = 2.0 - spaces.pressure.node_coords[:, 0]
        return spaces.combine(u, p)

    wc = state(sc)
    # same-mesh transfer is (near) exact
    w_same = interpolate_state(wc, sc, sc)
    np.testing.assert_allclose(w_same, wc, atol=1e-12)
    # coarse -> fine: linear-in-p exact, quadratic-in-u to O(h^2)
    wf = interpolate_state(wc, sc, sf)
    ref = state(sf)
    uf, pf = sf.split(wf)
    ur, pr = sf.split(ref)
    np.testing.assert_allclose(pf, pr, atol=1e-10)
    assert np.abs(uf - ur).max() < 0.02  # h^2 interpolation error


def test_interpolation_matrix_matches_interpolate_state():
    """P @ w == interpolate_state(w): the sparse prolongation used by
    the two-grid shift-invert preconditioner."""
    import numpy as np

    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.solver.baseflow import (
        interpolate_state, interpolation_matrix,
    )

    def make(nx, ny):
        mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), nx, ny)
        mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], np.int32))
        return define_spaces(mesh)

    sc, sf = make(7, 3), make(17, 9)
    rng = np.random.default_rng(5)
    w = rng.standard_normal(sc.num_dofs)
    P = interpolation_matrix(sc, sf)
    assert P.shape == (sf.num_dofs, sc.num_dofs)
    np.testing.assert_allclose(
        P @ w, interpolate_state(w, sc, sf), atol=1e-10)
