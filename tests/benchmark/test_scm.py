"""Self-consistent model: marginality and frequency-shift gates.

On a coarse supercritical cylinder the SCM must drive the mean-flow
eigenvalue to (near) marginality and shift the frequency UP from the
Hopf value toward the saturated one (the RZIF/DNS-validated direction;
the quantitative 0.4%-of-DNS match is recorded from the finer mesh in
doc/scm_re60_small.json).
"""

import numpy as np
import pytest

from lsafw_tpu.config import (
    CylinderFlowGeometryConfig,
    BoundaryConditionsConfig,
)
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.scm import SelfConsistentModel, scm_continuation
from lsafw_tpu.solver.baseflow import BaseFlowSolver

from tests.benchmark.test_unsteady import _marker, INLET, OUTLET, BOTTOM, TOP, CYL

RE = 60.0


@pytest.fixture(scope="module")
def coarse_cylinder():
    geo = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-6.0, 16.0), y_range=(-5.0, 5.0), resolution=0.65,
        resolution_around_cylinder=0.22, influence_radius=4.0,
    )
    mesh = cylinder_flow_mesh(geo, max_iter=80, seed=0)
    mark_boundary_facets(mesh, _marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=BOTTOM, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=TOP, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    return ctx, mesh, bcs, bcs_pert


def test_scm_marginality_and_frequency_shift(coarse_cylinder):
    ctx, mesh, bcs, bcs_pert = coarse_cylinder
    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40))

    scm = SelfConsistentModel(ctx, mesh, bcs, bcs_pert, RE)
    res = scm.solve(w, A0=0.3, tol_sigma=5e-4, max_outer=25)
    assert res.history[0][1] > 5e-3  # supercritical Hopf to begin with
    omega_hopf = res.history[0][2]
    # marginality reached (within the alternation's noise floor)
    assert abs(res.sigma.real) < 2e-3, res.sigma
    # frequency shifted UP toward the saturated value
    assert res.sigma.imag > 1.005 * omega_hopf, (res.sigma, omega_hopf)
    assert res.sigma.imag < 1.3 * omega_hopf
    assert res.amplitude > 0.1 and np.isfinite(res.mean).all()


@pytest.mark.slow
def test_scm_continuation_up_the_curve(coarse_cylinder):
    """Re-continuation: each point warm-starts from the previous
    converged (mean, mode, sigma) and must land on a LARGER amplitude
    (the supercritical Stuart-Landau branch grows with Re)."""
    ctx, mesh, bcs, bcs_pert = coarse_cylinder

    def baseflow_fn(re):
        return np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=re).solve(
            ramp=True, steps=4, tol=1e-10, max_it=40))

    results = scm_continuation(
        ctx, mesh, bcs, bcs_pert, [60.0, 66.0], baseflow_fn,
        tol_sigma=5e-4, max_outer=25)
    (_, r1), (_, r2) = results
    assert r1.converged and r2.converged
    assert r2.amplitude > r1.amplitude > 0.1
    assert abs(r2.sigma.real) < 2e-3, r2.sigma
    # the warm start must actually bite: the second point may not cost
    # more outer iterations than the cold first one
    assert len(r2.history) <= len(r1.history) + 2


@pytest.mark.slow
def test_scm_coupled_newton_high_re(coarse_cylinder):
    """The monolithic coupled Newton closes a strongly supercritical
    point: warm-start from a (possibly wall-limited) alternation solve
    at Re=74 and require full convergence of the bordered system, with
    the amplitude above the Re=60 value and the frequency above the
    Hopf frequency."""
    ctx, mesh, bcs, bcs_pert = coarse_cylinder
    re_hi = 74.0
    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=re_hi).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40))
    scm = SelfConsistentModel(ctx, mesh, bcs, bcs_pert, re_hi,
                              linear_solver="lu")
    res = scm.solve(w, A0=1.5, tol_sigma=5e-4, max_outer=20)
    A0 = res.amplitude_sl or res.amplitude
    assert A0 > 0.5  # the alternation must at least reach the branch
    cres = scm.solve_coupled(res.mean, A0 * res.mode,
                             abs(res.sigma.imag))
    assert cres.converged, cres.history
    assert cres.amplitude > 1.5
    omega_hopf = abs(res.history[0][2])
    assert cres.sigma.imag > omega_hopf
    # second-harmonic balance from the HB1 root: must converge with a
    # nontrivial second harmonic and only shift the fundamental mildly
    hb2 = scm.solve_coupled(cres.mean, cres.amplitude * cres.mode,
                            cres.sigma.imag, harmonics=2)
    assert hb2.converged, hb2.history
    assert hb2.q2 is not None
    A2 = float(np.sqrt(np.real(np.vdot(hb2.q2, scm._Ms @ hb2.q2))))
    assert 0 < A2 < hb2.amplitude  # second harmonic is subdominant
    assert abs(hb2.sigma.imag - cres.sigma.imag) < 0.03 * cres.sigma.imag
