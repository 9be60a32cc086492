"""Cylinder-flow global stability: Hopf onset validation.

The reference's flagship physics result: the leading eigenvalue of the
linearized NS operator crosses into the right half-plane between
Re = 40 and Re = 50 (Re_c ~ 46-47), with Strouhal frequency
omega ~ 0.72-0.75 (``.examples/eigenvalues.py:36-49``, literature
DOI 10.1115/1.4042737; BASELINE.md).

This test runs a reduced domain ([-10, 30] x [-10, 10]) so it fits CPU
test budgets; domain truncation shifts sigma slightly but preserves the
sign structure and frequency band.  The full-fidelity configuration
(domain [-40, 120] x [-40, 40], reference geometry.toml) runs in
``examples/cylinder_stability.py`` and ``bench.py``.

BCs mirror the reference config exactly (``config_files/2D/cylinder``):
baseflow: inlet Dirichlet (1,0), free-flow Neumann top/bottom, outlet
pressure Dirichlet 0, no-slip cylinder; perturbation: homogeneous
Dirichlet at inlet + cylinder (``bcs_perturbation.toml``).
"""

import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig, CylinderFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.solver.baseflow import BaseFlowSolver, compute_drag, compute_recirculation_length
from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType

INLET, OUTLET, BOTTOM, TOP, CYLINDER = 1, 2, 3, 4, 5


def build_cylinder_case(x_range=(-10.0, 30.0), y_range=(-10.0, 10.0),
                        res=1.0, res_cyl=0.25, influence=8.0, seed=0):
    cfg = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=x_range, y_range=y_range, resolution=res,
        resolution_around_cylinder=res_cyl, influence_radius=influence,
    )
    mesh = cylinder_flow_mesh(cfg, max_iter=120, seed=seed)

    def marker(x):
        out = np.full(x.shape[0], CYLINDER, dtype=np.int32)
        out[np.isclose(x[:, 1], y_range[0], atol=1e-6)] = BOTTOM
        out[np.isclose(x[:, 1], y_range[1], atol=1e-6)] = TOP
        out[np.isclose(x[:, 0], x_range[0], atol=1e-6)] = INLET
        out[np.isclose(x[:, 0], x_range[1], atol=1e-6)] = OUTLET
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs_base = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=BOTTOM, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=TOP, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=CYLINDER, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=CYLINDER, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    ctx = AssemblyContext.build(spaces)
    return mesh, spaces, bcs_base, bcs_pert, ctx


def leading_eigenvalue(mesh, ctx, bcs_pert, baseflow, re, target):
    asm = LinearizedNavierStokesAssembler(baseflow, ctx, re, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    es = EigenSolver(A, M, EigensolverConfig(num_eig=3, atol=1e-9, ncv=36))
    es.set_st_type(STType.SINVERT)
    es.set_target(target)
    pairs = es.solve()
    # leading = largest growth rate among returned pairs
    return max((p[0] for p in pairs), key=lambda s: s.real)


@pytest.fixture(scope="module")
def cylinder_case():
    return build_cylinder_case()


@pytest.mark.slow
def test_cylinder_baseflow_diagnostics(cylinder_case):
    mesh, spaces, bcs_base, _, ctx = cylinder_case
    solver = BaseFlowSolver(ctx, mesh, bcs_base, re=40.0)
    w = solver.solve(ramp=True, steps=3, tol=1e-8, max_it=40)
    # recirculation bubble behind the cylinder: ~2.2 diameters at Re=40
    L = compute_recirculation_length(ctx, w)
    assert 1.5 < L < 4.0, L
    # drag coefficient ~1.5 at Re=40 (literature); traction gives Fx = Cd/2
    # per unit diameter with U=1, d=1: Cd = 2 Fx
    cd = 2.0 * compute_drag(ctx, mesh, w, re=40.0, cylinder_marker=CYLINDER)
    assert 1.2 < cd < 2.0, cd


@pytest.mark.slow
def test_cylinder_hopf_crossing(cylinder_case):
    """sigma_r < 0 at Re=40, > 0 at Re=60; omega in the literature band."""
    mesh, spaces, bcs_base, bcs_pert, ctx = cylinder_case
    sigmas = {}
    for re, target in ((40.0, -0.03 + 0.72j), (60.0, 0.05 + 0.744j)):
        solver = BaseFlowSolver(ctx, mesh, bcs_base, re=re)
        w = solver.solve(ramp=True, steps=4, tol=1e-8, max_it=40)
        sigmas[re] = leading_eigenvalue(mesh, ctx, bcs_pert, w, re, target)
    s40, s60 = sigmas[40.0], sigmas[60.0]
    assert s40.real < 0.0, s40
    assert s60.real > 0.0, s60
    assert 0.6 < abs(s40.imag) < 0.9, s40
    assert 0.6 < abs(s60.imag) < 0.9, s60
