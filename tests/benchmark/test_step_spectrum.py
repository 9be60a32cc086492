"""Backward-facing-step: multi-mode complex spectrum via Krylov-Schur.

BASELINE.json config 3: "2D backward-facing step: 20-mode complex
spectrum via Krylov-Schur with restarts".  The step flow at moderate Re
is globally stable — all 20 modes must have negative growth rates —
and the spectrum exercises deflation/restarts (ncv < 3*nev forces
multiple Krylov-Schur restarts).
"""

import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig, StepFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import step_flow_mesh
from lsafw_tpu.meshing.tags import facets_with_marker, mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.solver.baseflow import BaseFlowSolver, compute_recirculation_length
from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType, eigen_residuals

INLET, OUTLET, WALL = 1, 2, 3


@pytest.mark.slow
def test_step_20_mode_spectrum():
    cfg = StepFlowGeometryConfig(
        dim=2, inlet_length=5.0, step_height=1.0, outlet_length=15.0,
        channel_height=1.0, resolution=0.22, refinement_factor=2.0,
    )
    mesh = step_flow_mesh(cfg, max_iter=100)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 0], -5.0)] = INLET
        out[np.isclose(x[:, 0], 15.0)] = OUTLET
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
    ])
    # parabolic inlet profile on the upper channel y in [0, 1]
    dofs = spaces.velocity.dofs_on_facets(facets_with_marker(mesh, INLET))
    coords = spaces.velocity.dof_coords[dofs]
    comp = dofs % 2
    prof = 4.0 * coords[:, 1] * (1.0 - coords[:, 1])
    bcs.dirichlet_mask[dofs] = True
    bcs.dirichlet_values[dofs] = np.where(comp == 0, np.clip(prof, 0.0, None), 0.0)
    ctx = AssemblyContext.build(spaces)

    re = 150.0
    w = BaseFlowSolver(ctx, mesh, bcs, re=re).solve(ramp=True, steps=4, tol=1e-9, max_it=40)
    # the step recirculation bubble: x_r/h ~ 4-7 at Re=150 (literature
    # for expansion ratio 2, Re based on step height)
    L = compute_recirculation_length(ctx, w)
    assert 1.0 < L < 12.0, L

    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    asm = LinearizedNavierStokesAssembler(w, ctx, re, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()

    nev = 20
    es = EigenSolver(A, M, EigensolverConfig(num_eig=nev, atol=1e-9, ncv=45))
    es.set_st_type(STType.SINVERT)
    es.set_target(0.0 + 0.0j)
    pairs = es.solve()
    assert len(pairs) == nev
    sig = np.array([p[0] for p in pairs])
    # step flow at Re=150 is globally stable: every mode decays
    assert (sig.real < 0.0).all(), sig[sig.real >= 0]
    # complex-conjugate symmetry of the real operator's spectrum:
    # every complex mode's conjugate is also (approximately) present
    # (back-transform amplifies theta noise for modes far from the
    # shift, so classify/compare with a matching tolerance)
    cplx = sig[np.abs(sig.imag) > 1e-4]
    for s in cplx:
        d = np.abs(sig - np.conj(s)).min()
        assert d < 1e-4 * max(1.0, abs(s)), (s, d)
    # all returned pairs are true eigenpairs
    res = eigen_residuals(A, M, pairs)
    assert res.max() < 1e-6, res.max()
