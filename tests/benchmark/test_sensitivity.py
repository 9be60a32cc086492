"""Adjoint sensitivity validation against finite differences.

The gold-standard test: d sigma/d Re from the adjoint formula must
match the centered finite difference of the leading eigenvalue across
Re (the reference validates only qualitatively in
``.examples/sensitivity.py``; an FD cross-check like the elasticity
module's ``compute_density_sensitivity_fd``, ``Elasticity/utils.py:158``).
"""

import numpy as np
import pytest

from lsafw_tpu.sensitivity import EigenSensitivitySolver
from lsafw_tpu.solver.baseflow import BaseFlowSolver

from tests.benchmark.test_cylinder_stability import (
    build_cylinder_case,
    leading_eigenvalue,
)


@pytest.mark.slow
def test_dsigma_dre_matches_fd():
    mesh, spaces, bcs_base, bcs_pert, ctx = build_cylinder_case(
        x_range=(-8.0, 22.0), y_range=(-8.0, 8.0), res=1.0, res_cyl=0.3, influence=6.0
    )
    re0, dre = 50.0, 2.0
    target = 0.02 + 0.74j

    def sigma_at(re, w0=None):
        solver = BaseFlowSolver(ctx, mesh, bcs_base, re=re)
        if w0 is not None:
            solver._initial_guess = w0
        w = solver.solve(ramp=(w0 is None), steps=4, tol=1e-10, max_it=40)
        return w, leading_eigenvalue(mesh, ctx, bcs_pert, w, re, target)

    w0, s0 = sigma_at(re0)
    _, s_plus = sigma_at(re0 + dre, w0)
    _, s_minus = sigma_at(re0 - dre, w0)
    fd = (s_plus - s_minus) / (2 * dre)

    sens = EigenSensitivitySolver(
        ctx, mesh, bcs_base, w0, re0, perturbation_bcs=bcs_pert, target=s0
    )
    d_sigma = sens.evaluate(target=s0)

    # adjoint must reproduce the FD slope (FD itself has O(dre^2) error)
    assert abs(d_sigma - fd) < 0.15 * abs(fd), (d_sigma, fd)
    # growth rate increases with Re near onset
    assert d_sigma.real > 0


@pytest.mark.slow
def test_wavemaker_localized_in_wake():
    """Structural sensitivity peaks in the near-wake recirculation region
    (Giannetti & Luchini 2007: wavemaker core at x ~ 1-4, |y| < 1.5)."""
    mesh, spaces, bcs_base, bcs_pert, ctx = build_cylinder_case(
        x_range=(-8.0, 22.0), y_range=(-8.0, 8.0), res=1.0, res_cyl=0.3, influence=6.0
    )
    re0 = 50.0
    solver = BaseFlowSolver(ctx, mesh, bcs_base, re=re0)
    w = solver.solve(ramp=True, steps=4, tol=1e-10, max_it=40)
    sens = EigenSensitivitySolver(
        ctx, mesh, bcs_base, w, re0, perturbation_bcs=bcs_pert, target=0.02 + 0.74j
    )
    sens.solve_direct_mode()
    sens.solve_adjoint_mode()
    sw = sens.compute_wavemaker()
    p = sw[spaces.dofs_p]
    coords = spaces.pressure.node_coords
    peak = coords[np.argmax(np.abs(p))]
    assert 0.5 < peak[0] < 5.0, peak
    assert abs(peak[1]) < 2.0, peak
    # velocity slot is empty (Sw packed into pressure, reference :440-445)
    assert np.abs(sw[spaces.dofs_u]).max() == 0.0
