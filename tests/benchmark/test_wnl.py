"""Weakly nonlinear (Stuart-Landau) expansion vs the self-consistent
model on the coarse cylinder.

The WNL coefficients come from the critical fixed point alone (one
eigensolve + adjoint + two forced solves); the SCM solves the full
nonlinear marginality problem.  Near onset the two must agree — a
strong mutual validation since they share no algorithmic path beyond
the assemblers.
"""

import numpy as np
import pytest

from lsafw_tpu.scm import SelfConsistentModel
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.wnl import find_critical_re, weakly_nonlinear

from tests.benchmark.test_scm import coarse_cylinder  # noqa: F401


@pytest.fixture(scope="module")
def wnl_model(coarse_cylinder):  # noqa: F811
    ctx, mesh, bcs, bcs_pert = coarse_cylinder
    re_c, w_c, sigma_c = find_critical_re(
        ctx, mesh, bcs, bcs_pert, 40.0, 55.0, tol=1e-3)
    res = weakly_nonlinear(ctx, mesh, bcs, bcs_pert, re_c, w_c)
    return ctx, mesh, bcs, bcs_pert, re_c, sigma_c, res


def test_wnl_supercritical_hopf(wnl_model):
    _, _, _, _, re_c, sigma_c, res = wnl_model
    # cylinder onset on this coarse mesh (production mesh: 46.9)
    assert 42.0 < re_c < 52.0, re_c
    assert abs(sigma_c.real) < 1e-3
    assert 0.6 < res.omega_c < 0.9
    # the cylinder Hopf bifurcation is supercritical with growing
    # frequency along the branch
    assert res.mu.real > 0, res.mu
    assert res.lambda_p.real > 0, res.lambda_p
    A1, A2 = res.amplitude(re_c + 2.0), res.amplitude(re_c + 6.0)
    assert 0 < A1 < A2
    assert res.frequency(re_c + 6.0) > res.omega_c
    # mean-flow distortion and second harmonic are nontrivial fields
    assert np.linalg.norm(res.q20) > 0
    assert np.linalg.norm(res.q22) > 0


def test_wnl_mean_slope_matches_forced_eigensolve(wnl_model):
    """Independent check of the Landau coefficient's MEAN part: distort
    the mean with a small frozen Reynolds-stress load x*unit_load(q1)
    and eigensolve — d sigma/dx must equal -mu_mean/4 (the SCM and WNL
    agree exactly at infinitesimal amplitude)."""
    from lsafw_tpu.scm import SelfConsistentModel
    from lsafw_tpu.wnl import convective_bilinear_load

    ctx, mesh, bcs, bcs_pert, re_c, sigma_c, res = wnl_model
    scm = SelfConsistentModel(ctx, mesh, bcs, bcs_pert, re_c,
                              linear_solver="lu")
    # adjoint-normalized projection of the mean part alone
    sens_mu_mean = None
    # recompute a consistently with res.q1 (unit energy, +omega branch)
    from lsafw_tpu.sensitivity import EigenSensitivitySolver

    sens = EigenSensitivitySolver(
        ctx, mesh, bcs, res.baseflow, re_c, perturbation_bcs=bcs_pert,
        target=complex(0, res.omega_c))
    sigma, v = sens.solve_direct_mode()
    if sigma.imag < 0:
        sigma, v = sigma.conjugate(), v.conj()
    Ms = sens._M.to_scipy()
    q1 = v / np.sqrt(np.real(np.vdot(v, Ms @ v)))
    a = sens.solve_adjoint_mode(sigma, q1)
    sens_mu_mean = -2 * np.vdot(a, convective_bilinear_load(
        ctx, q1, res.q20))

    x = 0.5
    Um = scm._mean_solve(x * scm.unit_load(q1), res.baseflow)
    assert Um is not None
    pair = scm._eig_about(np.asarray(Um), sigma, v0=q1,
                          omega_ref=abs(sigma.imag))
    fd = (pair[0] - sigma) / x
    pred = -sens_mu_mean / 4
    assert abs(fd - pred) < 0.05 * abs(pred), (fd, pred)


@pytest.mark.slow
def test_wnl_matches_scm_near_onset(wnl_model):
    """Quantitative triangle near onset: at Re_c + 1.5 the WNL
    amplitude must match the SCM's within the expansion's validity
    (25% — the cylinder's g(x) hardens quickly, so WNL overshoots with
    distance from onset), the frequency within 1%."""
    ctx, mesh, bcs, bcs_pert, re_c, _, res = wnl_model
    re = re_c + 1.5
    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=re).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40))
    scm = SelfConsistentModel(ctx, mesh, bcs, bcs_pert, re,
                              linear_solver="lu")
    scm_res = scm.solve(w, A0=0.5 * res.amplitude(re), tol_sigma=2e-4)
    assert scm_res.converged
    A_wnl, A_scm = res.amplitude(re), scm_res.amplitude
    assert abs(A_wnl - A_scm) < 0.25 * A_scm, (A_wnl, A_scm)
    f_wnl, f_scm = res.frequency(re), abs(scm_res.sigma.imag)
    assert abs(f_wnl - f_scm) < 0.01 * f_scm, (f_wnl, f_scm)
