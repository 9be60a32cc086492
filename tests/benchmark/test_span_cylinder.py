"""Quasi-3D physics on the cylinder wake.

At beta = 0 the spanwise eigensolve must reproduce the 2D leading
eigenvalue exactly (the (u,v,p) block decouples and the spanwise block
is damped); at moderate beta > 0 the growth rate must DROP — the
primary cylinder instability is two-dimensional (its 3D secondary
instability only appears around Re ~ 190, far above this test's
Re = 60; Barkley & Henderson, JFM 322, 1996).
"""

import numpy as np

from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
from lsafw_tpu.span import SpanwiseStability

from tests.benchmark.test_scm import coarse_cylinder  # noqa: F401

RE = 60.0


def _leading(A, M, target, ncv=30):
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-9, ncv=ncv))
    es.set_st_type(STType.SINVERT)
    es.set_target(target)
    pairs = es.solve()
    lam, _ = max(pairs, key=lambda p: p[0].real)
    return lam if lam.imag >= 0 else lam.conjugate()


def test_spanwise_growth_rate_curve(coarse_cylinder):  # noqa: F811
    ctx, mesh, bcs, bcs_pert = coarse_cylinder
    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40))

    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler

    A2, M2 = LinearizedNavierStokesAssembler(
        w, ctx, RE, bcs_pert, mesh).assemble_eigensystem()
    lam_2d = _leading(A2, M2, 0.05 + 0.75j)
    assert lam_2d.real > 5e-3  # supercritical at Re = 60

    span = SpanwiseStability(ctx, w, RE, bcs_pert, mesh)
    A0, M0 = span.assemble_eigensystem(0.0)
    lam_b0 = _leading(A0, M0, 0.05 + 0.75j)
    # beta = 0 decouples: the 2D mode IS a quasi-3D mode
    assert abs(lam_b0 - lam_2d) < 1e-7 * max(1.0, abs(lam_2d)), (
        lam_b0, lam_2d)

    Ab, Mb = span.assemble_eigensystem(1.5)
    lam_b = _leading(Ab, Mb, lam_2d.real + 1j * lam_2d.imag)
    # spanwise modulation damps the primary (2D) instability
    assert lam_b.real < lam_2d.real - 1e-3, (lam_b, lam_2d)
