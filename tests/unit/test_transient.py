"""Transient-growth gains vs dense linear algebra on a small LNS system.

The discrete gain operator T = P^T (S^H)^N M S^N P (S = one CN step)
is computed densely and its W-generalized eigenvalues are the
reference; the solver's Lanczos + shift-invert path must match.
"""

import numpy as np
import pytest

from lsafw_tpu.transient import TransientGrowthSolver

from tests.unit.test_resolvent import lns_case  # noqa: F401  (fixture)


def _dense_gains(A, M, nu, mask, horizon, n_steps, k):
    Ad = A.to_scipy().toarray()
    Md = M.to_scipy().toarray()
    n = Ad.shape[0]
    fmask = np.zeros(n, dtype=bool)
    fmask[:nu] = True
    fmask &= ~np.asarray(mask, dtype=bool)
    fd = np.nonzero(fmask)[0]
    dt = horizon / n_steps
    S = np.linalg.solve(Md - 0.5 * dt * Ad, Md + 0.5 * dt * Ad)
    Phi = np.linalg.matrix_power(S, n_steps)
    B = Phi[:, fd]
    T = B.T @ Md @ B
    W = Md[np.ix_(fd, fd)]
    from scipy.linalg import eigh

    gam = eigh(T, W, eigvals_only=True)
    return np.maximum(gam[::-1][:k], 0.0)


def test_gains_match_dense(lns_case):  # noqa: F811
    A, M, spaces, bcs = lns_case
    horizon, n_steps, k = 4.0, 16, 3
    ref = _dense_gains(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, horizon, n_steps, k
    )
    ts = TransientGrowthSolver(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, method="lu"
    )
    res = ts.solve(horizon, n_steps, k=k)
    assert np.allclose(res.gains, ref, rtol=1e-6), (res.gains, ref)


def test_modes_consistent(lns_case):  # noqa: F811
    """Unit initial energy; evolved energy equals the gain; shear flow
    shows transient amplification (G > 1) despite stability."""
    A, M, spaces, bcs = lns_case
    ts = TransientGrowthSolver(
        A, M, spaces.num_velocity_dofs, bcs.dirichlet_mask, method="lu"
    )
    res = ts.solve(4.0, 16, k=1)
    Ms = M.to_scipy()
    q0, qT, g = res.initials[0], res.finals[0], res.gains[0]
    assert abs(q0 @ (Ms @ q0) - 1.0) < 1e-8
    assert abs(qT @ (Ms @ qT) - g) < 1e-6 * max(g, 1.0)
    nu = spaces.num_velocity_dofs
    assert np.allclose(q0[nu:], 0.0)
    assert np.allclose(q0[np.asarray(bcs.dirichlet_mask)], 0.0)
    assert g > 0.0 and np.isfinite(g)


def test_banded_matches_lu(lns_case):  # noqa: F811
    A, M, spaces, bcs = lns_case
    kw = dict(num_velocity_dofs=spaces.num_velocity_dofs,
              dirichlet_mask=bcs.dirichlet_mask)
    g_lu = TransientGrowthSolver(A, M, method="lu", **kw).solve(2.0, 8, k=2).gains
    g_bd = TransientGrowthSolver(A, M, method="banded", **kw).solve(2.0, 8, k=2).gains
    assert np.allclose(g_bd, g_lu, rtol=1e-6), (g_bd, g_lu)
