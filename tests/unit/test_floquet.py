"""Floquet machinery vs dense linear algebra on a constant "orbit".

A steady state is a (trivially) periodic orbit for any period: the
monodromy is then the N-th power of the linearized one-step map, which
we can form densely on a small mesh.  The solver's matrix-free ARPACK
multipliers must match the dense spectrum's leading multipliers.
"""

import numpy as np
import pytest

from lsafw_tpu.floquet import FloquetSolver

from tests.unit.test_timestepping import steady_case, RE  # noqa: F401


def _dense_monodromy(ctx, mesh, bcs, w, dt, N, theta=0.5):
    import jax.numpy as jnp

    from lsafw_tpu.models.navier_stokes import (
        LinearizedNavierStokesAssembler,
        StationaryNavierStokesAssembler,
    )

    st = StationaryNavierStokesAssembler(ctx, mesh, bcs)
    Jd = np.asarray(st.jacobian(jnp.asarray(w), RE).to_scipy().toarray())
    lin = LinearizedNavierStokesAssembler(
        jnp.zeros(w.size), ctx, RE, bcs, mesh
    )
    Md = np.asarray(lin.assemble_mass_matrix().to_scipy().toarray())
    n = w.size
    nu = ctx.spaces.num_velocity_dofs
    mom = np.zeros(n, dtype=bool)
    mom[:nu] = True
    mom &= ~np.asarray(st.bc_mask)
    Jm = np.where(mom[:, None], Jd, 0.0)
    S = np.linalg.solve(Md - theta * dt * Jd, Md + (1 - theta) * dt * Jm)
    return np.linalg.matrix_power(S, N)


def test_constant_orbit_matches_dense(steady_case):  # noqa: F811
    mesh, spaces, bcs, ctx, w = steady_case
    dt, N, k = 0.2, 8, 4
    fs = FloquetSolver(ctx, mesh, bcs, RE, np.tile(w, (N, 1)), dt)
    res = fs.solve(k=k, tol=1e-10)
    Phi = _dense_monodromy(ctx, mesh, bcs, w, dt, N)
    mu_d = np.linalg.eigvals(Phi)
    mu_d = mu_d[np.argsort(-np.abs(mu_d))][:k]
    # compare multiplier sets (order within conjugate pairs may differ)
    got = np.sort_complex(res.multipliers.real + 1j * np.abs(res.multipliers.imag))
    ref = np.sort_complex(mu_d.real + 1j * np.abs(mu_d.imag))
    assert np.allclose(got, ref, rtol=1e-6, atol=1e-10), (got, ref)


def test_monodromy_action_matches_dense(steady_case):  # noqa: F811
    """The raw Phi_T action on a random vector, independent of ARPACK."""
    mesh, spaces, bcs, ctx, w = steady_case
    dt, N = 0.25, 5
    fs = FloquetSolver(ctx, mesh, bcs, RE, np.tile(w, (N, 1)), dt)
    Phi = _dense_monodromy(ctx, mesh, bcs, w, dt, N)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(w.size) + 1j * rng.standard_normal(w.size)
    got = fs.monodromy_apply(v)
    ref = Phi @ v
    assert np.linalg.norm(got - ref) < 1e-9 * np.linalg.norm(ref)


def test_inexact_monodromy_matches_exact(steady_case):  # noqa: F811
    """The production-scale mode (one cycle-mean factor as reusable PC,
    per-snapshot residual matvecs) equals the prestored-factor trip on
    an orbit whose snapshots genuinely VARY (distinct Jacobians — on a
    constant orbit the mean PC would be trivially exact)."""
    mesh, spaces, bcs, ctx, w = steady_case
    dt, N = 0.25, 5
    rng = np.random.default_rng(11)
    snaps = np.tile(w, (N, 1)) + (
        0.05 * np.abs(w).max() * rng.standard_normal((N, w.size)))
    v = rng.standard_normal(w.size) + 1j * rng.standard_normal(w.size)
    ref = FloquetSolver(
        ctx, mesh, bcs, RE, snaps, dt, method="lu").monodromy_apply(v)
    for method in ("lu", "banded"):
        got = FloquetSolver(
            ctx, mesh, bcs, RE, snaps, dt, method=method, inexact=True
        ).monodromy_apply(v)
        assert np.linalg.norm(got - ref) < 1e-7 * np.linalg.norm(ref), method


def test_banded_monodromy_matches_lu(steady_case):  # noqa: F811
    """The fused lax.scan banded trip equals the eager LU trip."""
    mesh, spaces, bcs, ctx, w = steady_case
    dt, N = 0.25, 4
    snaps = np.tile(w, (N, 1))
    fs_lu = FloquetSolver(ctx, mesh, bcs, RE, snaps, dt, method="lu")
    fs_bd = FloquetSolver(ctx, mesh, bcs, RE, snaps, dt, method="banded")
    rng = np.random.default_rng(7)
    v = rng.standard_normal(w.size) + 1j * rng.standard_normal(w.size)
    got = fs_bd.monodromy_apply(v)
    ref = fs_lu.monodromy_apply(v)
    assert np.linalg.norm(got - ref) < 1e-8 * np.linalg.norm(ref)
