"""Unsteady NS stepper: fixed-point, linear-regime, and frequency checks.

The machinery gate: in the linear regime (eps-scaled eigenvector
perturbation of a steady state) the NONLINEAR theta-stepper must
reproduce the dense Crank-Nicolson propagator of the linearized
system to O(eps) — same matrices, two totally different code paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.timestepping import UnsteadySolver, dominant_frequency

RE = 20.0


@pytest.fixture(scope="module")
def steady_case():
    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 6, 6)

    def marker(x):
        out = np.full(x.shape[0], 3, np.int32)
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], 1.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=3, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=2, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    w = BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
        ramp=True, steps=2, tol=1e-11, max_it=40
    )
    return mesh, spaces, bcs, ctx, np.asarray(w)


def test_steady_state_is_fixed_point(steady_case):
    mesh, spaces, bcs, ctx, w = steady_case
    us = UnsteadySolver(ctx, mesh, bcs, RE, newton_tol=1e-12)
    q = jnp.asarray(w)
    for _ in range(3):
        q, st = us.step(q, dt=0.2)
        assert st.newton_iters <= 3
    assert float(jnp.linalg.norm(q - jnp.asarray(w))) < 1e-7 * (
        1.0 + np.linalg.norm(w))


def test_linear_regime_matches_dense_cn(steady_case):
    mesh, spaces, bcs, ctx, w = steady_case
    from lsafw_tpu.models.navier_stokes import (
        LinearizedNavierStokesAssembler,
        StationaryNavierStokesAssembler,
    )

    pert_bcs = bcs.homogeneous()
    lin = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, pert_bcs, mesh)
    A, M = lin.assemble_eigensystem()
    # a div-free, BC-homogeneous perturbation: an eigenvector of (A, M)
    import scipy.sparse.linalg as spla

    lam, V = spla.eigs(
        A.to_scipy().astype(complex), k=1, M=M.to_scipy().astype(complex),
        sigma=-0.5 + 0.0j, which="LM",
    )
    v = np.real(V[:, 0])
    v /= np.linalg.norm(v)

    # dense CN of the time-stepper's OWN linearization (dynamics
    # M dq'/dt = +J q' — the framework's stability convention):
    # (M - dt/2 J) q1 = (M + dt/2 J) q0
    st_asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
    Jd = np.asarray(st_asm.jacobian(jnp.asarray(w), RE).to_scipy().toarray())
    Md = np.asarray(lin.assemble_mass_matrix().to_scipy().toarray())
    dt, nsteps = 0.1, 6
    S = np.linalg.solve(Md - 0.5 * dt * Jd, Md + 0.5 * dt * Jd)

    eps = 1e-6
    us = UnsteadySolver(ctx, mesh, bcs, RE, newton_tol=1e-13)
    q = jnp.asarray(w + eps * v)
    for _ in range(nsteps):
        q, _ = us.step(q, dt)
    got = (np.asarray(q) - w) / eps
    ref = np.linalg.matrix_power(S, nsteps) @ v
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # floor: O(eps) quadratic feedback + Newton/LU rounding, measured ~3e-4
    assert err < 3e-3, err


def test_dominant_frequency():
    t = np.linspace(0.0, 60.0, 1200)
    sig = 0.7 * np.sin(0.83 * t + 0.3) + 0.05 * np.sin(2.9 * t)
    w = dominant_frequency(t, sig)
    assert abs(w - 0.83) < 0.01


def test_banded_fused_step_matches_lu(steady_case):
    """The fused single-program banded step equals the eager LU step."""
    import jax.numpy as jnp

    mesh, spaces, bcs, ctx, w = steady_case
    rng = np.random.default_rng(5)
    pert = rng.standard_normal(w.size) * 1e-3
    pert[np.asarray(
        UnsteadySolver(ctx, mesh, bcs, RE)._bc_mask)] = 0.0
    q0 = jnp.asarray(w + pert)
    us_lu = UnsteadySolver(ctx, mesh, bcs, RE, method="lu", newton_tol=1e-12)
    us_bd = UnsteadySolver(ctx, mesh, bcs, RE, method="banded", newton_tol=1e-12)
    q_lu, _ = us_lu.step(q0, 0.15)
    q_bd, st = us_bd.step(q0, 0.15)
    assert float(jnp.linalg.norm(q_bd - q_lu)) < 1e-8 * (
        1.0 + float(jnp.linalg.norm(q_lu)))
    assert np.isfinite(st.residual)


def test_bdf2_linear_regime_matches_dense(steady_case):
    """BDF2 steps (CN bootstrap) vs the dense BDF2 recurrence on the
    linearized system."""
    import jax.numpy as jnp

    mesh, spaces, bcs, ctx, w = steady_case
    from lsafw_tpu.models.navier_stokes import (
        LinearizedNavierStokesAssembler,
        StationaryNavierStokesAssembler,
    )

    pert_bcs = bcs.homogeneous()
    lin = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, pert_bcs, mesh)
    A, M = lin.assemble_eigensystem()
    import scipy.sparse.linalg as spla

    _, V = spla.eigs(A.to_scipy().astype(complex), k=1,
                     M=M.to_scipy().astype(complex), sigma=-0.5 + 0.0j)
    v = np.real(V[:, 0]); v /= np.linalg.norm(v)

    st_asm = StationaryNavierStokesAssembler(ctx, mesh, bcs)
    Jd = np.asarray(st_asm.jacobian(jnp.asarray(w), RE).to_scipy().toarray())
    Md = np.asarray(lin.assemble_mass_matrix().to_scipy().toarray())
    dt, nsteps = 0.1, 6
    # CN bootstrap then BDF2: v2 = (1.5M - dtJ)^-1 M (2 v1 - 0.5 v0)
    S_cn = np.linalg.solve(Md - 0.5 * dt * Jd, Md + 0.5 * dt * Jd)
    Nb = np.linalg.inv(1.5 * Md - dt * Jd) @ Md
    v0d, v1d = v, S_cn @ v
    for _ in range(nsteps - 1):
        v0d, v1d = v1d, Nb @ (2.0 * v1d - 0.5 * v0d)

    eps = 1e-6
    us = UnsteadySolver(ctx, mesh, bcs, RE, newton_tol=1e-13)
    res = us.run(jnp.asarray(w + eps * v), dt, nsteps, scheme="bdf2")
    got = (np.asarray(res.q) - w) / eps
    err = np.linalg.norm(got - v1d) / np.linalg.norm(v1d)
    assert err < 3e-3, err


def test_checkpoint_resume(steady_case, tmp_path):
    """Interrupted march + resume == uninterrupted march (state, BDF2
    history and probe series)."""
    import jax.numpy as jnp

    mesh, spaces, bcs, ctx, w = steady_case
    rng = np.random.default_rng(9)
    pert = rng.standard_normal(w.size) * 1e-3
    us0 = UnsteadySolver(ctx, mesh, bcs, RE)
    pert[np.asarray(us0._bc_mask)] = 0.0
    q0 = jnp.asarray(w + pert)
    kw = dict(probe_dofs=[3, 7], scheme="bdf2")

    ref = UnsteadySolver(ctx, mesh, bcs, RE).run(q0, 0.2, 10, **kw)

    # non-.npz path exercises the suffix normalization (np.savez
    # appends .npz; resume must still find the file)
    cp = tmp_path / "march.ckpt"
    UnsteadySolver(ctx, mesh, bcs, RE).run(
        q0, 0.2, 6, checkpoint_path=cp, checkpoint_every=3, **kw)
    res = UnsteadySolver(ctx, mesh, bcs, RE).run(
        q0, 0.2, 10, checkpoint_path=cp, checkpoint_every=3, **kw)

    assert np.allclose(res.q, ref.q, atol=1e-12)
    assert np.allclose(res.t, ref.t)
    assert np.allclose(res.probes, ref.probes, atol=1e-12)


def test_dt_change_refactors(steady_case):
    """The chord factor is dt-specific: changing dt must refactor
    (a stale-dt factor silently degrades Newton — review finding)."""
    mesh, spaces, bcs, ctx, w = steady_case
    import jax.numpy as jnp

    us = UnsteadySolver(ctx, mesh, bcs, RE, refactor_every=100)
    q = jnp.asarray(w)
    q, st1 = us.step(q, 0.2)
    q, st2 = us.step(q, 0.2)
    assert not st2.refactored  # same dt, within refactor_every
    q, st3 = us.step(q, 0.1)
    assert st3.refactored  # dt changed -> new factor
