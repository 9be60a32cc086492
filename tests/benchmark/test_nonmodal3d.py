"""Non-modal + unsteady analyses in 3D (coarse lid-driven cavity).

The resolvent/transient/timestepping modules are dimension-agnostic by
construction (velocity block [0, nu), assembled-pattern solves); this
locks that in with dense cross-checks on a small 3D case.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import box_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.resolvent import ResolventSolver
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.timestepping import UnsteadySolver
from lsafw_tpu.transient import TransientGrowthSolver

LID, WALL = 1, 2
RE = 80.0


@pytest.fixture(scope="module")
def cavity3d():
    mesh = box_mesh((0, 0, 0), (1.0, 1.0, 1.0), 4, 4, 4)

    def marker(x):
        out = np.full(x.shape[0], WALL, dtype=np.int32)
        out[np.isclose(x[:, 2], 1.0)] = LID
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=LID, type="dirichlet_velocity", value=(1.0, 0.0, 0.0)),
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
    ])
    ctx = AssemblyContext.build(spaces)
    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
        ramp=True, steps=2, tol=1e-10))
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=LID, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
    ])
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler

    asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    return mesh, spaces, bcs, bcs_pert, ctx, w, A, M


def test_resolvent_3d_matches_dense(cavity3d):
    _, spaces, _, bcs_pert, _, _, A, M = cavity3d
    omega, k = 0.5, 2
    Ad = A.to_scipy().toarray()
    Md = M.to_scipy().toarray()
    nu = spaces.num_velocity_dofs
    fm = np.zeros(Ad.shape[0], bool)
    fm[:nu] = True
    fm &= ~np.asarray(bcs_pert.dirichlet_mask, bool)
    fd = np.nonzero(fm)[0]
    Q = np.linalg.solve(1j * omega * Md - Ad, Md[:, fd])
    from scipy.linalg import eigh

    gam = eigh(Q.conj().T @ Md @ Q, Md[np.ix_(fd, fd)], eigvals_only=True)
    ref = np.sqrt(np.maximum(gam[::-1][:k], 0.0))
    rs = ResolventSolver(A, M, nu, bcs_pert.dirichlet_mask, method="lu")
    got = rs.solve(omega, k=k).gains
    assert np.allclose(got, ref, rtol=1e-6), (got, ref)


def test_transient_3d_matches_dense(cavity3d):
    _, spaces, _, bcs_pert, _, _, A, M = cavity3d
    horizon, n_steps, k = 2.0, 8, 2
    Ad = A.to_scipy().toarray()
    Md = M.to_scipy().toarray()
    nu = spaces.num_velocity_dofs
    fm = np.zeros(Ad.shape[0], bool)
    fm[:nu] = True
    fm &= ~np.asarray(bcs_pert.dirichlet_mask, bool)
    fd = np.nonzero(fm)[0]
    dt = horizon / n_steps
    S = np.linalg.solve(Md - 0.5 * dt * Ad, Md + 0.5 * dt * Ad)
    B = np.linalg.matrix_power(S, n_steps)[:, fd]
    from scipy.linalg import eigh

    gam = eigh(B.T @ Md @ B, Md[np.ix_(fd, fd)], eigvals_only=True)
    ref = np.maximum(gam[::-1][:k], 0.0)
    ts = TransientGrowthSolver(A, M, nu, bcs_pert.dirichlet_mask, method="lu")
    got = ts.solve(horizon, n_steps, k=k).gains
    assert np.allclose(got, ref, rtol=1e-6), (got, ref)


def test_unsteady_3d_fixed_point(cavity3d):
    mesh, spaces, bcs, _, ctx, w, _, _ = cavity3d
    us = UnsteadySolver(ctx, mesh, bcs, RE, newton_tol=1e-12)
    q = jnp.asarray(w)
    for _ in range(3):
        q, st = us.step(q, dt=0.3)
        assert st.newton_iters <= 3
    assert float(jnp.linalg.norm(q - jnp.asarray(w))) < 1e-7 * (
        1.0 + np.linalg.norm(w))
