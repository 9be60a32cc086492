"""3D lid-driven cavity: end-to-end baseflow + linearized eigensolve.

The 3D analogue of the reference's full pipeline (mesh -> spaces ->
bcs -> Newton baseflow -> linearized-NS eigensystem -> shift-invert
Krylov-Schur; parity: ``Solver/eigen.py`` driver flow).  The cubic
lid-driven cavity is globally stable far below Re ~ 1.9e3 (first 3D
instability, Albensoeder & Kuhlmann), so every computed mode must
decay, and the real pencil's spectrum must be conjugate-symmetric.
"""

import numpy as np

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import box_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType, eigen_residuals

LID, WALL = 1, 2


def test_cavity3d_stable_spectrum():
    mesh = box_mesh((0, 0, 0), (1.0, 1.0, 1.0), 6, 6, 6)

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
    w = BaseFlowSolver(ctx, mesh, bcs, re=100.0).solve(ramp=True, steps=3, tol=1e-9)
    assert np.isfinite(np.asarray(w)).all()

    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=LID, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
        BoundaryConditionsConfig(marker=WALL, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
    ])
    asm = LinearizedNavierStokesAssembler(w, ctx, 100.0, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    es = EigenSolver(A, M, EigensolverConfig(num_eig=4, atol=1e-9, ncv=24))
    es.set_st_type(STType.SINVERT)
    es.set_target(-0.2 + 0.3j)
    pairs = es.solve()
    assert len(pairs) == 4

    lams = np.array([p[0] for p in pairs])
    # globally stable at Re=100: every mode decays
    assert (lams.real < 0.0).all(), lams
    # true-residual quality
    rs = eigen_residuals(A, M, pairs)
    assert (rs < 1e-8).all(), rs
    # conjugate symmetry of the real pencil: the dominant complex mode
    # must come back with its conjugate partner (modes at the edge of
    # the nev-ball may have their partner ranked just outside it)
    cplx = lams[np.abs(lams.imag) > 1e-8]
    paired = sum(
        1 for lam in cplx if np.min(np.abs(cplx - np.conj(lam))) < 1e-6
    )
    assert paired >= 2, lams
