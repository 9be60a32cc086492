"""Build the bench pipeline's 43k reduced-cylinder operators and save them.

Reproduces the round-2 BENCH failure ("Banded MR solve failed ...
degrading this Newton solve to host LU"): assembles the stationary NS
Jacobians along the Re ramp and the shifted eigensystem operator on the
reduced cylinder mesh, and stores them as .npz CSR archives under
scripts/data/ so factorization experiments iterate without re-meshing.

Run:  JAX_PLATFORMS=cpu python scripts/repro_band43k.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import scipy.sparse as sp

from lsafw_tpu.config import BoundaryConditionsConfig, CylinderFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    StationaryNavierStokesAssembler,
)
from lsafw_tpu.solver.baseflow import BaseFlowSolver

OUT = os.path.join(os.path.dirname(__file__), "data")
os.makedirs(OUT, exist_ok=True)


def save_csr(name, A_csr, extra=None):
    d = dict(
        data=np.asarray(A_csr.data),
        indices=np.asarray(A_csr.indices),
        indptr=np.asarray(A_csr.indptr),
        shape=np.asarray(A_csr.shape),
    )
    if extra:
        d.update(extra)
    np.savez_compressed(os.path.join(OUT, name), **d)
    print(f"saved {name}: n={A_csr.shape[0]} nnz={A_csr.nnz}", flush=True)


def main():
    t0 = time.time()
    geo = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-10.0, 30.0), y_range=(-10.0, 10.0), resolution=0.5,
        resolution_around_cylinder=0.15, influence_radius=8.0,
    )
    cmesh = cylinder_flow_mesh(geo, max_iter=80, seed=0)
    INLET, OUTLET, BOTTOM, TOP, CYL = 1, 2, 3, 4, 5

    def marker(x):
        out = np.full(x.shape[0], CYL, dtype=np.int32)
        out[np.isclose(x[:, 1], -10.0, atol=1e-6)] = BOTTOM
        out[np.isclose(x[:, 1], 10.0, atol=1e-6)] = TOP
        out[np.isclose(x[:, 0], -10.0, atol=1e-6)] = INLET
        out[np.isclose(x[:, 0], 30.0, atol=1e-6)] = OUTLET
        return out

    mark_boundary_facets(cmesh, marker)
    cspaces = define_spaces(cmesh)
    bcs_base = define_bcs(cmesh, cspaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=BOTTOM, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=TOP, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(cmesh, cspaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
    ])
    cctx = AssemblyContext.build(cspaces)
    n = cspaces.num_dofs
    print(f"mesh ready: {n} DOFs ({time.time()-t0:.0f}s)", flush=True)

    # baseflow with the HOST LU path (known-good), capturing the Newton
    # iterates' Jacobians along the ramp like the bench would see them
    solver = BaseFlowSolver(cctx, cmesh, bcs_base, re=47.0)
    w = solver.solve(ramp=True, steps=3, tol=1e-8, max_it=40, linear_solver="lu")
    print(f"baseflow done ({time.time()-t0:.0f}s)", flush=True)
    np.save(os.path.join(OUT, "w43k.npy"), np.asarray(w))

    # Jacobian at the converged state (the class of operators the banded
    # Newton factors), plus at a mid-ramp state
    asm = StationaryNavierStokesAssembler(cctx, cmesh, bcs_base)
    for re_val, tag in [(16.3, "re16"), (47.0, "re47")]:
        J = asm.jacobian(jnp.asarray(w), re_val)
        save_csr(f"J43k_{tag}.npz", sp.csr_matrix(
            (np.asarray(J.data), J.pattern.indices, J.pattern.indptr),
            shape=J.pattern.shape))

    # shifted complex eigensystem operator C = A - sigma M
    lasm = LinearizedNavierStokesAssembler(jnp.asarray(w), cctx, 47.0, bcs_pert, cmesh)
    A, M = lasm.assemble_eigensystem()
    sigma = 0.0 + 0.74j
    dre = np.asarray(A.data) - sigma.real * np.asarray(M.data)
    dim = -sigma.imag * np.asarray(M.data)
    save_csr("C43k_sig074.npz", sp.csr_matrix(
        (dre + 1j * dim, A.pattern.indices, A.pattern.indptr),
        shape=A.pattern.shape))
    save_csr("M43k.npz", sp.csr_matrix(
        (np.asarray(M.data), M.pattern.indices, M.pattern.indptr),
        shape=M.pattern.shape))
    print(f"all saved ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
