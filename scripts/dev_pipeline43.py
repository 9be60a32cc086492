"""Instrumented 43k pipeline (the bench stage) with verbose logging —
where does the eigen time go?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from lsafw_tpu.config import BoundaryConditionsConfig, CylinderFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.eigen import (
    EigenSolver, EigensolverConfig, STType, eigen_residuals,
)
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

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
print(f"{cspaces.num_dofs} DOFs", flush=True)
t0 = time.time()
w = BaseFlowSolver(cctx, cmesh, bcs_base, re=47.0).solve(
    ramp=True, steps=3, tol=1e-8, max_it=40, linear_solver="banded"
)
print(f"baseflow {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
asm = LinearizedNavierStokesAssembler(jnp.asarray(w), cctx, 47.0, bcs_pert, cmesh)
A, M = asm.assemble_eigensystem()
A_el, M_el, dofs = asm.element_matrices()
A.data.block_until_ready()
print(f"assemble {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
es = EigenSolver(A, M, EigensolverConfig(num_eig=1, atol=1e-8, ncv=16))
es.set_st_type(STType.SINVERT)
es.set_target(0.0 + 0.74j)
es.set_st_pc_type("banded")
es.set_elements(cctx, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask), dofs=dofs)
pairs = es.solve()
print(f"eigen {time.time()-t0:.0f}s sigma={pairs[0][0]:.4f} "
      f"resid={float(eigen_residuals(A, M, pairs)[0]):.1e}", flush=True)
