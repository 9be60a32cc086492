"""500k-DOF single-chip flagship eigensolve (VERDICT round-3 item 2).

Production cylinder geometry at ~sqrt(3)x finer resolution (~500k
Taylor-Hood DOFs).  The band-memory budget (LSAFW_BAND_MEM_GB)
truncates the factor into a banded preconditioner; refinement against
the true operator absorbs the approximation.

Run on TPU:  LSAFW_BAND_MEM_GB=10 timeout 5400 python scripts/dev_500k.py
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from lsafw_tpu.config import (
    load_bc_config, load_cylinder_flow_config, load_facet_config,
)
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

SCALE = float(os.environ.get("DEV500_SCALE", "0.58"))
RE = 50.0
TARGET = 0.018 + 0.7379601143282424j

cfg_dir = os.path.join(os.path.dirname(__file__), "..", "config_files", "2D", "cylinder")
geo = load_cylinder_flow_config(os.path.join(cfg_dir, "geometry.toml"))
import dataclasses
geo = dataclasses.replace(
    geo,
    resolution=geo.resolution * SCALE,
    resolution_around_cylinder=geo.resolution_around_cylinder * SCALE,
)
marker_fn = load_facet_config(os.path.join(cfg_dir, "facets.toml"))

t0 = time.time()
mesh = cylinder_flow_mesh(geo)
mark_boundary_facets(mesh, marker_fn)
spaces = define_spaces(mesh)
bcs = define_bcs(mesh, spaces, load_bc_config(os.path.join(cfg_dir, "bcs.toml")))
bcs_pert = define_bcs(
    mesh, spaces, load_bc_config(os.path.join(cfg_dir, "bcs_perturbation.toml"))
)
ctx = AssemblyContext.build(spaces)
n = spaces.num_dofs
print(f"setup: {n} DOFs, {mesh.num_cells} cells ({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
on_tpu = jax.default_backend() == "tpu"
WCACHE = f"/tmp/w500k_{SCALE}.npy"
if os.path.exists(WCACHE):
    w = np.load(WCACHE)
    t_base = 0.0
    print("baseflow loaded from cache", flush=True)
else:
    solver = BaseFlowSolver(ctx, mesh, bcs, re=RE)
    ramp = True
    if os.path.exists("/tmp/w167k.npy"):
        # mesh-sequenced continuation: the converged production-175k
        # baseflow (same geometry, coarser resolution) interpolated as
        # the Re=50 initial guess — skips the fine-mesh Stokes + ramp
        from lsafw_tpu.solver.baseflow import interpolate_state

        mesh_c = cylinder_flow_mesh(load_cylinder_flow_config(
            os.path.join(cfg_dir, "geometry.toml")))
        mark_boundary_facets(mesh_c, marker_fn)
        spaces_c = define_spaces(mesh_c)
        w_c = np.load("/tmp/w167k.npy")
        if w_c.shape[0] == spaces_c.num_dofs:
            guess = interpolate_state(w_c, spaces_c, spaces)
            solver._initial_guess = np.where(
                bcs.dirichlet_mask, bcs.dirichlet_values, guess)
            ramp = False
            print(f"mesh-sequenced guess from 175k ({time.time()-t0:.0f}s)",
                  flush=True)
    w = solver.solve(
        ramp=ramp, steps=4, tol=1e-9, max_it=40,
        linear_solver="banded" if on_tpu else "lu",
    )
    np.save(WCACHE, np.asarray(w))
    t_base = time.time() - t0
    print(f"baseflow: {t_base:.0f}s", flush=True)

t0 = time.time()
asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
A, M = asm.assemble_eigensystem()
A_el, M_el, dofs = asm.element_matrices()
A.data.block_until_ready()
t_asm = time.time() - t0
print(f"assemble: {t_asm:.0f}s (nnz={A.pattern.nnz})", flush=True)

t0 = time.time()
es = EigenSolver(A, M, EigensolverConfig(num_eig=1, atol=1e-8, ncv=24))
es.set_st_type(STType.SINVERT)
es.set_target(TARGET)
es.set_st_pc_type("banded")
es.set_elements(ctx, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask), dofs=dofs)
pairs = es.solve()
t_eig = time.time() - t0
sigma = pairs[0][0]
resid = float(eigen_residuals(A, M, pairs)[0])
print(
    f"RESULT n={n} sigma={sigma.real:+.5f}{sigma.imag:+.5f}j resid={resid:.2e} "
    f"baseflow={t_base:.0f}s assemble={t_asm:.0f}s eigen={t_eig:.0f}s",
    flush=True,
)
out = dict(n=n, sigma_re=sigma.real, sigma_im=sigma.imag, resid=resid,
           t_base=t_base, t_asm=t_asm, t_eig=t_eig, scale=SCALE, re=RE)
with open("/tmp/dev500k_result.json", "w") as f:
    json.dump(out, f)
