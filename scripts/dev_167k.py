"""Production-mesh (167k) single sigma point: time-to-leading-eigenpair
with BCSR refinement matvecs, and the fused-Arnoldi fault probe.

VERDICT round-3 items 4 (time-to-eigenpair <= 30 s warm at 167k) and 6
(diagnose the >100k fused-expand kernel fault instead of size-gating):
run with LSAFW_FUSED_EXPAND=1 to force the fused path above the gate.

Run on TPU:
  LSAFW_FUSED_EXPAND=1 timeout 5000 python scripts/dev_167k.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

RE = 47.0
TARGET = 0.0 + 0.74j

cfg = os.path.join(os.path.dirname(__file__), "..", "config_files", "2D", "cylinder")
geo = load_cylinder_flow_config(os.path.join(cfg, "geometry.toml"))
marker_fn = load_facet_config(os.path.join(cfg, "facets.toml"))

t0 = time.time()
mesh = cylinder_flow_mesh(geo)
mark_boundary_facets(mesh, marker_fn)
spaces = define_spaces(mesh)
bcs = define_bcs(mesh, spaces, load_bc_config(os.path.join(cfg, "bcs.toml")))
bcs_pert = define_bcs(mesh, spaces, load_bc_config(os.path.join(cfg, "bcs_perturbation.toml")))
ctx = AssemblyContext.build(spaces)
print(f"setup {time.time()-t0:.0f}s, {spaces.num_dofs} DOFs", flush=True)

t0 = time.time()
WCACHE = "/tmp/w167k.npy"
if os.path.exists(WCACHE):
    w = np.load(WCACHE)
    print("baseflow loaded from cache", flush=True)
else:
    w = BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
        ramp=True, steps=3, tol=1e-8, max_it=40, linear_solver="banded")
    np.save(WCACHE, np.asarray(w))
    print(f"baseflow {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
A, M = asm.assemble_eigensystem()
A.data.block_until_ready()
print(f"assemble {time.time()-t0:.0f}s", flush=True)
MCACHE = "/tmp/AM167k.npz"
if not os.path.exists(MCACHE):
    np.savez(MCACHE, Adata=np.asarray(A.data), Mdata=np.asarray(M.data),
             indices=A.pattern.indices, indptr=A.pattern.indptr,
             shape=np.asarray(A.shape))
    print("matrices cached", flush=True)

import gc
gc.collect()
try:
    ms = jax.local_devices()[0].memory_stats()
    print(f"HBM in use before eigen: {ms.get('bytes_in_use', 0)/1e9:.2f} GB "
          f"(limit {ms.get('bytes_limit', 0)/1e9:.2f})", flush=True)
except Exception as e:
    print("memory_stats unavailable:", e, flush=True)

for attempt in (1, 2):  # second pass = warm compile: time-to-eigenpair
    t0 = time.time()
    es = EigenSolver(A, M, EigensolverConfig(num_eig=1, atol=1e-8, ncv=16))
    es.set_st_type(STType.SINVERT)
    es.set_target(TARGET)
    es.set_st_pc_type("banded")
    pairs = es.solve()
    res = float(eigen_residuals(A, M, pairs)[0])
    print(f"eigen attempt {attempt}: {time.time()-t0:.0f}s "
          f"sigma={pairs[0][0]:.5f} resid={res:.1e}", flush=True)
