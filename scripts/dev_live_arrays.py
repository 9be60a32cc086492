"""Probe: what device arrays stay alive after the baseflow stage?

The 167k pipeline OOM'd in the eigen stage with ~6 GB of expected
headroom; this instruments the same stage sequence at the default
(43k) size and prints every live device buffer > 1 MB after baseflow
returns, after gc, and after assembly.  Run on TPU:

  timeout 1800 python scripts/dev_live_arrays.py
"""
import gc
import os
import sys
import time

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
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)


def dump(tag: str, min_mb: float = 1.0) -> None:
    gc.collect()
    arrs = jax.live_arrays()
    tot = sum(a.nbytes for a in arrs)
    print(f"--- live arrays [{tag}]: {len(arrs)} arrays, {tot/1e9:.3f} GB total", flush=True)
    big = sorted((a for a in arrs if a.nbytes > min_mb * 1e6),
                 key=lambda a: -a.nbytes)
    for a in big[:25]:
        print(f"    {a.nbytes/1e6:9.1f} MB  {a.dtype}  {a.shape}", flush=True)


RE = 47.0
cfg = os.path.join(os.path.dirname(__file__), "..", "config_files", "2D", "cylinder")
geo = load_cylinder_flow_config(os.path.join(cfg, "geometry.toml"))
marker_fn = load_facet_config(os.path.join(cfg, "facets.toml"))

mesh = cylinder_flow_mesh(geo)
mark_boundary_facets(mesh, marker_fn)
spaces = define_spaces(mesh)
bcs = define_bcs(mesh, spaces, load_bc_config(os.path.join(cfg, "bcs.toml")))
bcs_pert = define_bcs(mesh, spaces, load_bc_config(os.path.join(cfg, "bcs_perturbation.toml")))
ctx = AssemblyContext.build(spaces)
print(f"{spaces.num_dofs} DOFs", flush=True)
dump("after setup")

t0 = time.time()
w = BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
    ramp=True, steps=2, tol=1e-8, max_it=40,
    linear_solver="banded" if jax.default_backend() == "tpu" else "lu")
print(f"baseflow {time.time()-t0:.0f}s", flush=True)
dump("after baseflow")

asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
A, M = asm.assemble_eigensystem()
A.data.block_until_ready()
dump("after assemble")
