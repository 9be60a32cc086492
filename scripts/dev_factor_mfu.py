"""Band-factor MFU sweep (VERDICT r3 item 5): nb x chunk on the 175k
production Jacobian.

Hypotheses measured here:
  * chunk: the warm factor pays ~150 ms tunnel dispatch PER CHUNK
    (11 chunks at 175k = 1.6 s of the 2.9 s wall); fewer, larger
    donated chunks amortize it.
  * nb: larger blocks (nb=256: B halves, steps halve, 256x256 MXU
    panels) raise per-step MXU utilization; ROADMAP notes nb=256
    factored faster at 43k.

Run on TPU:  timeout 3600 python scripts/dev_factor_mfu.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
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
from lsafw_tpu.solver.band import BandedLU, plan_for_csr
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

cfg = os.path.join(os.path.dirname(__file__), "..", "config_files", "2D", "cylinder")
geo = load_cylinder_flow_config(os.path.join(cfg, "geometry.toml"))
marker_fn = load_facet_config(os.path.join(cfg, "facets.toml"))
mesh = cylinder_flow_mesh(geo)
mark_boundary_facets(mesh, marker_fn)
spaces = define_spaces(mesh)
bcs_pert = define_bcs(
    mesh, spaces, load_bc_config(os.path.join(cfg, "bcs_perturbation.toml")))
ctx = AssemblyContext.build(spaces)
n = spaces.num_dofs
print(f"{n} DOFs", flush=True)

w = jnp.asarray(np.load("/tmp/w167k.npy")) if os.path.exists("/tmp/w167k.npy") \
    else jnp.zeros(n)
asm = LinearizedNavierStokesAssembler(w, ctx, 47.0, bcs_pert, mesh)
A, M = asm.assemble_eigensystem()
sigma = 0.018 + 0.738j
# shifted complex pair data (the SI factor's actual input)
dre = A.data - sigma.real * M.data
dim = (-sigma.imag) * M.data
float(dre[0])  # sync

results = []
# one config per process when FACTOR_NB/FACTOR_CHUNK are set: a
# RESOURCE_EXHAUSTED config poisons subsequent allocations in-process
# (measured: every config after the chunk=512 OOM failed its plan)
if os.environ.get("FACTOR_NB"):
    configs = [(int(os.environ["FACTOR_NB"]), int(os.environ["FACTOR_CHUNK"]))]
else:
    configs = [(nb, ch) for nb in (128, 256) for ch in (128, 512, 4096)]
for nb, chunk in configs:
    os.environ["LSAFW_BAND_NB"] = str(nb)
    try:
        plan = plan_for_csr(A, nb=nb, chunk=chunk)
    except Exception as e:
        print(f"nb={nb} chunk={chunk}: plan failed {e}", flush=True)
        continue
    nblk_pad = plan.nblk_pad
    bwidth = plan.B * nb
    # factor flops: per block row ~ (inv + B*B Schur updates + B L
    # products) * nb^3 MACs, complex pair = 4 real products
    flops = plan.nblk_pad * (plan.B**2 + plan.B + 1) * nb**3 * 2 * 4
    try:
        t0 = time.time()
        lu = BandedLU.factor(plan, dre, dim)
        float(lu.dinv_r[0, 0, 0])
        t_cold = time.time() - t0
        t0 = time.time()
        lu2 = BandedLU.factor(plan, dre, dim)
        float(lu2.dinv_r[0, 0, 0])
        t_warm = time.time() - t0
        # solve timing (warm): pair substitution
        b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        xr, xi = lu2.solve_pair(b, b)
        float(xr[0])
        t0 = time.time()
        xr, xi = lu2.solve_pair(b, b)
        float(xr[0])
        t_solve = time.time() - t0
        del lu, lu2, xr, xi
        row = dict(nb=nb, chunk=chunk, B=plan.B, bw=bwidth,
                   t_cold=round(t_cold, 2), t_warm=round(t_warm, 2),
                   t_solve=round(t_solve, 3),
                   tflops=round(flops / t_warm / 1e12, 2))
        results.append(row)
        print("RESULT " + json.dumps(row), flush=True)
    except Exception as e:
        print(f"nb={nb} chunk={chunk}: factor failed {type(e).__name__} {e}",
              flush=True)

with open("/tmp/factor_mfu.json", "w") as f:
    json.dump(results, f, indent=1)
print("done", flush=True)
