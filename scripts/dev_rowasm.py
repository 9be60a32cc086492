"""Measure row-gather vs segment-sum assembly on TPU (175k production mesh).

Slope protocol (tunnel dispatch ~150 ms, block_until_ready no-op): the
Jacobian assembly runs K times inside one jitted fori_loop with the
baseflow rescaled per iteration (defeats CSE); cost = (t_K - t_1)/(K-1).

Run on TPU:  timeout 3000 python scripts/dev_rowasm.py
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from lsafw_tpu.config import load_bc_config, load_cylinder_flow_config, load_facet_config
from lsafw_tpu.fem.assembly import AssemblyContext, scatter_entries
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import linearized_ns_elements
from lsafw_tpu.ops.sparse import assemble_csr_data
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

cfg = os.path.join(os.path.dirname(__file__), "..", "config_files", "2D", "cylinder")
geo = load_cylinder_flow_config(os.path.join(cfg, "geometry.toml"))
marker_fn = load_facet_config(os.path.join(cfg, "facets.toml"))
mesh = cylinder_flow_mesh(geo)
mark_boundary_facets(mesh, marker_fn)
spaces = define_spaces(mesh)
print(f"{spaces.num_dofs} DOFs", flush=True)

w = jnp.asarray(np.load("/tmp/w167k.npy")) if os.path.exists("/tmp/w167k.npy") \
    else jnp.zeros(spaces.num_dofs)

results = {}
for mode, env in (("row", "1"), ("segment", "0")):
    os.environ["LSAFW_ROW_ASSEMBLY"] = env
    t0 = time.time()
    ctx = AssemblyContext.build(spaces)
    print(f"{mode}: ctx build {time.time()-t0:.1f}s "
          f"(plan={'yes' if ctx.row_plan is not None else 'no'})", flush=True)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def many(ctx, w, K):
        def body(i, acc):
            el = linearized_ns_elements(ctx, w * (1.0 + 1e-9 * i), 47.0)
            return acc + scatter_entries(ctx, el)[::1024].sum()
        return jax.lax.fori_loop(0, K, body, 0.0)

    # device sync via scalar fetch: block_until_ready is a NO-OP on the
    # axon tunnel (bench.py protocol)
    float(many(ctx, w, 1))
    t0 = time.time(); float(many(ctx, w, 1)); t1 = time.time() - t0
    float(many(ctx, w, 7))
    t0 = time.time(); float(many(ctx, w, 7)); t7 = time.time() - t0
    per = (t7 - t1) / 6
    print(f"{mode}: {per*1e3:.0f} ms/assembly (t1={t1:.2f}s t7={t7:.2f}s)",
          flush=True)
    results[mode] = per

    # correctness cross-check once per mode
    el = linearized_ns_elements(ctx, w, 47.0)
    data = scatter_entries(ctx, el)
    if "ref" not in results:
        results["ref"] = np.asarray(data)
    else:
        err = np.abs(np.asarray(data) - results["ref"]).max()
        rel = err / np.abs(results["ref"]).max()
        print(f"cross-path max rel err: {rel:.2e}", flush=True)
        assert rel < 1e-12

print(json.dumps({k: v for k, v in results.items() if k != 'ref'}), flush=True)
