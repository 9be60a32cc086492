"""Packed-BCSR block-shape sweep on the 520k bench operator (f64 path).

VERDICT r4 item 6: the f64 BCSR apply (8.8 ms at (16,32), fill 0.046)
loses to the 8-rank PETSc proxy (6.2 ms).  95% of the moved/multiplied
data is block padding; this sweep measures how much tighter blocks buy
on the REAL bench pattern (the structured 520k Taylor-Hood operator of
bench.py) for both the f32 and clean-f64 applies.

Run on TPU:  timeout 2400 python scripts/dev_bcsr520k.py
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.ops.bcsr import BCSRPlan, BCSROperator
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

nx = int(os.environ.get("BENCH_NX", "240"))
mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), nx, nx)
spaces = define_spaces(mesh)
ctx = AssemblyContext.build(spaces)
n = spaces.num_dofs
nnz = ctx.pattern.nnz
rng = np.random.default_rng(0)
data = rng.standard_normal(nnz)
A = CSRMatrix(ctx.pattern, jnp.asarray(data))
import scipy.sparse as sp

As = sp.csr_matrix((data, ctx.pattern.indices, ctx.pattern.indptr), shape=(n, n))
x = rng.standard_normal(n)
y_ref = As @ x
print(f"n={n} nnz={nnz}", flush=True)

K = 50
results = []
for br, bc in [(16, 32), (16, 16), (16, 8), (8, 16), (8, 8), (32, 32),
               (32, 16), (16, 4)]:
    try:
        t0 = time.time()
        plan = BCSRPlan.build(
            sp.csr_matrix((np.ones(nnz), ctx.pattern.indices,
                           ctx.pattern.indptr), shape=(n, n)), br=br, bc=bc)
        t_plan = time.time() - t0
        op = BCSROperator.from_csr(A, plan)
        xp = jnp.asarray(x)[plan.perm_d]

        def timed(kind):
            @jax.jit
            def loop(op, xv, k):
                def body(i, y):
                    y2 = (op.matvec_permuted(y) if kind == "f64"
                          else op.matvec_permuted32(y))
                    return y2 / jnp.linalg.norm(y2)
                y = jax.lax.fori_loop(0, k, body, xv)
                return jnp.vdot(y, y)

            xv = xp if kind == "f64" else xp.astype(jnp.float32)
            float(loop(op, xv, 1))
            t1 = time.time(); float(loop(op, xv, 1)); t1 = time.time() - t1
            tk = time.time(); float(loop(op, xv, K + 1)); tk = time.time() - tk
            return max((tk - t1) / K, 1e-9)

        # accuracy of one f64 apply
        yp = np.asarray(op.matvec_permuted(xp))
        err = np.linalg.norm(yp - y_ref[plan.perm]) / np.linalg.norm(y_ref)
        t64 = timed("f64")
        t32 = timed("f32")
        row = dict(br=br, bc=bc, KB=plan.KB, stored=plan.stored,
                   fill=nnz / plan.stored, t_plan=t_plan,
                   ms64=t64 * 1e3, ms32=t32 * 1e3, err64=float(err),
                   gbps64=plan.stored * 8 / t64 / 1e9,
                   gbps32=plan.stored * 4 / t32 / 1e9)
        results.append(row)
        print(json.dumps(row), flush=True)
        del op
    except Exception as e:
        print(f"({br},{bc}) failed: {e!r}", flush=True)

with open("/tmp/bcsr520k_sweep.json", "w") as f:
    json.dump(results, f, indent=1)
best = min(results, key=lambda r: r["ms64"])
print(f"BEST f64: br={best['br']} bc={best['bc']} {best['ms64']:.2f} ms "
      f"(fill {best['fill']:.3f}, err {best['err64']:.1e})", flush=True)
