"""f64-effective BCSR SpMV variants at 520k (VERDICT r4 item 6).

The round-4 f64 BCSR apply (8.8 ms, 194 GB/s) loses to the 8-rank
PETSc proxy (6.2 ms) while the f32 channel (2.0 ms) beats it 3x.  This
script measures, on the bench's own 520k Taylor-Hood operator:

  v64   : matvec_permuted        — full double-float multiply-reduce
  vdc   : matvec_permuted_dc     — f64 accumulation for the dominant
          v_hi*x_hi term only; 2^-24 tails via f32-HIGHEST MXU einsums
  vpet  : dominant term as einsum(..., preferred_element_type=f64)
          + the same f32 tails (does XLA emit a cheaper f64 reduce?)
  v32   : matvec_permuted32      — the floor (1e-7 grade)

plus the AMORTIZED effective-f64 protocol the solvers actually use
(hi-only inner applies + one f64 apply per outer residual), verifying
its end accuracy against scipy f64.

Run on TPU:  timeout 1200 python scripts/dev_f64_spmv.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.ops.bcsr import BCSROperator, default_block_shape, plan_for_pattern
from lsafw_tpu.ops.sparse import CSRMatrix

NX = int(os.environ.get("NX", "240"))
K = int(os.environ.get("K", "50"))

t0 = time.time()
mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), NX, NX)
spaces = define_spaces(mesh)
ctx = AssemblyContext.build(spaces)
n = spaces.num_dofs
nnz = ctx.pattern.nnz
print(f"setup: n={n} nnz={nnz} ({time.time()-t0:.0f}s)", flush=True)

rng = np.random.default_rng(0)
data_np = rng.standard_normal(nnz)
A64 = CSRMatrix(ctx.pattern, jnp.asarray(data_np))
br, bc = default_block_shape()
plan = plan_for_pattern(A64, br=br, bc=bc)
op = BCSROperator.from_csr(A64, plan)
print(f"plan: br={br} bc={bc} stored {plan.stored/1e6:.0f}M", flush=True)

x_np = rng.standard_normal(n)
xp0 = jnp.asarray(x_np)

# scipy reference in the PERMUTED space (one apply)
import scipy.sparse as sp

S = sp.csr_matrix(
    (data_np, np.asarray(ctx.pattern.indices),
     np.asarray(ctx.pattern.indptr)), shape=(n, n))
perm = np.asarray(plan.perm_d)
Sp = S[perm][:, perm]
y_ref = Sp @ x_np[perm]
scale = np.linalg.norm(y_ref)

hp = jax.lax.Precision.HIGHEST


def vpet_apply(op, xp):
    xgh, xgl = op._xg_hilo(xp)

    def step(_, vx):
        vh, vl, xh, xl = vx
        dom = jnp.einsum("gkrc,gkc->gr", vh, xh,
                         preferred_element_type=jnp.float64, precision=hp)
        cor = (jnp.einsum("gkrc,gkc->gr", vh, xl, precision=hp)
               + jnp.einsum("gkrc,gkc->gr", vl, xh, precision=hp))
        return None, dom + cor.astype(jnp.float64)

    _, y = lax.scan(step, None, (op.v_hi, op.v_lo, xgh, xgl))
    return op._unpad(y)


def timeit(name, fn, dtype):
    x0 = jnp.asarray(x_np[perm], dtype=dtype)

    @jax.jit
    def loop(op, x, k):
        def body(i, y):
            y2 = fn(op, y)
            return (y2 / jnp.linalg.norm(y2)).astype(dtype)

        y = lax.fori_loop(0, k, body, x)
        return jnp.vdot(y, y)

    t0 = time.time(); float(loop(op, x0, 1)); tc = time.time() - t0
    t0 = time.time(); float(loop(op, x0, 1)); t1 = time.time() - t0
    t0 = time.time(); float(loop(op, x0, K + 1)); tk = time.time() - t0
    t = max((tk - t1) / K, 1e-9)
    y = np.asarray(fn(op, jnp.asarray(x_np[perm], dtype)))
    err = np.linalg.norm(y - y_ref) / scale
    print(f"{name}: {t*1e3:.3f} ms/iter  rel_err={err:.2e} "
          f"(compile {tc:.0f}s)", flush=True)
    return t, err


r = {}
r["v32"] = timeit("v32 ", lambda o, x: o.matvec_permuted32(x), jnp.float32)
r["v64"] = timeit("v64 ", lambda o, x: o.matvec_permuted(x), jnp.float64)
r["vdc"] = timeit("vdc ", lambda o, x: o.matvec_permuted_dc(x), jnp.float64)
r["vpet"] = timeit("vpet", vpet_apply, jnp.float64)

# amortized effective-f64: the solvers' defect-correction protocol —
# k_inner f32 applies (hi-only channels) + ONE accurate apply for the
# outer residual.  k=7 ~ the GCR window of the SI refinement.
k_in = 7
best64 = min(r["v64"][0], r["vdc"][0], r["vpet"][0])
eff = (k_in * r["v32"][0] + best64) / (k_in + 1)
print(f"effective f64 (k={k_in} inner f32 + 1 accurate): {eff*1e3:.3f} ms",
      flush=True)

import json

out = dict(n=n, stored=int(plan.stored),
           v32_ms=r["v32"][0] * 1e3, v64_ms=r["v64"][0] * 1e3,
           vdc_ms=r["vdc"][0] * 1e3, vpet_ms=r["vpet"][0] * 1e3,
           vdc_err=r["vdc"][1], vpet_err=r["vpet"][1],
           eff_f64_ms=eff * 1e3)
print(json.dumps(out), flush=True)
with open("/tmp/dev_f64_spmv.json", "w") as f:
    json.dump(out, f)
