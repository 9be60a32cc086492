"""Sweep packed-BCSR block shapes on the REAL 175k cylinder Jacobian.

Measures per-apply time (complex shifted pair apply) and storage for
(br, bc) combinations of the round-4 packed layout, against the cached
production matrices (/tmp/AM167k.npz, written by dev_167k.py).

Run on TPU:  timeout 2400 python scripts/dev_bcsr_sweep.py
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import scipy.sparse as sp

from lsafw_tpu.ops.bcsr import BCSRPlan, BCSRShiftedOp
from lsafw_tpu.ops.sparse import CSRMatrix, SparsityPattern
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

z = np.load("/tmp/AM167k.npz")
n = int(z["shape"][0])
pat = SparsityPattern(
    shape=(n, n), indptr=z["indptr"].astype(np.int64),
    indices=z["indices"].astype(np.int32),
    slots=np.arange(len(z["indices"]), dtype=np.int32))
A = CSRMatrix(pat, jnp.asarray(z["Adata"]))
M = CSRMatrix(pat, jnp.asarray(z["Mdata"]))
sigma = 0.0 + 0.74j
print(f"n={n} nnz={pat.nnz}", flush=True)

As = sp.csr_matrix((z["Adata"], z["indices"], z["indptr"]), shape=(n, n))
Ms = sp.csr_matrix((z["Mdata"], z["indices"], z["indptr"]), shape=(n, n))
Cz = As - sigma * Ms
rng = np.random.default_rng(0)
x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
y_ref = Cz @ x

REPS = 30
results = []
for br, bc in [(16, 128), (16, 64), (16, 32), (16, 16), (16, 8),
               (8, 32), (8, 16), (32, 32)]:
    t0 = time.time()
    try:
        plan = BCSRPlan.build(
            sp.csr_matrix((np.ones(pat.nnz), pat.indices, pat.indptr),
                          shape=(n, n)), br=br, bc=bc)
        t_plan = time.time() - t0
        op = BCSRShiftedOp.from_csr(A, M, sigma, plan)

        @jax.jit
        def many(op, xr, xi):
            def body(i, c):
                yr, yi = op.matvec_pair_permuted(c[0], c[1])
                # renormalize so the loop can't be constant-folded
                s = jax.lax.rsqrt(jnp.sum(yr * yr) + jnp.sum(yi * yi))
                return (yr * s, yi * s)
            return jax.lax.fori_loop(0, REPS, body, (xr, xi))

        xr = jnp.asarray(x.real)[jnp.asarray(plan.perm)]
        xi = jnp.asarray(x.imag)[jnp.asarray(plan.perm)]
        yr, yi = op.matvec_pair(jnp.asarray(x.real), jnp.asarray(x.imag))
        err = float(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - y_ref).max()
                    / np.abs(y_ref).max())
        r = many(op, xr, xi)
        jax.block_until_ready(r)
        t0 = time.time()
        r = many(op, xr, xi)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / REPS * 1e3
        gb = 2 * plan.bytes_per_matrix / 1e9
        row = dict(br=br, bc=bc, KB=plan.KB, ms=round(dt, 3),
                   gb=round(gb, 3), err=err, t_plan=round(t_plan, 1),
                   fill=round(pat.nnz / plan.stored, 4))
        print("RESULT", json.dumps(row), flush=True)
        results.append(row)
        del op
    except Exception as e:
        print(f"br={br} bc={bc} FAILED: {type(e).__name__}: {e}", flush=True)

with open("/tmp/bcsr_sweep.json", "w") as f:
    json.dump(results, f, indent=1)
print("done", flush=True)
