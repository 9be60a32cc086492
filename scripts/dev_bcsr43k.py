"""Time the BCSR pair apply on the real 43k shifted Jacobian vs the
scalar-gather baseline — the refinement-matvec workhorse decision.

Run on TPU:  timeout 1500 python scripts/dev_bcsr43k.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import scipy.sparse as sp
from jax import lax

from lsafw_tpu.ops.bcsr import BCSRPlan, BCSRPairOperator

d = np.load("/root/repo/scripts/data/C43k_sig074.npz")
C = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
n = C.shape[0]
print(f"n={n} nnz={C.nnz}", flush=True)

for br, bc in ((8, 128), (8, 64), (16, 128)):
    plan = BCSRPlan.build(sp.csr_matrix(
        (np.ones(C.nnz), C.indices.copy(), C.indptr.copy()), shape=C.shape),
        br=br, bc=bc)
    t0 = time.time()
    vr = jnp.zeros(plan.stored, jnp.float64).at[plan.pos].set(
        jnp.asarray(C.data.real)).reshape(plan.NBR, plan.KB, br, bc)
    vi = jnp.zeros(plan.stored, jnp.float64).at[plan.pos].set(
        jnp.asarray(C.data.imag)).reshape(plan.NBR, plan.KB, br, bc)
    op = BCSRPairOperator(vr, vi, plan.colblk, plan.perm_d, plan.iperm_d,
                          plan.n, br, bc, plan.NCB)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(n))
    xi = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def loop(op, xr, xi, k):
        def body(i, st):
            yr, yi = op.matvec_pair_permuted(st[0], st[1])
            nrm = jnp.sqrt(jnp.sum(yr * yr + yi * yi))
            return yr / nrm, yi / nrm
        st = lax.fori_loop(0, k, body, (xr, xi))
        return st[0].sum()

    # correctness first (one apply, original order)
    yr, yi = op.matvec_pair(xr, xi)
    z = np.asarray(yr) + 1j * np.asarray(yi)
    z_ref = C @ (np.asarray(xr) + 1j * np.asarray(xi))
    err = np.abs(z - z_ref).max() / np.abs(z_ref).max()
    float(loop(op, xr, xi, 1))
    float(loop(op, xr, xi, 33))
    t0 = time.time(); float(loop(op, xr, xi, 1)); t1 = time.time() - t0
    t0 = time.time(); float(loop(op, xr, xi, 33)); tb = time.time() - t0
    ms = (tb - t1) / 32 * 1e3
    gb = (vr.nbytes + vi.nbytes) / 1e9
    print(f"br={br} bc={bc}: KB={plan.KB} stored {gb:.2f} GB f64, pair apply "
          f"{ms:.2f} ms ({gb/ (ms/1e3):.0f} GB/s), err {err:.2e}", flush=True)
