"""Time the band substitution: Pallas kernels vs XLA scan, warm, at
43k production-like shapes.  Decides the use_pallas default."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import scipy.sparse as sp
from jax import lax

from lsafw_tpu.solver.band import BandPlan, BandedLU

d = np.load("/root/repo/scripts/data/C43k_sig074.npz")
C = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
n = C.shape[0]
plan = BandPlan.build(C, nb=128, chunk=128)
lu = BandedLU.factor(plan,
    jnp.asarray(np.ascontiguousarray(C.data.real)),
    jnp.asarray(np.ascontiguousarray(C.data.imag)))
print(f"B={lu.B} rows_total={lu.band_re.shape[0]} use_pallas={lu.use_pallas}", flush=True)

rng = np.random.default_rng(0)
b = rng.standard_normal(n)
br = jnp.asarray(b)
bi = jnp.zeros(n)


def timed_solve(lu_obj, label, iters=10):
    @jax.jit
    def loop(lu_, br_, bi_, k):
        def body(i, st):
            xr, xi = lu_.solve_pair(st[0], st[1])
            nrm = jnp.sqrt(jnp.sum(xr * xr + xi * xi))
            return xr / nrm, xi / nrm
        return lax.fori_loop(0, k, body, (br_, bi_))[0].sum()

    float(loop(lu_obj, br, bi, 1))
    t0 = time.time(); float(loop(lu_obj, br, bi, 1)); t1 = time.time()
    float(loop(lu_obj, br, bi, iters + 1))
    t2 = time.time(); float(loop(lu_obj, br, bi, iters + 1)); t3 = time.time()
    per = ((t3 - t2) - (t1 - t0)) / iters
    print(f"{label}: {per*1e3:.1f} ms/solve (1-shot {1e3*(t1-t0):.1f} ms)", flush=True)
    return per


if lu.use_pallas:
    timed_solve(lu, "pallas fwd+bwd")
lu_scan = dataclasses.replace(lu, use_pallas=False)
timed_solve(lu_scan, "XLA scan")
