"""Dev: factor the saved 43k reduced-cylinder operators and measure
refinement contraction for pivot-free vs pivoted band LU.

Usage: python scripts/dev_pivot_43k.py [J43k_re47|J43k_re16|C43k_sig074] [pivot|nopivot]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import scipy.sparse as sp

from lsafw_tpu.solver.band import (
    BandedLU, PivotedBandedLU, BandPlan, regularize_saddle_data,
)

name = sys.argv[1] if len(sys.argv) > 1 else "J43k_re47"
mode = sys.argv[2] if len(sys.argv) > 2 else "pivot"
d = np.load(os.path.join(os.path.dirname(__file__), "data", f"{name}.npz"))
C = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
n = C.shape[0]
print(f"{name}: n={n} nnz={C.nnz} dtype={C.dtype}", flush=True)

NB = int(os.environ.get("DEV_NB", "128"))
CHUNK = int(os.environ.get("DEV_CHUNK", "64"))
t0 = time.time()
plan = BandPlan.build(C, nb=NB, chunk=CHUNK)
print(f"plan: nb={NB} B={plan.B} nblk_pad={plan.nblk_pad} ({time.time()-t0:.1f}s)", flush=True)

dre = jnp.asarray(np.ascontiguousarray(C.data.real.astype(np.float64)))
dim = jnp.asarray(np.ascontiguousarray(C.data.imag.astype(np.float64)))

t0 = time.time()
if mode == "pivot":
    lu = PivotedBandedLU.factor(plan, dre, dim)
    t_warm0 = time.time()
    lu = PivotedBandedLU.factor(plan, dre, dim)
    print(f"warm factor: {time.time()-t_warm0:.2f}s", flush=True)
elif mode == "nopivot_warm":
    lu = BandedLU.factor(plan, dre, dim)
    t_warm0 = time.time()
    lu = BandedLU.factor(plan, dre, dim)
    print(f"warm factor: {time.time()-t_warm0:.2f}s", flush=True)
else:
    # mimic the production path: saddle regularization on diag slots
    diag = C.diagonal()
    # find diag slots in CSR order
    idx = []
    for i in range(n):
        row = slice(C.indptr[i], C.indptr[i + 1])
        cols = C.indices[row]
        j = np.searchsorted(cols, i)
        idx.append(C.indptr[i] + j)
    dre2 = regularize_saddle_data(dre, dim, np.asarray(idx))
    lu = BandedLU.factor(plan, dre2, dim)
print(f"factor: {time.time()-t0:.1f}s", flush=True)

# contraction: one MR-free Richardson pass residual ratio
rng = np.random.default_rng(11)
b0 = rng.standard_normal(n)
b0 /= np.linalg.norm(b0)
br, bi = jnp.asarray(b0), jnp.zeros(n)
t0 = time.time()
xr, xi = lu.solve_pair(br, bi)
x = np.asarray(xr) + 1j * np.asarray(xi)
r = b0 - C @ x
rho = np.linalg.norm(r)
print(f"solve: {time.time()-t0:.1f}s  contraction rho = {rho:.3e}", flush=True)

# a second refinement pass
dr, di = lu.solve_pair(jnp.asarray(r.real.copy()), jnp.asarray(r.imag.copy()))
x2 = x + (np.asarray(dr) + 1j * np.asarray(di))
r2 = b0 - C @ x2
print(f"after refine: {np.linalg.norm(r2):.3e} (ratio {np.linalg.norm(r2)/max(rho,1e-300):.2e})", flush=True)
