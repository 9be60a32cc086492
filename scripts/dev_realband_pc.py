"""Probe: real single-channel band factor of C_r = A - Re(sigma) M as
the MR-refinement preconditioner for the full complex C = A - sigma M.

If the contraction rho stays well under 1, the complex-shift SI can ride
a HALF-memory band (one channel instead of two) — at 500k DOFs that is
the difference between an untruncated 8.5 GB bf16 band and a truncated
17 GB one.  Expected rho ~ |Im sigma| * ||M C_r^-1||.

MEASURED (43k production Jacobian, sigma = 0.018+0.74j): NEGATIVE.
rho = 0.61 on the first MR pass, then stalls at ~0.99 — C_r =
A - Re(sigma) M is nearly singular at the critical eigenvalue's real
part, so C_r^-1 amplifies the Im(sigma) M perturbation instead of
damping it.  The complex-shift SI keeps the two-channel band; memory
past HBM is handled by band truncation (band.py max_bytes), not by
dropping the imaginary channel.

CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/dev_realband_pc.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import scipy.sparse as sp

from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.band import factor_auto, plan_for_csr, BandedLU

d = np.load(os.path.join(os.path.dirname(__file__), "data", "C43k_sig074.npz"))
C = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
n = C.shape[0]
print(f"n={n} nnz={C.nnz}", flush=True)

# real-part operator (same pattern; Im entries just become explicit zeros)
Cr_data = np.ascontiguousarray(C.data.real)
Ccsr = CSRMatrix.from_scipy(
    sp.csr_matrix((np.ones(C.nnz), C.indices.copy(), C.indptr.copy()), shape=C.shape))

t0 = time.time()
plan = plan_for_csr(Ccsr, real=True)
blu, pivoted = factor_auto(plan, jnp.asarray(Cr_data), diag_slots=Ccsr.pattern.diag_slots)
print(f"real band factor: {time.time()-t0:.1f}s pivoted={pivoted} "
      f"bw={plan.B*plan.nb}", flush=True)

rng = np.random.default_rng(11)
br = rng.standard_normal(n); br /= np.linalg.norm(br)
bi = np.zeros(n)

xr, xi = blu.solve_pair(jnp.asarray(br), jnp.asarray(bi))
xr, xi = np.asarray(xr), np.asarray(xi)
x = xr + 1j * xi
b = br + 1j * bi
r = b - C @ x
rn_prev = np.linalg.norm(r)
print(f"initial rel res {rn_prev:.3e}")

for k in range(30):
    dr, di = blu.solve_pair(jnp.asarray(r.real.copy()), jnp.asarray(r.imag.copy()))
    dd = np.asarray(dr) + 1j * np.asarray(di)
    Cd = C @ dd
    alpha = np.vdot(Cd, r) / max(np.vdot(Cd, Cd).real, 1e-300)
    x = x + alpha * dd
    r = r - alpha * Cd
    rn = np.linalg.norm(r)
    print(f"  MR pass {k}: rel res {rn:.3e}  rho {rn/rn_prev:.3f}")
    rn_prev = rn
    if rn < 1e-10:
        break
print("DONE")
