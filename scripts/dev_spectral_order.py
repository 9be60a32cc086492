"""Probe: spectral (Fiedler-vector) ordering vs RCM max-bandwidth on the
production 43k cylinder Jacobian pattern.

Band memory is linear and factor flops quadratic in MAX bandwidth (the
block band uses a uniform B), so only the max matters — spectral
orderings optimize envelope/2-sum and can lose on max.  Measure, don't
guess.

MEASURED (43k production Jacobian pattern): NEGATIVE for spectral.
native RCM bw=793, Fiedler-ordered bw=1696 (2.1x WORSE on max even
though spectral typically wins on envelope).  RCM stays the ordering;
the remaining bandwidth slack on graded cylinder meshes is geometric
(the refined-wake vertical cut), not an ordering artifact.

CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/dev_spectral_order.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

d = np.load(os.path.join(os.path.dirname(__file__), "data", "C43k_sig074.npz"))
C = sp.csr_matrix((np.ones_like(d["data"].real), d["indices"], d["indptr"]),
                  shape=tuple(d["shape"]))
S = ((C + C.T) > 0).astype(np.float64).tocsr()
n = S.shape[0]

def bandwidth(pat, perm):
    ip = np.empty(n, np.int64); ip[perm] = np.arange(n)
    coo = pat.tocoo()
    return int(np.max(np.abs(ip[coo.row] - ip[coo.col])))

from lsafw_tpu.solver.band import rcm_permutation
t0 = time.time()
p_rcm = rcm_permutation(S)
print(f"native RCM: bw={bandwidth(S, p_rcm)} ({time.time()-t0:.1f}s)", flush=True)

# graph Laplacian Fiedler vector
deg = np.asarray(S.sum(axis=1)).ravel()
L = sp.diags(deg) - S
t0 = time.time()
vals, vecs = spla.eigsh(L, k=2, sigma=-1e-3, which="LM", tol=1e-6)
fiedler = vecs[:, np.argsort(vals)[1]]
p_spec = np.argsort(fiedler)
print(f"spectral: bw={bandwidth(S, p_spec)} ({time.time()-t0:.1f}s)", flush=True)

# hybrid: RCM restarted from the spectral extreme node
print("DONE")
