"""Dev scratch: correctness of PivotedBandedLU on small operators."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import scipy.sparse as sp

from lsafw_tpu.solver.band import BandedLU, PivotedBandedLU, BandPlan

rng = np.random.default_rng(3)


def check(C, name, nb=8, chunk=4):
    n = C.shape[0]
    z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_ref = sp.linalg.spsolve(C.tocsc(), z)
    plan = BandPlan.build(C.tocsr(), nb=nb, chunk=chunk)
    for cls in (PivotedBandedLU, BandedLU):
        try:
            lu = cls.factor(
                plan,
                jnp.asarray(np.ascontiguousarray(C.tocsr().data.real)),
                jnp.asarray(np.ascontiguousarray(C.tocsr().data.imag)),
            )
            x = lu.solve(z)
            err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
            res = np.linalg.norm(C @ x - z) / np.linalg.norm(z)
        except Exception as e:
            err = res = float("nan")
            print(f"  {cls.__name__}: EXC {e!r}")
            continue
        print(f"{name} {cls.__name__}: rel_err={err:.2e} rel_res={res:.2e}")


# 1. random banded complex, diagonally OK
n = 200
bw = 11
A = sp.lil_matrix((n, n), dtype=np.complex128)
for i in range(n):
    for j in range(max(0, i - bw), min(n, i + bw + 1)):
        if rng.random() < 0.4 or i == j:
            A[i, j] = rng.standard_normal() + 1j * rng.standard_normal()
A = A + sp.diags(np.full(n, 4.0 + 0j))
check(A.tocsr(), "random-banded")

# 2. saddle-point-like: [[K, G], [G^T, 0]] interleaved so the zero
# diagonal rows sit inside the band (pivot-free should fail or need
# regularization; pivoted must nail it)
m = 120
K = sp.diags([4.0 * np.ones(m), -1.0 * np.ones(m - 1), -1.0 * np.ones(m - 1)], [0, -1, 1])
G = sp.diags([1.0 * np.ones(m), 0.7 * np.ones(m - 1)], [0, -1], shape=(m, m))
S = sp.bmat([[K, G], [G.T, None]], format="csr")
# interleave u/p DOFs: perm [u0, p0, u1, p1, ...]
pidx = np.empty(2 * m, dtype=np.int64)
pidx[0::2] = np.arange(m)
pidx[1::2] = np.arange(m, 2 * m)
Si = S[pidx][:, pidx].tocsr()
Si = sp.csr_matrix(Si.astype(np.complex128))
check(Si, "saddle-interleaved")

# 3. growth-bomb: matrix engineered to overflow pivot-free f32
# elimination (tiny diagonals with large off-diagonals)
n = 256
D = sp.lil_matrix((n, n), dtype=np.complex128)
for i in range(n):
    D[i, i] = 1e-6 if i % 3 else 1.0
    if i + 1 < n:
        D[i, i + 1] = 1.0
        D[i + 1, i] = 1.0
    if i + 5 < n:
        D[i, i + 5] = 0.5
check(D.tocsr(), "growth-bomb")
