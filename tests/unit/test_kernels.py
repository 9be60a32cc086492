"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import scipy.sparse as sp

from lsafw_tpu.ops.kernels import spmv_ell_pallas, spmv_pallas
from lsafw_tpu.ops.sparse import CSRMatrix, spmv

import jax.numpy as jnp


def test_pallas_ell_spmv_matches_xla():
    rng = np.random.default_rng(0)
    A = sp.random(300, 300, 0.05, format="csr", random_state=1) + sp.eye(300)
    Ac = CSRMatrix.from_scipy(sp.csr_matrix(A))
    x = jnp.asarray(rng.standard_normal(300))
    y_ref = np.asarray(spmv(Ac, x))
    data_ell = jnp.where(Ac.dev.ell_map >= 0, Ac.data[Ac.dev.ell_map], 0.0)
    y_pl = np.asarray(
        spmv_ell_pallas(data_ell, Ac.dev.ell_cols, x, block_rows=128, interpret=True)
    )
    assert np.allclose(y_pl, y_ref, atol=1e-12)
    # front-end falls back cleanly off-TPU
    y_fb = np.asarray(spmv_pallas(Ac, x))
    assert np.allclose(y_fb, y_ref, atol=1e-12)
