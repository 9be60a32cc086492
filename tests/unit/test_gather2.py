"""Two-pass lane-planned gather (ops/gather2.py)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lsafw_tpu.ops.gather2 import (
    gather_two_pass_f32,
    pack_ell_data,
    plan_two_pass,
    spmv_two_pass,
)


def _random_ell(n=300, w=12, n_x=400, seed=0, clustered=True):
    rng = np.random.default_rng(seed)
    if clustered:
        # FEM-like: columns cluster near a center (forces residue
        # collisions across the +-128 wraps)
        centers = rng.integers(0, n_x, n)
        cols = (centers[:, None] + rng.integers(-130, 130, (n, w))) % n_x
    else:
        cols = rng.integers(0, n_x, (n, w))
    valid = rng.random((n, w)) < 0.9
    valid[:, 0] = True
    cols = cols.astype(np.int32)
    return cols, valid


def test_two_pass_gather_matches_direct():
    cols, valid = _random_ell()
    n_x = 400
    plan = plan_two_pass(cols, valid, n_x)
    assert plan.rounds >= 2  # clustered columns force real rounds
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n_x).astype(np.float32)
    g = np.asarray(gather_two_pass_f32(plan, jnp.asarray(x)))
    emap = np.asarray(plan.ell_map)
    for r in range(plan.rounds):
        ii, ll = np.nonzero(emap[r] >= 0)
        k = emap[r][ii, ll]
        np.testing.assert_array_equal(g[r][ii, ll], x[cols[ii, k]])
    # every valid entry is covered exactly once across rounds
    counts = np.zeros_like(valid, dtype=int)
    for r in range(plan.rounds):
        ii, ll = np.nonzero(emap[r] >= 0)
        counts[ii, emap[r][ii, ll]] += 1
    assert (counts[valid] == 1).all() and (counts[~valid] == 0).all()


def test_two_pass_spmv_matches_scipy():
    cols, valid = _random_ell(seed=3)
    n, w = cols.shape
    n_x = 400
    rng = np.random.default_rng(4)
    data = np.where(valid, rng.standard_normal((n, w)), 0.0)
    plan = plan_two_pass(cols, valid, n_x)
    packed = pack_ell_data(plan, jnp.asarray(data))
    x = rng.standard_normal(n_x)
    y = np.asarray(spmv_two_pass(plan, packed, jnp.asarray(x)))
    rowsidx = np.repeat(np.arange(n), w)
    A = sp.csr_matrix(
        (data.reshape(-1), (rowsidx, cols.reshape(-1))), shape=(n, n_x)
    )
    ref = A @ x
    assert np.abs(y - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())
