"""Exact f32-channel segment sum (ops/exact.py).

The TPU assembly path depends on this being *exact* (not just close):
the f64 scatter it replaces is the accumulation step of FEM assembly
(reference analog: PETSc MatSetValues ADD_VALUES semantics).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.ops.exact import (
    MAX_ADDENDS,
    _gather_split,
    gather_f64_fast,
    segment_sum_exact,
    segment_sum_fast,
)


def _reference(values, ids, n):
    """fsum-exact per-segment reference."""
    out = np.zeros(n)
    buckets = [[] for _ in range(n)]
    for v, s in zip(values, ids):
        buckets[s].append(float(v))
    for s, b in enumerate(buckets):
        out[s] = math.fsum(b)
    return out


@pytest.mark.parametrize("span", [1.0, 1e4, 1e8])
def test_exact_matches_fsum(span):
    rng = np.random.default_rng(42)
    m, n = 20000, 700
    mags = np.exp(rng.uniform(-np.log(span), 0.0, m))
    vals = rng.standard_normal(m) * mags
    ids = rng.integers(0, n, m).astype(np.int32)
    got = np.asarray(segment_sum_exact(jnp.asarray(vals), jnp.asarray(ids), n))
    ref = _reference(vals, ids, n)
    # recombination rounds num_chunks-1 f64 adds whose partial sums are
    # bounded by the per-segment absolute sum; values far below the
    # global max degrade gracefully (module docstring)
    abs_seg = _reference(np.abs(vals), ids, n)
    tol = np.maximum(4 * np.finfo(np.float64).eps * abs_seg,
                     (1e-12 if span > 1e4 else 0.0) * np.abs(vals).max())
    assert (np.abs(got - ref) <= tol + 1e-300).all()


def test_exact_uniform_magnitudes_bitexact():
    rng = np.random.default_rng(0)
    m, n = 4096, 97
    vals = rng.standard_normal(m)
    ids = rng.integers(0, n, m).astype(np.int32)
    got = np.asarray(segment_sum_exact(jnp.asarray(vals), jnp.asarray(ids), n))
    ref = _reference(vals, ids, n)
    assert np.abs(got - ref).max() <= 4 * np.finfo(np.float64).eps * np.abs(ref).max()


def test_exact_handles_zeros_and_signs():
    vals = jnp.asarray([0.0, -0.0, 1.0, -1.0, 1e-30, -1e-30, 3.5, -3.5])
    ids = jnp.asarray(np.zeros(8, dtype=np.int32))
    got = float(segment_sum_exact(vals, ids, 1)[0])
    assert got == 0.0
    got = np.asarray(segment_sum_exact(jnp.zeros(8), ids, 2))
    assert (got == 0.0).all()


def test_max_addends_bound_documented():
    # FEM patterns stay single-digit contributions per slot; the scheme
    # is exact up to MAX_ADDENDS addends per segment
    assert MAX_ADDENDS == 512
    rng = np.random.default_rng(7)
    vals = rng.standard_normal(MAX_ADDENDS)
    ids = np.zeros(MAX_ADDENDS, dtype=np.int32)
    got = float(segment_sum_exact(jnp.asarray(vals), jnp.asarray(ids), 1)[0])
    assert abs(got - math.fsum(vals)) <= 8 * np.finfo(np.float64).eps * np.abs(vals).sum()


def test_gather_split_accuracy():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(5000) * np.exp(rng.uniform(-20, 20, 5000))
    idx = rng.integers(0, 5000, (300, 7)).astype(np.int32)
    got = np.asarray(_gather_split(jnp.asarray(x), jnp.asarray(idx)))
    ref = x[idx]
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel.max() <= 2.0**-48
    # 2D row-gather semantics (used by gather_velocity_nodes)
    x2 = x[:100].reshape(50, 2)
    got2 = np.asarray(_gather_split(jnp.asarray(x2), jnp.asarray(idx[:10] % 50)))
    assert np.allclose(got2, x2[idx[:10] % 50], rtol=2.0**-47, atol=0)
    # dispatch wrapper: exact on the cpu backend, split-accurate when a
    # TPU is the default backend (this suite runs under both)
    got3 = np.asarray(gather_f64_fast(jnp.asarray(x), jnp.asarray(idx)))
    rel3 = np.abs(got3 - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel3.max() <= 2.0**-48


def test_fast_dispatch_matches_plain_on_cpu():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal(1000)
    ids = rng.integers(0, 50, 1000).astype(np.int32)
    a = np.asarray(segment_sum_fast(jnp.asarray(vals), jnp.asarray(ids), 50))
    ref = _reference(vals, ids, 50)
    assert np.allclose(a, ref, rtol=0, atol=1e-13)
    # f32 input passes straight through
    b = segment_sum_fast(jnp.asarray(vals, jnp.float32), jnp.asarray(ids), 50)
    assert b.dtype == jnp.float32
