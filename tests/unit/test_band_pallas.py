"""Pallas band-substitution kernels (solver/band_pallas.py).

Validated on a real TPU v5e: forward substitution to f32 accuracy
(rel err ~3e-8) and the full production solve (forward + backward +
Dinv) against the XLA scan path through the wired
``BandedLU.solve_pair`` dispatch (``use_pallas``).  On CPU-only
runners the hardware cases skip and the XLA scan path is still
exercised through solver/band tests.
"""

import jax
import numpy as np
import pytest


def _have_real_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices("tpu"))
    except Exception:
        return False


@pytest.mark.skipif(not _have_real_tpu(), reason="needs TPU hardware")
def test_fwd_substitution_matches_numpy_on_tpu():
    import jax.numpy as jnp

    from lsafw_tpu.solver.band_pallas import fwd_substitute_pallas

    B, nb, rows = 4, 128, 24
    rng = np.random.default_rng(0)
    band_re = (rng.standard_normal((rows, 2 * B + 1, nb, nb)) * 2e-3).astype(np.float32)
    band_im = (rng.standard_normal((rows, 2 * B + 1, nb, nb)) * 2e-3).astype(np.float32)
    br = rng.standard_normal((rows, nb)).astype(np.float32)
    bi = rng.standard_normal((rows, nb)).astype(np.float32)

    Yr = np.zeros((B, nb)); Yi = np.zeros((B, nb))
    ref_r = np.zeros((rows, nb)); ref_i = np.zeros((rows, nb))
    for k in range(rows):
        Lr, Li = band_re[k, :B].astype(float), band_im[k, :B].astype(float)
        sr = np.einsum("tij,tj->i", Lr, Yr) - np.einsum("tij,tj->i", Li, Yi)
        si = np.einsum("tij,tj->i", Lr, Yi) + np.einsum("tij,tj->i", Li, Yr)
        ref_r[k] = br[k] - sr
        ref_i[k] = bi[k] - si
        Yr = np.vstack([Yr[1:], ref_r[k][None]])
        Yi = np.vstack([Yi[1:], ref_i[k][None]])

    tpu = jax.devices("tpu")[0]
    with jax.default_device(tpu):
        yr, yi = fwd_substitute_pallas(
            jnp.asarray(band_re), jnp.asarray(band_im),
            jnp.asarray(br), jnp.asarray(bi), B=B, nb=nb,
        )
    mag = max(np.abs(ref_r).max(), np.abs(ref_i).max())
    err = max(np.abs(np.asarray(yr) - ref_r).max(), np.abs(np.asarray(yi) - ref_i).max())
    assert err / mag < 1e-5


@pytest.mark.skipif(not _have_real_tpu(), reason="needs TPU hardware")
def test_full_pallas_solve_matches_xla_scan_on_tpu(monkeypatch):
    """Forward + backward + Dinv through the Pallas kernels vs the XLA
    scan path, on a real factored operator (wiring check; the path is
    opt-in pending the in-loop compile-cost diagnosis — see
    band._pallas_ok)."""
    monkeypatch.setenv("LSAFW_PALLAS_BAND", "1")
    import dataclasses

    import jax.numpy as jnp
    import scipy.sparse as sp

    from lsafw_tpu.solver.band import BandedLU

    rng = np.random.default_rng(5)
    n, bw = 1500, 150
    diags, offs = [], range(-bw, bw + 1)
    for o in offs:
        m = n - abs(o)
        diags.append((rng.standard_normal(m) + 1j * rng.standard_normal(m)) * 0.05)
    A = sp.diags(diags, list(offs), format="csr").astype(np.complex128)
    A = A + sp.identity(n, format="csr") * (2.0 * bw * 0.05 + 1.0)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    tpu = jax.devices("tpu")[0]
    with jax.default_device(tpu):
        # nb must be 128 (Mosaic lane tiling) for the Pallas path
        lu = BandedLU.from_complex_csr(A, nb=128, chunk=4)
        assert lu.use_pallas, "factor on TPU must enable the Pallas solve"
        x_pallas = lu.solve(b)
        lu_scan = dataclasses.replace(lu, use_pallas=False)
        x_scan = lu_scan.solve(b)
    rel = np.linalg.norm(x_pallas - x_scan) / np.linalg.norm(x_scan)
    assert rel < 1e-5, f"pallas vs scan mismatch: {rel:.2e}"
    res = np.linalg.norm(A @ x_pallas - b) / np.linalg.norm(b)
    assert res < 1e-4
