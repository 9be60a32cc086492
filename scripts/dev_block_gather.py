"""Probe: does gathering SLICES amortize the ~8 ns/index gather wall?

The round-2/3 measurements fixed the per-*element* cost of XLA gathers
at ~7-11 ns regardless of locality, which caps every scalar-gather
SpMV formulation (ELL at 520k: 295 ms).  If a gather of (1, W)
contiguous slices costs ~one index per W elements, a BCSR layout
(8-row x 128-col dense blocks, x gathered block-wise) turns the
unstructured SpMV into MXU work with 1/128th the index traffic
(VERDICT round-3 item 3).

Timing protocol: gathers are made iteration-dependent ((idx + i) mod n
— cheap VPU work vs the gather itself) so XLA cannot hoist them out of
the fori_loop, and results are forced to host with float() because
block_until_ready is a no-op on the axon tunnel.

Run on the real TPU:  timeout 1500 python scripts/dev_block_gather.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)


def slope(fn, *args, k_small=1, k_big=33):
    """Warm per-iteration seconds via the fori_loop slope protocol."""
    float(fn(*args, k_small))
    float(fn(*args, k_big))
    t0 = time.time(); float(fn(*args, k_small)); t1 = time.time() - t0
    t0 = time.time(); float(fn(*args, k_big)); tb = time.time() - t0
    return (tb - t1) / (k_big - k_small)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    N = 520_192          # x size (multiple of 128)
    NNZ = 15_400_000     # element-gather count (ELL-like)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    # (a) scalar element gather — the known ~8 ns/el wall
    idx_el = jnp.asarray(rng.integers(0, N, NNZ), dtype=jnp.int32)

    @jax.jit
    def g_scalar(x, idx, k):
        def body(i, acc):
            return acc + x[(idx + i) % N].sum()
        return lax.fori_loop(0, k, body, jnp.float32(0.0), unroll=1)

    s = slope(g_scalar, x, idx_el)
    print(f"scalar gather: {s*1e3:.2f} ms/iter = {s/NNZ*1e9:.2f} ns/element", flush=True)

    # (b) row-slice gathers of width W from x reshaped (N/W, W)
    for W in (8, 32, 128):
        nrows = NNZ // W
        nr = N // W
        xw = x.reshape(nr, W)
        idx_r = jnp.asarray(rng.integers(0, nr, nrows), dtype=jnp.int32)

        @jax.jit
        def g_rows(xw, idx, k):
            def body(i, acc):
                return acc + xw[(idx + i) % nr].sum()
            return lax.fori_loop(0, k, body, jnp.float32(0.0), unroll=1)

        s = slope(g_rows, xw, idx_r)
        print(f"slice gather W={W:3d}: {s*1e3:.2f} ms/iter = "
              f"{s/NNZ*1e9:.3f} ns/element ({s/nrows*1e9:.2f} ns/index)", flush=True)

    # (c) BCSR SpMM shape: per 8-row block, KB column-blocks of 128.
    # blocks: (NB, KB, 8, 128) dense values; xblk gathered (NB, KB, 128).
    NB = N // 8
    NCB = N // 128
    for KB in (4, 8):
        vals = jnp.asarray(
            rng.standard_normal((NB, KB, 8, 128)), dtype=jnp.float32)
        cols = jnp.asarray(rng.integers(0, NCB, (NB, KB)), dtype=jnp.int32)
        x128 = x.reshape(NCB, 128)

        @jax.jit
        def spmm(vals, cols, x128, k):
            def body(i, acc):
                xb = x128[(cols + i) % NCB]        # (NB, KB, 128) gather
                y = jnp.einsum("bkrc,bkc->br", vals, xb,
                               precision=lax.Precision.DEFAULT)
                return acc + y.sum()
            return lax.fori_loop(0, k, body, jnp.float32(0.0), unroll=1)

        s = slope(spmm, vals, cols, x128)
        eff_nnz = NB * KB * 8 * 128
        gb = vals.size * 4 / 1e9
        print(f"BCSR SpMM KB={KB}: {s*1e3:.2f} ms/iter, stored {gb:.2f} GB "
              f"-> {gb/s:.0f} GB/s, {eff_nnz/1e6:.0f}M eff-nnz "
              f"({s/ (NB*KB) *1e9:.1f} ns/block-gather)", flush=True)


if __name__ == "__main__":
    main()
