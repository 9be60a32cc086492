"""Probe 2: is the two-pass take_along_axis gather fast on TPU?

Scheme for arbitrary gather y[m,l] = x[idx[m,l]] with x VMEM-resident:
  x2d = x.reshape(-1, 128)
  T[m,l] = x2d[idx[m,l] // 128, l]      (take_along_axis, axis=0)
  y[m,l] = T[m, perm[m,l]]              (take_along_axis, axis=1)
only valid when each row's lane residues idx[m,:] % 128 are distinct —
the SpMV plan splits rows into rounds to guarantee it.  Here we time
the primitive on synthetic lane-unique indices:
  * XLA at full size (is Pallas even needed?)
  * Pallas grid kernel with x2d fully VMEM-resident
  * baseline: plain XLA gather x[idx]

Run: python scripts/dev_pallas_gather2.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, x0, *args, iters=30):
    # thread the accumulator through the gathered operand so XLA cannot
    # hoist the loop-invariant gather out of the fori_loop; all arrays
    # are jit ARGUMENTS (closing over them embeds them as constants and
    # blows up the remote-compile payload)
    def loop(iters_):
        @jax.jit
        def run(x_, *a):
            def body(i, st):
                xx, acc = st
                s_ = f(xx, *a).sum() * 1e-30
                return xx + s_, acc + s_
            return lax.fori_loop(0, iters_, body, (x_, jnp.float32(0)))[1]
        return run
    g = loop(iters); float(g(x0, *args))
    t0 = time.time(); float(g(x0, *args)); t1 = time.time()
    g1 = loop(1); float(g1(x0, *args))
    t2 = time.time(); float(g1(x0, *args)); t3 = time.time()
    return ((t1 - t0) - (t3 - t2)) / (iters - 1)


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 19  # 524288 x values (2 MB f32)
    M = 1 << 18  # 262144 gather rows of 128 each (~ELL 520k x 45 gathered elements x1.5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    x2d = x.reshape(N // 128, 128)

    # lane-unique indices: row m gathers from lanes 0..127 exactly once
    rows = rng.integers(0, N // 128, (M, 128)).astype(np.int32)
    lanes = np.tile(np.arange(128, dtype=np.int32), (M, 1))
    # shuffle lanes per row (still unique) via a fixed permutation batch
    perm = np.argsort(rng.random((M, 128)), axis=1).astype(np.int32)
    lanes = np.take_along_axis(lanes, perm, axis=1)
    idx = rows * 128 + lanes
    idx_j = jnp.asarray(idx)
    rows_j = jnp.asarray(rows)
    perm_inv = np.argsort(perm, axis=1).astype(np.int32)

    ref = np.asarray(x)[idx]

    # --- XLA two-pass ---
    rowsel_j = jnp.asarray(np.take_along_axis(rows, perm_inv, axis=1))
    perm_j = jnp.asarray(lanes)  # y[m,l] = T[m, lanes[m,l]] with T from rowsel

    def two_pass_xla(x2d_, rowsel_, lanesel_):
        T = jnp.take_along_axis(
            x2d_[None], rowsel_[..., None].transpose(2, 0, 1), axis=1
        )  # awkward; use direct formulation below instead
        return T

    # direct: T[m,l] = x2d[rowsel[m,l], l]  -> take_along_axis axis=0
    def tpa0(x2d_, r_):
        return jnp.take_along_axis(x2d_, r_, axis=0)

    def tpa1(T, c_):
        return jnp.take_along_axis(T, c_, axis=1)

    def two_pass(x2d_, rowsel_, lanesel_):
        T = tpa0(x2d_, rowsel_)
        return tpa1(T, lanesel_)

    y = two_pass(x2d, rowsel_j, perm_j)
    err = np.abs(np.asarray(y) - ref).max()
    print(f"two-pass XLA correctness: max err {err:.1e}", flush=True)

    t = timeit(two_pass, x2d, rowsel_j, perm_j)
    print(f"XLA two-pass: {t*1e3:.2f} ms ({t/(M*128)*1e9:.2f} ns/el)", flush=True)

    t = timeit(lambda x_, i_: x_.reshape(-1)[i_], x2d, idx_j)
    print(f"XLA plain gather: {t*1e3:.2f} ms ({t/(M*128)*1e9:.2f} ns/el)", flush=True)

    # --- Pallas grid kernel: x2d resident, blocks of rows ---
    # Mosaic's axis-0 gather appears to want operand/indices shapes to
    # agree: use blocks of exactly N//128 rows
    BLK = N // 128

    def kernel(x_ref, r_ref, c_ref, o_ref):
        T = jnp.take_along_axis(x_ref[:], r_ref[:], axis=0)
        o_ref[:] = jnp.take_along_axis(T, c_ref[:], axis=1)

    @jax.jit
    def pallas_two_pass(x2d_, rowsel_, lanesel_):
        return pl.pallas_call(
            kernel,
            grid=(M // BLK,),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec((N // 128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x2d_, rowsel_, lanesel_)

    try:
        yp = pallas_two_pass(x2d, rowsel_j, perm_j)
        err = np.abs(np.asarray(yp) - ref).max()
        print(f"pallas two-pass correctness: max err {err:.1e}", flush=True)
        t = timeit(pallas_two_pass, x2d, rowsel_j, perm_j)
        print(f"pallas two-pass: {t*1e3:.2f} ms ({t/(M*128)*1e9:.2f} ns/el)", flush=True)
    except Exception as e:
        print(f"pallas two-pass FAIL: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
