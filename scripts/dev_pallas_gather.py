"""Probe: which gather formulations does Mosaic accept in-kernel, and
how fast are they vs the XLA gather — the decisive experiment for a
VMEM-resident-x SpMV (ROADMAP round-3 item 6 / VERDICT item 3).

Run on the real TPU:  python scripts/dev_pallas_gather.py

CLOSED (round 3, negative; round 5 removed the dormant modules): the
VMEM-resident-x Pallas SpMV (``ops/kernels.py``) and the two-pass
take_along_axis rephrase (``ops/gather2.py``) were deleted — Mosaic
supports gathers only along the LANE axis (no sublane/axis-0 gather,
so the in-kernel two-pass is not compilable), the XLA lowering of the
two-pass runs at the same ~32 ns/el as the generic gather, and the
production answer is BCSR slice-gathers (``ops/bcsr.py``: the ~7-11 ns
cost is per INDEX, not per element).  This probe and
``dev_pallas_gather2.py`` hold the measurements.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def probe(name, fn):
    try:
        t0 = time.time()
        out = fn()
        out.block_until_ready() if hasattr(out, "block_until_ready") else None
        dt = time.time() - t0
        print(f"{name}: OK compile+run {dt:.1f}s", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 17  # 131072 x values (0.5 MB f32) — VMEM resident
    R, W = 1024, 16  # gather (R, W) indices
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (R, W)), dtype=jnp.int32)

    ref = np.asarray(x)[np.asarray(idx)]

    # --- (a) 1D jnp.take in kernel ---
    def k_a(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    def run_a():
        out = pl.pallas_call(
            k_a,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        np.testing.assert_allclose(np.asarray(out), ref)
        return out

    # --- (b) 2D row-gather: x2d[idx_row] then lane select ---
    x2d = x.reshape(N // 128, 128)

    def k_b(x_ref, row_ref, lane_ref, o_ref):
        rows = jnp.take(x_ref[:], row_ref[:].reshape(-1), axis=0)  # (R*W, 128)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (R * W, 128), 1)
            == lane_ref[:].reshape(-1)[:, None]
        ).astype(jnp.float32)
        o_ref[:] = (rows * onehot).sum(axis=1).reshape(R, W)

    def run_b():
        out = pl.pallas_call(
            k_b,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x2d, idx // 128, idx % 128)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
        return out

    # --- (c) take_along_axis on lanes within one 128-wide row ---
    xb = x.reshape(N // 128, 128)
    lane_idx = jnp.asarray(rng.integers(0, 128, (N // 128, 128)), dtype=jnp.int32)

    def k_c(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    def run_c():
        out = pl.pallas_call(
            k_c,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xb, lane_idx)
        np.testing.assert_allclose(
            np.asarray(out), np.take_along_axis(np.asarray(xb), np.asarray(lane_idx), 1)
        )
        return out

    ok_a = probe("a: 1D take", run_a)
    ok_b = probe("b: 2D row-take + onehot lanes", run_b)
    ok_c = probe("c: take_along_axis lanes", run_c)

    # timing for whichever worked, vs plain XLA gather
    from jax import lax

    def timeit(f, *args, iters=50):
        g = jax.jit(lambda *a: lax.fori_loop(
            0, iters, lambda i, acc: acc + f(*a).sum(), jnp.float32(0)))
        g(*args).block_until_ready()
        t0 = time.time(); float(g(*args)); t1 = time.time()
        g1 = jax.jit(lambda *a: lax.fori_loop(
            0, 1, lambda i, acc: acc + f(*a).sum(), jnp.float32(0)))
        float(g1(*args))
        t2 = time.time(); float(g1(*args)); t3 = time.time()
        return ((t1 - t0) - (t3 - t2)) / (iters - 1)

    t_xla = timeit(lambda x_, i_: x_[i_], x, idx)
    print(f"XLA gather ({R}x{W}): {t_xla*1e6:.1f} us "
          f"({t_xla/(R*W)*1e9:.2f} ns/el)", flush=True)


if __name__ == "__main__":
    main()
