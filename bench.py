"""Benchmark: hot-kernel throughput of the TPU-native stability framework.

Measures the two workhorse kernels of every stability analysis — full
linearized-Navier-Stokes operator assembly and SpMV (the inner op of
every Krylov iteration; BASELINE.json metric "SpMV GB/s; assembly
MDOF/s") at ~0.5M Taylor-Hood DOFs on the attached device.

Measurement protocol for high-latency runtimes (the axon TPU tunnel
adds ~150 ms per dispatch and `block_until_ready` is a no-op): each
kernel runs K iterations inside ONE jitted ``lax.fori_loop`` with a
*traced* trip count (one compile, one dispatch per measurement), the
program returns a single scalar, and per-iteration time is the slope
between K=1 and K=K_big runs.

``vs_baseline`` is the speedup of device SpMV over single-process scipy
CSR SpMV on the same structure (the stand-in for the reference's
per-rank PETSc MatMult; the reference publishes no absolute numbers,
BASELINE.md).

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
from contextlib import contextmanager

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class StageTimeout(Exception):
    pass


@contextmanager
def stage_timeout(seconds: int, name: str):
    """Remote compiles can take unbounded time when the compile service
    is congested; every stage gets a hard budget so the bench always
    emits its JSON line."""

    def handler(signum, frame):
        raise StageTimeout(name)

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> None:
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jax import lax

    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import rectangle_mesh
    from lsafw_tpu.models.navier_stokes import linearized_ns_elements
    from lsafw_tpu.ops.sparse import assemble_csr_data

    dev = jax.devices()[0]
    log(f"bench device: {dev.device_kind} ({dev.platform})")

    nx = int(os.environ.get("BENCH_NX", "240"))
    t0 = time.time()
    mesh = rectangle_mesh((0.0, 0.0), (1.0, 1.0), nx, nx)
    spaces = define_spaces(mesh)
    ctx = AssemblyContext.build(spaces)
    n = spaces.num_dofs
    nnz = ctx.pattern.nnz
    log(f"setup: n={n} DOFs, nnz={nnz} ({time.time()-t0:.1f}s host prep)")

    rng = np.random.default_rng(0)
    w_base = jnp.asarray(rng.standard_normal(n) * 0.1)
    x0 = jnp.asarray(rng.standard_normal(n))
    dev_ell = ctx.pattern_dev
    budget = int(os.environ.get("BENCH_STAGE_TIMEOUT", "600"))
    t_asm = t_spmv = t_spmv32 = None
    asm_mdofs = tpu_gbps = None

    # ------------------------------------------------------------------
    # assembly loop: K full operator assemblies in one dispatch
    # ------------------------------------------------------------------
    @jax.jit
    def asm_loop(ctx, w, k):
        def body(i, acc):
            data = assemble_csr_data(
                ctx.pattern_dev, linearized_ns_elements(ctx, w, 50.0 + i)
            )
            return acc + data[0]

        return lax.fori_loop(0, k, body, 0.0)

    def run_scalar(fn, *args):
        t0 = time.time()
        out = float(fn(*args))
        return time.time() - t0, out

    try:
        with stage_timeout(budget, "assembly"):
            t_c0 = time.time()
            t1, _ = run_scalar(asm_loop, ctx, w_base, 1)
            log(f"assembly: compile+first {time.time()-t_c0:.1f}s")
            K_asm = int(os.environ.get("BENCH_K_ASM", "10"))
            tk, _ = run_scalar(asm_loop, ctx, w_base, K_asm + 1)
            t_asm = max((tk - t1) / K_asm, 1e-9)
            asm_mdofs = n / t_asm / 1e6
            log(f"assembly: {t_asm*1e3:.2f} ms/op -> {asm_mdofs:.1f} MDOF/s ({nnz/t_asm/1e6:.0f} Mnnz/s)")
    except StageTimeout:
        log(f"assembly: stage timed out after {budget}s (remote compile congestion)")

    # ------------------------------------------------------------------
    # SpMV loop (ELL layout) — K matvecs in one dispatch
    # ------------------------------------------------------------------
    # SpMV bandwidth is value-independent: use random data on the real
    # pattern so this stage does not depend on the assembly stage
    data64 = jnp.asarray(rng.standard_normal(nnz))

    @jax.jit
    def spmv_loop(dv, data, x, k):
        data_ell = jnp.where(dv.ell_map >= 0, data[dv.ell_map], 0.0)

        def body(i, y):
            y = (data_ell * y[dv.ell_cols]).sum(axis=1)
            return y / jnp.linalg.norm(y)

        y = lax.fori_loop(0, k, body, x)
        return jnp.vdot(y, y)

    _, _, w_ell = ctx.pattern.ell
    K = int(os.environ.get("BENCH_K_SPMV", "100"))
    try:
        with stage_timeout(budget, "spmv64"):
            t_c0 = time.time()
            t1, _ = run_scalar(spmv_loop, dev_ell, data64, x0, 1)
            log(f"spmv f64: compile+first {time.time()-t_c0:.1f}s")
            tk, _ = run_scalar(spmv_loop, dev_ell, data64, x0, K + 1)
            t_spmv = max((tk - t1) / K, 1e-9)
            bytes_moved = n * w_ell * (8 + 4 + 8) + n * 8
            tpu_gbps = bytes_moved / t_spmv / 1e9
            log(f"spmv f64: {t_spmv*1e3:.3f} ms/iter (ELL width {w_ell}) -> {tpu_gbps:.1f} GB/s")
    except StageTimeout:
        log(f"spmv f64: stage timed out after {budget}s")
    try:
        with stage_timeout(budget, "spmv32"):
            data32 = data64.astype(jnp.float32)
            x32 = x0.astype(jnp.float32)
            t1_32, _ = run_scalar(spmv_loop, dev_ell, data32, x32, 1)
            tk_32, _ = run_scalar(spmv_loop, dev_ell, data32, x32, K + 1)
            t_spmv32 = max((tk_32 - t1_32) / K, 1e-9)
            bytes32 = n * w_ell * (4 + 4 + 4) + n * 4
            log(f"spmv f32: {t_spmv32*1e3:.3f} ms/iter -> {bytes32/t_spmv32/1e9:.1f} GB/s")
    except StageTimeout:
        log(f"spmv f32: stage timed out after {budget}s")

    # ------------------------------------------------------------------
    # host scipy CSR baseline on the same structure (no device transfer)
    # ------------------------------------------------------------------
    import scipy.sparse as sp

    As = sp.csr_matrix(
        (rng.standard_normal(nnz), ctx.pattern.indices, ctx.pattern.indptr),
        shape=(n, n),
    )
    xh = np.asarray(x0)
    As @ xh
    t0 = time.time()
    reps_h = 10
    for _ in range(reps_h):
        _ = As @ xh
    t_host = (time.time() - t0) / reps_h
    log(f"scipy CSR baseline: {t_host*1e3:.2f} ms/iter")

    result = {
        "metric": "linearized_ns_spmv_throughput",
        "value": round(tpu_gbps, 2) if tpu_gbps else 0.0,
        "unit": "GB/s",
        "vs_baseline": round(t_host / t_spmv, 2) if t_spmv else 0.0,
        "detail": {
            "n_dofs": n,
            "nnz": nnz,
            "ell_width": w_ell,
            "spmv_f64_ms": round(t_spmv * 1e3, 4) if t_spmv else None,
            "spmv_f32_ms": round(t_spmv32 * 1e3, 4) if t_spmv32 else None,
            "assembly_ms": round(t_asm * 1e3, 3) if t_asm else None,
            "assembly_mdofs_per_s": round(asm_mdofs, 1) if asm_mdofs else None,
            "scipy_spmv_ms": round(t_host * 1e3, 3),
            "device": f"{dev.device_kind}",
            "dtype": "float64",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # always emit a parseable line for the driver
        log(f"bench failed: {exc!r}")
        print(json.dumps({
            "metric": "linearized_ns_spmv_throughput",
            "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0,
            "detail": {"error": repr(exc)},
        }))
