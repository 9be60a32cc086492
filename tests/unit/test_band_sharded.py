"""Sharded (truncated-SPIKE) banded preconditioner on the virtual mesh.

Validates the multi-device banded shift-invert design (SURVEY section
2.3 item 4; VERDICT round-3 item 2): per-segment band factors applied
under shard_map with no collectives, cross-segment coupling absorbed by
the outer Krylov iteration on the sharded true operator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, PartitionSpec as P

from lsafw_tpu.solver.band_sharded import ShardedBandedPrecond


def _mesh(naxis=8):
    return Mesh(np.asarray(jax.devices("cpu")[:naxis]), ("dof",))


def _banded_complex(n, bw, seed=0):
    rng = np.random.default_rng(seed)
    diags, offs = [], range(-bw, bw + 1)
    for o in offs:
        m = n - abs(o)
        diags.append((rng.standard_normal(m) + 1j * rng.standard_normal(m)) * 0.2)
    A = sp.diags(diags, list(offs), format="csr").astype(np.complex128)
    return A + sp.identity(n, format="csr") * (2.0 * bw * 0.2 + 1.0)


def test_segment_solve_matches_block_diagonal_host():
    """The shard_map segment solve must equal the host solve of the
    block-diagonal (truncated) operator."""
    n, bw = 600, 9
    C = _banded_complex(n, bw)
    mesh = _mesh()
    pc = ShardedBandedPrecond.build(C, 8, nb=16, chunk=2)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    npad = pc.npad
    br = jnp.asarray(np.concatenate([b.real, np.zeros(npad - n)]))
    bi = jnp.asarray(np.concatenate([b.imag, np.zeros(npad - n)]))
    with mesh:
        xr, xi = pc.solve_pair_sharded(br, bi, mesh)
    x = np.asarray(xr)[:n] + 1j * np.asarray(xi)[:n]

    # host reference: permute, solve each diagonal segment block, unpermute
    perm = np.asarray(pc.perm)[: (n := C.shape[0])]
    # rebuild the permutation the precond used
    perm_full = np.asarray(pc.perm)
    seg_rows = pc.dinv_r.shape[1] * pc.nb
    Cp = C[perm_full[: n]][:, perm_full[: n]].tocsr()
    bp = np.concatenate([(b)[perm_full[: n]], np.zeros(npad - n)])
    x_ref = np.zeros(npad, dtype=np.complex128)
    for s in range(pc.num_segments):
        r0, r1 = s * seg_rows, (s + 1) * seg_rows
        hi = min(r1, n)
        if r0 >= n:
            x_ref[r0:r1] = bp[r0:r1]
            continue
        seg = Cp[r0:hi, r0:hi].tocsc()
        x_ref[r0:hi] = sp.linalg.spsolve(seg, bp[r0:hi])
    iperm = np.asarray(pc.iperm)
    rel = np.linalg.norm(x - x_ref[iperm]) / np.linalg.norm(x_ref[iperm])
    assert rel < 5e-5, f"segment solve mismatch: {rel:.2e}"


def test_spike_outer_iteration_converges():
    """Minimal-residual refinement with the SPIKE preconditioner and
    the TRUE (sharded-style) operator reaches solver-grade residuals —
    the coupling dropped from the factor is recovered by the outer
    loop."""
    n, bw = 600, 9
    C = _banded_complex(n, bw, seed=3)
    mesh = _mesh()
    pc = ShardedBandedPrecond.build(C, 8, nb=16, chunk=2)
    rng = np.random.default_rng(4)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    npad = pc.npad

    def apply_pc(z):
        br = jnp.asarray(np.concatenate([z.real, np.zeros(npad - n)]))
        bi = jnp.asarray(np.concatenate([z.imag, np.zeros(npad - n)]))
        with mesh:
            xr, xi = pc.solve_pair_sharded(br, bi, mesh)
        return np.asarray(xr)[:n] + 1j * np.asarray(xi)[:n]

    x = np.zeros(n, dtype=np.complex128)
    r = b.copy()
    for it in range(200):
        d = apply_pc(r)
        Cd = C @ d
        alpha = np.vdot(Cd, r) / max(np.vdot(Cd, Cd).real, 1e-300)
        x = x + alpha * d
        r = r - alpha * Cd
        rel = np.linalg.norm(r) / np.linalg.norm(b)
        if rel < 1e-10:
            break
    assert rel < 1e-10, f"SPIKE outer iteration stalled at {rel:.2e} (it {it})"
    assert it < 100, f"SPIKE preconditioner too weak: {it} iterations"


def test_exact_spike_direct_solve_matches_splu():
    """ShardedSpikeSolver (VERDICT r3 item 7: SPIKE promoted from PC to
    solver) solves C x = b to factor grade in ONE apply — the reduced
    interface system makes the cross-segment coupling exact."""
    from lsafw_tpu.solver.band_sharded import ShardedSpikeSolver

    n, bw = 600, 9
    C = _banded_complex(n, bw, seed=5)
    mesh = _mesh()
    solver = ShardedSpikeSolver.build(C, 8, nb=16, chunk=2)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    npad = solver.npad
    br = jnp.asarray(np.concatenate([b.real, np.zeros(npad - n)]))
    bi = jnp.asarray(np.concatenate([b.imag, np.zeros(npad - n)]))
    with mesh:
        xr, xi = solver.solve_pair_sharded(br, bi, mesh)
    x = np.asarray(xr)[:n] + 1j * np.asarray(xi)[:n]
    x_ref = sp.linalg.splu(C.tocsc()).solve(b)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-5, f"exact SPIKE disagrees with splu: {rel:.2e}"


def test_exact_spike_jit_and_refinement():
    """The solver is a pytree (jit-safe argument) and two defect-
    correction refinements against the true operator reach f64 grade."""
    from lsafw_tpu.solver.band_sharded import ShardedSpikeSolver

    n, bw = 400, 7
    C = _banded_complex(n, bw, seed=8)
    mesh = _mesh()
    solver = ShardedSpikeSolver.build(C, 8, nb=16, chunk=2)
    rng = np.random.default_rng(9)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    npad = solver.npad
    bp_r = jnp.asarray(np.concatenate([b.real, np.zeros(npad - n)]))
    bp_i = jnp.asarray(np.concatenate([b.imag, np.zeros(npad - n)]))

    @jax.jit
    def solve_refined(solver, br, bi):
        xr, xi = solver.solve_pair_sharded(br, bi, mesh)
        return xr, xi

    with mesh:
        xr, xi = solve_refined(solver, bp_r, bp_i)
    x = np.asarray(xr)[:n] + 1j * np.asarray(xi)[:n]
    for _ in range(2):  # host-side defect correction to f64
        r = b - C @ x
        rr = jnp.asarray(np.concatenate([r.real, np.zeros(npad - n)]))
        ri = jnp.asarray(np.concatenate([r.imag, np.zeros(npad - n)]))
        with mesh:
            dr, di = solve_refined(solver, rr, ri)
        x = x + (np.asarray(dr)[:n] + 1j * np.asarray(di)[:n])
    rel = np.linalg.norm(b - C @ x) / np.linalg.norm(b)
    assert rel < 1e-12, f"refined exact SPIKE not f64-grade: {rel:.2e}"


def test_exact_spike_rejects_truncated_bandwidth():
    """When the bandwidth exceeds the segment width the segment factors
    are truncated and exactness is impossible: build must refuse."""
    import pytest

    from lsafw_tpu.solver.band_sharded import ShardedSpikeSolver

    n = 256
    C = _banded_complex(n, 40, seed=11)  # bw 40 vs seg 32 rows at D=8
    with pytest.raises(ValueError):
        ShardedSpikeSolver.build(C, 8, nb=16, chunk=1)
