"""Full sharded pipeline at production-adjacent scale (VERDICT r3 item 7).

Baseflow ramp -> assembly -> generalized shift-invert eigensolve with
every heavy solve sharded over an 8-virtual-device CPU mesh — the
multi-chip production path the reference gets from ``mpirun -n 8``
(MPI-distributed PETSc Newton + SLEPc SINVERT; SURVEY.md section 2.3):

  * baseflow Newton: Jacobian in padded row-sharded ELL form, FGMRES
    inner solves preconditioned by the truncated-SPIKE segment factors
    (``ShardedBandedPrecond``), refactored once per ramp stage;
  * eigensolve: ``parallel.sharded_si_eigensolve`` (sharded Krylov-Schur
    over SPIKE-preconditioned FGMRES shift-invert applies);
  * cross-check: the single-device banded-SI ``EigenSolver`` on the same
    (A, M) must agree with the sharded sigma.

Run:  DEVSH_SCALE=1.0 timeout 7200 python scripts/dev_sharded_pipeline.py
(DEVSH_SCALE=1.0 is the ~43k-DOF bench cylinder; 0.35 is a ~8k smoke.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
# 8 virtual devices timeshare ONE physical core here: the default 40 s
# collective-rendezvous termination kills the run whenever another
# process squeezes the core mid-all-gather (observed twice at 43k)
if "collective_call_terminate" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
# the image preimports jax with the TPU client, so JAX_PLATFORMS above
# only guarantees the CPU client exists; pin the default device so the
# unsharded stages (assembly contexts, host planning jits) never touch
# the chip's HBM
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lsafw_tpu.config import BoundaryConditionsConfig, CylinderFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext, dirichlet_matrix_data
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    linearized_ns_elements,
    ns_residual_elements,
)
from lsafw_tpu.ops.sparse import assemble_csr_data
from lsafw_tpu.parallel import sharded_si_eigensolve
from lsafw_tpu.solver.band_sharded import ShardedBandedPrecond
from lsafw_tpu.solver.eigen import (
    EigenSolver, EigensolverConfig, STType, eigen_residuals,
)
from lsafw_tpu.solver.linear import fgmres
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

SCALE = float(os.environ.get("DEVSH_SCALE", "1.0"))
N_DEV = 8
RE_FINAL = 47.0
SIGMA = 0.0 + 0.74j

devices = jax.devices("cpu")
assert len(devices) >= N_DEV, devices
mesh = Mesh(np.asarray(devices[:N_DEV]), ("dof",))
vec_sh = NamedSharding(mesh, P("dof"))
row_sh = NamedSharding(mesh, P("dof", None))
repl = NamedSharding(mesh, P())

# ---------------- setup: the bench 43k cylinder, scaled ----------------
t0 = time.time()
geo = CylinderFlowGeometryConfig(
    dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
    x_range=(-10.0, 30.0), y_range=(-10.0, 10.0),
    resolution=0.5 / SCALE,
    resolution_around_cylinder=0.15 / SCALE, influence_radius=8.0,
)
cmesh = cylinder_flow_mesh(geo, max_iter=80, seed=0)
INLET, OUTLET, BOTTOM, TOP, CYL = 1, 2, 3, 4, 5


def marker(x):
    out = np.full(x.shape[0], CYL, dtype=np.int32)
    out[np.isclose(x[:, 1], -10.0, atol=1e-6)] = BOTTOM
    out[np.isclose(x[:, 1], 10.0, atol=1e-6)] = TOP
    out[np.isclose(x[:, 0], -10.0, atol=1e-6)] = INLET
    out[np.isclose(x[:, 0], 30.0, atol=1e-6)] = OUTLET
    return out


mark_boundary_facets(cmesh, marker)
spaces = define_spaces(cmesh)
bcs = define_bcs(cmesh, spaces, [
    BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
    BoundaryConditionsConfig(marker=BOTTOM, type="neumann_velocity", value=(0.0, 0.0)),
    BoundaryConditionsConfig(marker=TOP, type="neumann_velocity", value=(0.0, 0.0)),
    BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
    BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
])
bcs_pert = define_bcs(cmesh, spaces, [
    BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
    BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
    BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
])
ctx = AssemblyContext.build(spaces)
n = spaces.num_dofs
pattern = ctx.pattern
print(f"setup: {n} DOFs on {N_DEV}-device mesh ({time.time()-t0:.0f}s)",
      flush=True)

# padded sharded ELL scaffolding (dryrun_multichip's recipe at scale)
npad = ((n + N_DEV - 1) // N_DEV) * N_DEV
pad_mask = np.ones(npad, dtype=bool)
pad_mask[:n] = bcs.dirichlet_mask
pad_values = np.zeros(npad)
pad_values[:n] = bcs.dirichlet_values
mask_j = jnp.asarray(pad_mask)
bc_values_j = jnp.asarray(pad_values)

ell_map, ell_cols, w_ell = pattern.ell
w_ell = max(w_ell, 1)
ell_map_pad = np.full((npad, w_ell), -1, dtype=np.int32)
ell_map_pad[:n, : ell_map.shape[1]] = ell_map
ell_cols_pad = np.zeros((npad, w_ell), dtype=np.int32)
ell_cols_pad[:n, : ell_cols.shape[1]] = ell_cols
ell_cols_pad[n:, 0] = np.arange(n, npad, dtype=np.int32)
pad_row = np.zeros((npad, w_ell))
pad_row[n:, 0] = 1.0
ell_map_j = jax.device_put(jnp.asarray(ell_map_pad), row_sh)
ell_cols_j = jax.device_put(jnp.asarray(ell_cols_pad), row_sh)
pad_row_j = jax.device_put(jnp.asarray(pad_row), row_sh)


@jax.jit
def jac_data(w, re):
    """Flat CSR Jacobian data with Dirichlet rows folded."""
    data = assemble_csr_data(pattern, linearized_ns_elements(ctx, w, re))
    return dirichlet_matrix_data(pattern, data, mask_j[:n], 1.0)


@jax.jit
def jac_ell(data):
    return jnp.where(ell_map_j >= 0, data[ell_map_j], 0.0) + pad_row_j


@jax.jit
def res_F(w, re):
    F = jax.ops.segment_sum(
        ns_residual_elements(ctx, w, re).reshape(-1),
        ctx.mixed_cell_dofs.reshape(-1),
        num_segments=n,
    )
    return jnp.where(mask_j, 0.0, jnp.pad(F, (0, npad - n)))


def _to_scipy_csr(data_np):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (data_np, pattern.indices, pattern.indptr), shape=(n, n))


@jax.jit
def _newton_solve(data_ell, F, pc):
    def matvec(x):
        return (data_ell * x[ell_cols_j]).sum(axis=1)

    def pcfn(z):
        zr, _ = pc.solve_pair_sharded(z, jnp.zeros_like(z), mesh)
        return zr[:npad]

    return fgmres(matvec, -F, tol=1e-9, restart=60, maxiter=600, M=pcfn)


# ---------------- stage 1: sharded baseflow ramp ----------------
t0 = time.time()
WCACHE = f"/tmp/wsh_{SCALE}.npy"
w = jax.device_put(np.where(pad_mask, pad_values, 0.0), vec_sh)
ramp = [10.0, 25.0, RE_FINAL]
if os.path.exists(WCACHE):
    cached = np.load(WCACHE)
    if cached.shape[0] == npad:
        w = jax.device_put(cached, vec_sh)
        ramp = []
        print("sharded baseflow loaded from cache", flush=True)
else:
    seed = os.path.join(os.path.dirname(__file__), "data", "w43k.npy")
    if os.path.exists(seed):
        ws = np.load(seed)
        if ws.shape[0] == n:  # same bench cylinder: polish at Re only
            w = jax.device_put(
                np.where(pad_mask, pad_values,
                         np.concatenate([ws, np.zeros(npad - n)])), vec_sh)
            ramp = [RE_FINAL]
            print("seeded from scripts/data/w43k.npy", flush=True)
for re in ramp:
    pc = None
    for it in range(25):
        F = res_F(w[:n], re)
        nF = float(jnp.linalg.norm(F))
        if nF < 1e-8:
            break
        data = jac_data(w[:n], re)
        if pc is None:  # one SPIKE refactor per ramp stage (modified Newton)
            C = _to_scipy_csr(np.asarray(data)).astype(np.complex128)
            pc = ShardedBandedPrecond.build(C, N_DEV, nb=16, chunk=4)
            if pc.npad < npad:
                raise RuntimeError("segment padding below DOF padding")
        data_ell = jax.device_put(jac_ell(data), row_sh)
        res = _newton_solve(data_ell, F, pc)
        dw = jnp.where(mask_j, 0.0, res.x[:npad])
        w = jnp.where(mask_j, bc_values_j, w + dw)
        inner = float(res.residual)
        print(f"  Re={re}: it {it} |F|={nF:.3e} inner={inner:.1e}",
              flush=True)
        if inner > 1e-8:
            # the frozen modified-Newton SPIKE factors went stale (the
            # inner FGMRES missed tol); refactor at the next iteration
            pc = None
    else:
        raise RuntimeError(f"baseflow Newton did not converge at Re={re}")
    print(f"Re={re}: converged |F|={nF:.3e}", flush=True)
t_base = time.time() - t0
np.save(WCACHE, np.asarray(w))
w_host = np.asarray(w)[:n]
print(f"baseflow (sharded Newton): {t_base:.0f}s", flush=True)

# ---------------- stage 2: eigensystem assembly ----------------
t0 = time.time()
asm = LinearizedNavierStokesAssembler(
    jnp.asarray(w_host), ctx, RE_FINAL, bcs_pert, cmesh)
A, M = asm.assemble_eigensystem()
A.data.block_until_ready()
t_asm = time.time() - t0
print(f"assemble: {t_asm:.0f}s (nnz={A.pattern.nnz})", flush=True)

# ---------------- stage 3: sharded SI eigensolve ----------------
t0 = time.time()
res = sharded_si_eigensolve(
    A, M, SIGMA, mesh, nev=1, ncv=16, tol=1e-10, nb=16, chunk=4,
    inner_tol=1e-11, inner_restart=80,
)
t_eig = time.time() - t0
lam = res.eigenvalues[0]
print(f"sharded eigen: {t_eig:.0f}s sigma={lam:.6f}", flush=True)

# residual check against the true pair
vr = np.real(res.eigenvectors[0])
vi = np.imag(res.eigenvectors[0])
As = A.to_scipy()
Ms = M.to_scipy()
v = vr + 1j * vi
r = As @ v - lam * (Ms @ v)
resid = float(np.linalg.norm(r) / max(np.linalg.norm(v), 1e-300))
print(f"sharded eigen residual: {resid:.2e}", flush=True)

# ---------------- stage 4: single-device cross-check ----------------
t0 = time.time()
es = EigenSolver(A, M, EigensolverConfig(num_eig=1, atol=1e-8, ncv=16))
es.set_st_type(STType.SINVERT)
es.set_target(SIGMA)
es.set_st_pc_type("banded")
pairs = es.solve()
t_ref = time.time() - t0
sig1 = pairs[0][0]
resid1 = float(eigen_residuals(A, M, pairs)[0])
dsig = abs(lam - sig1)
print(
    f"RESULT n={n} sharded sigma={lam.real:+.6f}{lam.imag:+.6f}j "
    f"(resid {resid:.1e}) vs single-device {sig1.real:+.6f}{sig1.imag:+.6f}j "
    f"(resid {resid1:.1e}), |dsigma|={dsig:.2e}; "
    f"baseflow={t_base:.0f}s assemble={t_asm:.0f}s eigen={t_eig:.0f}s "
    f"ref={t_ref:.0f}s",
    flush=True,
)
assert dsig < 1e-6, f"sharded/single-device sigma mismatch: {dsig:.2e}"
assert resid < 5e-7, f"sharded eigen residual too large: {resid:.2e}"

with open("/tmp/dev_sharded_pipeline.json", "w") as f:
    json.dump(
        dict(n=n, n_dev=N_DEV, scale=SCALE,
             sigma_re=lam.real, sigma_im=lam.imag, resid=resid,
             sigma_ref_re=sig1.real, sigma_ref_im=sig1.imag,
             dsigma=dsig, t_base=t_base, t_asm=t_asm, t_eig=t_eig),
        f,
    )
print("OK", flush=True)
