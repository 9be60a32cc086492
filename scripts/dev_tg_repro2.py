"""Part 2 of the two-grid repro: the PRODUCTION object graph in
miniature — Galerkin coarse operator (BCSR apply + assembled-coarse
band PC), hi-only fine BCSR, f64 ELL resid op, nested_eigenpair — on
the 43k/20k reduced-domain cylinder pair of dev_tg_repro.py (cached
baseflows).  Pass = converges to rel <= 1e-8 in <= 10 outers.

Run:  JAX_PLATFORMS=cpu timeout 3600 python scripts/dev_tg_repro2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"  # the shell exports axon; setdefault is a no-op
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # plugin dials the pool at import

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from lsafw_tpu.config import BoundaryConditionsConfig, CylinderFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.ops.bcsr import BCSRShiftedOp, plan_for_pattern
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.solver.band import factor_auto, plan_for_csr
from lsafw_tpu.solver.baseflow import BaseFlowSolver, interpolation_matrix
from lsafw_tpu.solver.eigen import (
    BandedSIOp, TwoGridSIPC, ell_of_csr, nested_eigenpair,
)
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)
RE = 47.0
SIGMA = 0.0 + 0.74j
INLET, OUTLET, BOTTOM, TOP, CYL = 1, 2, 3, 4, 5


def marker(x):
    out = np.full(x.shape[0], CYL, dtype=np.int32)
    out[np.isclose(x[:, 1], -10.0, atol=1e-6)] = BOTTOM
    out[np.isclose(x[:, 1], 10.0, atol=1e-6)] = TOP
    out[np.isclose(x[:, 0], -10.0, atol=1e-6)] = INLET
    out[np.isclose(x[:, 0], 30.0, atol=1e-6)] = OUTLET
    return out


def build(res, res_cyl, tag):
    geo = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-10.0, 30.0), y_range=(-10.0, 10.0), resolution=res,
        resolution_around_cylinder=res_cyl, influence_radius=8.0,
    )
    mesh = cylinder_flow_mesh(geo, max_iter=80, seed=0)
    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs_base = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=BOTTOM, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=TOP, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    wpath = f"/tmp/tg_repro_w_{tag}.npy"
    if os.path.exists(wpath):
        w = np.load(wpath)
    else:
        w = BaseFlowSolver(ctx, mesh, bcs_base, re=RE).solve(
            ramp=True, steps=3, tol=1e-8, max_it=40, linear_solver="lu")
        np.save(wpath, np.asarray(w))
    asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    return spaces, A, M, bcs_pert


sp_f, A_f, M_f, bcs_f = build(0.5, 0.15, "fine43k")
sp_c, A_c, M_c, bcs_c = build(0.8, 0.26, "coarse")

# coarse eigenpair (guess) via scipy SI
import scipy.sparse.linalg as spla
from scipy.sparse.linalg import LinearOperator, eigs

C_cs = (A_c.to_scipy() - SIGMA * M_c.to_scipy()).tocsc()
lu_c = spla.splu(C_cs)
mu_c, vecs_c = eigs(LinearOperator(C_cs.shape,
                                   matvec=lambda x: lu_c.solve(M_c.to_scipy() @ x),
                                   dtype=complex), k=1, which="LM")
lam_c = SIGMA + 1.0 / mu_c[0]
x_c = vecs_c[:, 0]
print(f"coarse lambda = {lam_c:.6f}", flush=True)
del lu_c

# --- production object graph ---
t0 = time.time()
P = interpolation_matrix(sp_c, sp_f)
Pd, Pc_ = ell_of_csr(P)

from lsafw_tpu.solver.eigen import galerkin_pair

A_g, M_g = galerkin_pair(P, A_f, M_f)
# coarse band PC: factor the GALERKIN data itself (CBAND=galerkin) or
# the re-assembled coarse operator (CBAND=assembled).  The assembled
# factor preconditions G with the same spectral mismatch that broke the
# single-apply correction (q0) — the coarse GCR then stalls and the
# whole inner solve sits at ~0.5.
if os.environ.get("CBAND", "galerkin") == "galerkin":
    plan_c = plan_for_csr(A_g, force_f32=True)
    blu_c, _ = factor_auto(
        plan_c, A_g.data - SIGMA.real * M_g.data, (-SIGMA.imag) * M_g.data,
        diag_slots=A_g.pattern.diag_slots)
else:
    plan_c = plan_for_csr(A_c, force_f32=True)
    blu_c, _ = factor_auto(
        plan_c, A_c.data - SIGMA.real * M_c.data, (-SIGMA.imag) * M_c.data,
        diag_slots=A_c.pattern.diag_slots)
print(f"Galerkin nnz={A_g.pattern.nnz} (setup {time.time()-t0:.0f}s)",
      flush=True)

# the Galerkin operator is applied as the sandwich P^T C_f P through
# Cop_f inside TwoGridSIPC (never materialized on device — its BCSR
# plan sat at 1.2% fill at the production PC grid); only the band PC
# is factored from the Galerkin data
Cop_f = BCSRShiftedOp.from_csr(A_f, M_f, SIGMA,
                               plan_for_pattern(A_f, br=16, bc=16),
                               lo_channels=False)
coarse_op = blu_c
# fine term REQUIRED for span: with fine_blu=None every preconditioned
# GCR direction lies in range(P) and the fine-complement error is never
# searched (run r2d stalled at ~0.7 inner rel, 0.7x/outer).  The Jacobi
# term rides the post-coarse residual at small omega — q3's single-apply
# degradation does not bind inside GCR, which weights the direction set
# optimally.
from lsafw_tpu.solver.eigen import DiagSIPC

if os.environ.get("FINE", "band") == "band":
    # budget-TRUNCATED fine band (the 500k memory regime in miniature):
    # nearly useless standalone (contraction ~1 at 500k) but as the
    # multiplicative fine term it smooths the broadband interpolation
    # noise the coarse grid cannot see
    os.environ["LSAFW_PIVOT_MEM_GB"] = "0"
    fbytes = int(float(os.environ.get("FBYTES_MB", "40")) * 1e6)
    plan_f = plan_for_csr(A_f, max_bytes=fbytes, force_f32=True)
    jac_f, _ = factor_auto(
        plan_f, A_f.data - SIGMA.real * M_f.data, (-SIGMA.imag) * M_f.data,
        diag_slots=A_f.pattern.diag_slots)
else:
    jac_f = DiagSIPC.from_pair(A_f, M_f, SIGMA)
pc2 = TwoGridSIPC(coarse_op, jac_f, Pd, Pc_, Cop=Cop_f, cproj=None,
                  sig0_re=jnp.asarray(SIGMA.real),
                  sig0_im=jnp.asarray(SIGMA.imag),
                  nc=P.shape[1],
                  coarse_tol=float(os.environ.get("CTOL", "1e-2")),
                  coarse_its=int(os.environ.get("CITS", "12")),
                  smooth_steps=int(os.environ.get("SMOOTH", "1")),
                  omega=float(os.environ.get("OMEGA", "0.3")))
op2 = BandedSIOp(A_f, M_f, pc2, jnp.asarray(SIGMA.real),
                 jnp.asarray(SIGMA.imag), None, None)
rop2 = BandedSIOp(A_f, M_f, None, jnp.asarray(SIGMA.real),
                  jnp.asarray(SIGMA.imag), None, None)

v0 = P @ x_c
t0 = time.time()
sigma, v, rel, n_outer = nested_eigenpair(
    op2, v0, lam_c, tol=1e-8, inner_tol=1e-4, inner_its=30, m=16,
    max_outer=10, bc_mask=np.asarray(bcs_f.dirichlet_mask), resid_op=rop2)
print(f"RESULT sigma={sigma:.8f} rel={rel:.2e} outers={n_outer} "
      f"({time.time()-t0:.0f}s)", flush=True)
Ks, Ms = A_f.to_scipy(), M_f.to_scipy()
r = Ks @ v - sigma * (Ms @ v)
true_rel = np.linalg.norm(r) / np.linalg.norm(Ks @ v)
print(f"true rel = {true_rel:.2e}", flush=True)
assert true_rel < 1e-8
print("REPRO2 PASS", flush=True)
