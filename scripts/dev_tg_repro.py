"""CPU repro of the 500k two-grid SI correction failure (run r5b-r5e).

Reduced-domain cylinder at two resolutions (fine ~43k / coarse ~20k
Taylor-Hood DOFs), real Re=47 baseflows, complex shift at the
literature target: measures, with EXACT (scipy splu) coarse solves,
what the two-grid correction can actually deliver:

  q0: ||C_f (P C_c^{-1} P^T b) - b|| / ||b||   (assembled coarse op)
  q1: same with the GALERKIN coarse operator P^T C_f P
  q2: q0/q1 with the coarse eigenpair deflated
  q3: + one damped-Jacobi post-smoothing step

If q0 >> 1 while q1 ~ O(1sub), the round-5 stall is the
assembled-vs-Galerkin scaling mismatch, not the solver.

Run:  JAX_PLATFORMS=cpu timeout 3600 python scripts/dev_tg_repro.py
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
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from lsafw_tpu.config import BoundaryConditionsConfig, CylinderFlowGeometryConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.solver.baseflow import BaseFlowSolver, interpolation_matrix
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)
RE = 47.0
SIGMA = 0.0 + 0.74j  # bench-pipeline target on the reduced domain

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
        t0 = time.time()
        w = BaseFlowSolver(ctx, mesh, bcs_base, re=RE).solve(
            ramp=True, steps=3, tol=1e-8, max_it=40, linear_solver="lu")
        np.save(wpath, np.asarray(w))
        print(f"{tag}: baseflow {time.time()-t0:.0f}s", flush=True)
    asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    As = A.to_scipy().tocsc()
    Ms = M.to_scipy().tocsc()
    print(f"{tag}: n={spaces.num_dofs}", flush=True)
    return mesh, spaces, ctx, As, Ms


mesh_f, sp_f, ctx_f, A_f, M_f = build(0.5, 0.15, "fine43k")
mesh_c, sp_c, ctx_c, A_c, M_c = build(0.8, 0.26, "coarse")

C_f = (A_f - SIGMA * M_f).tocsc()
C_c = (A_c - SIGMA * M_c).tocsc()
P = interpolation_matrix(sp_c, sp_f).tocsr()
nf, nc = P.shape
print(f"P: {P.shape}", flush=True)

# coarse eigenpair (for deflation) + fine reference eigenpair
lu_c = spla.splu(C_c)
from scipy.sparse.linalg import LinearOperator, eigs

OPc = LinearOperator((nc, nc), matvec=lambda x: lu_c.solve(M_c @ x),
                     dtype=complex)
mu_c, vecs_c = eigs(OPc, k=1, which="LM")
lam_c = SIGMA + 1.0 / mu_c[0]
x_c = vecs_c[:, 0]
print(f"coarse lambda = {lam_c:.6f}  |sigma-lam_c| = {abs(SIGMA-lam_c):.2e}",
      flush=True)

lu_f = spla.splu(C_f)
OPf = LinearOperator((nf, nf), matvec=lambda x: lu_f.solve(M_f @ x),
                     dtype=complex)
mu_f, vecs_f = eigs(OPf, k=1, which="LM", v0=np.real(P @ x_c))
lam_f = SIGMA + 1.0 / mu_f[0]
x_f = vecs_f[:, 0]
print(f"fine lambda = {lam_f:.6f}", flush=True)

# the JD correction RHS at theta = lam_c (what outer 1 sees):
v = P @ x_c
Mv = M_f @ v
v = v / np.sqrt(np.real(np.vdot(v, Mv)))
Mv = M_f @ v
theta = lam_c
r = A_f @ v - theta * (M_f @ v)
b = r - (np.vdot(v, r)) * Mv  # Rayleigh-shifted residual (JD rhs)
bn = np.linalg.norm(b)
print(f"guess rel resid = {bn / np.linalg.norm(A_f @ v):.2e}", flush=True)

Ct = (A_f - theta * M_f).tocsc()


def q(z, name):
    res = np.linalg.norm(Ct @ z - b) / bn
    print(f"{name}: |Cz-b|/|b| = {res:.3f}  |z| = {np.linalg.norm(z):.3e}",
          flush=True)
    return res


# q0: assembled coarse op, plain
z0 = P @ lu_c.solve(P.T @ b)
q(z0, "q0 assembled coarse      ")

# q1: Galerkin coarse op
t0 = time.time()
G = (P.T @ (Ct @ P)).tocsc()
lu_g = spla.splu(G)
zg = P @ lu_g.solve(P.T @ b)
q(zg, "q1 Galerkin coarse       ")

# q2: deflated assembled coarse solve
Mxc = M_c @ x_c
xcn = x_c / np.sqrt(np.real(np.vdot(x_c, Mxc)))
Mxc = M_c @ xcn


def defl_solve(rhs):
    rhs2 = rhs - np.vdot(xcn, rhs) * Mxc  # left-project
    y = lu_c.solve(rhs2)
    y = y - np.vdot(Mxc, y) * xcn  # right-project
    return y


z2 = P @ defl_solve(P.T @ b)
q(z2, "q2 deflated assembled    ")

# q3: Galerkin + Jacobi post-smoothing
d = Ct.diagonal()
scale = np.sqrt(np.mean(np.abs(d) ** 2))
dreg = np.where(np.abs(d) < 1e-10 * scale, -1.0 * scale, d)
for om in (0.3, 0.7, 1.0):
    z3 = zg + om * ((b - Ct @ zg) / dreg)
    q(z3, f"q3 Galerkin+Jacobi om={om}")

# q4: deflated Galerkin
mu_g, vec_g = eigs(LinearOperator((nc, nc),
                                  matvec=lambda x: lu_g.solve((P.T @ (M_f @ (P @ x)))),
                                  dtype=complex), k=1, which="LM")
xg = vec_g[:, 0]
Mg = P.T @ (M_f @ (P @ xg))
xg = xg / np.sqrt(np.real(np.vdot(xg, Mg)))
Mg = P.T @ (M_f @ (P @ xg))
zg2 = lu_g.solve(P.T @ b - np.vdot(xg, P.T @ b) * Mg)
zg2 = zg2 - np.vdot(Mg, zg2) * xg
q(P @ zg2, "q4 deflated Galerkin     ")
print("DONE", flush=True)
