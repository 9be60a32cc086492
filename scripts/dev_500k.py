"""500k-DOF single-chip flagship eigensolve (VERDICT round-3 item 2).

Production cylinder geometry at ~sqrt(3)x finer resolution (~500k
Taylor-Hood DOFs).  The band-memory budget (LSAFW_BAND_MEM_GB)
truncates the factor into a banded preconditioner; refinement against
the true operator absorbs the approximation.

Run on TPU:  LSAFW_BAND_MEM_GB=10 timeout 5400 python scripts/dev_500k.py
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lsafw_tpu.config import (
    load_bc_config, load_cylinder_flow_config, load_facet_config,
)
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.eigen import (
    EigenSolver, EigensolverConfig, STType, eigen_residuals,
)
from lsafw_tpu.utils.logging import setup_logging

setup_logging(verbose=True)

SCALE = float(os.environ.get("DEV500_SCALE", "0.58"))
# mesh-sequencing source: "prod" = the production 175k geometry (its
# baseflow/eigenpair computed in-script); a float = a previous
# dev_500k run at that DEV500_SCALE whose /tmp caches seed this one
# (e.g. the 1M run chains DEV500_SCALE=0.42 DEV500_COARSE=0.58)
COARSE = os.environ.get("DEV500_COARSE", "prod")
RE = 50.0
TARGET = 0.018 + 0.7379601143282424j

cfg_dir = os.path.join(os.path.dirname(__file__), "..", "config_files", "2D", "cylinder")
geo_full = load_cylinder_flow_config(os.path.join(cfg_dir, "geometry.toml"))
import dataclasses


def _scaled(g, s):
    return dataclasses.replace(
        g, resolution=g.resolution * s,
        resolution_around_cylinder=g.resolution_around_cylinder * s)


geo = _scaled(geo_full, SCALE)
marker_fn = load_facet_config(os.path.join(cfg_dir, "facets.toml"))


def cached_cyl_mesh(geo_x, tag: str):
    """/tmp-cached distmesh cylinder mesh (points/cells/facet_tags):
    distmesh2d at 500k+ costs ~10 host-minutes per run on this 1-core
    VM and the TG iteration loop re-enters this script many times."""
    from lsafw_tpu.meshing.mesh import CellType, Mesh

    p = f"/tmp/mesh500k_{tag}.npz"
    if os.path.exists(p):
        d = np.load(p)
        return Mesh(vertices=d["vertices"], cells=d["cells"],
                    cell_type=CellType(str(d["ct"])), facet_tags=d["ft"])
    m = cylinder_flow_mesh(geo_x)
    mark_boundary_facets(m, marker_fn)
    np.savez(p, vertices=m.vertices, cells=m.cells, ct=m.cell_type.value,
             ft=m.facet_tags)
    return m


_coarse_memo = {}


def coarse_setup():
    """Coarse mesh/spaces + cache paths for the mesh-sequencing chain."""
    if _coarse_memo:
        return _coarse_memo["v"]
    if COARSE == "prod":
        geo_c = geo_full
        wpath, epath = "/tmp/w167k_re50.npy", "/tmp/eig_prod.npz"
    else:
        cs = float(COARSE)
        geo_c = _scaled(geo_full, cs)
        wpath, epath = f"/tmp/w500k_{cs}.npy", f"/tmp/eig500k_{cs}.npz"
    mesh_c = cached_cyl_mesh(geo_c, "prod" if COARSE == "prod" else COARSE)
    spaces_c = define_spaces(mesh_c)
    _coarse_memo["v"] = (mesh_c, spaces_c, wpath, epath)
    return _coarse_memo["v"]

t0 = time.time()
mesh = cached_cyl_mesh(geo, str(SCALE))
spaces = define_spaces(mesh)
bcs = define_bcs(mesh, spaces, load_bc_config(os.path.join(cfg_dir, "bcs.toml")))
bcs_pert = define_bcs(
    mesh, spaces, load_bc_config(os.path.join(cfg_dir, "bcs_perturbation.toml"))
)
ctx = AssemblyContext.build(spaces)
n = spaces.num_dofs
print(f"setup: {n} DOFs, {mesh.num_cells} cells ({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
on_tpu = jax.default_backend() == "tpu"


def ensure_coarse_baseflow() -> str:
    """Compute (and /tmp-cache) the coarse-mesh baseflow at RE if it is
    missing — BEFORE the fine baseflow, so a fresh /tmp still gets the
    mesh-sequenced fine guess instead of a full 500k+ ramp."""
    mesh_c, spaces_c, wpath_c, _ = coarse_setup()
    if os.path.exists(wpath_c):
        return wpath_c
    if COARSE != "prod":
        raise RuntimeError(
            f"chained coarse baseflow {wpath_c} missing — run "
            f"DEV500_SCALE={COARSE} first")
    bcs_c = define_bcs(mesh_c, spaces_c,
                       load_bc_config(os.path.join(cfg_dir, "bcs.toml")))
    ctx_c = AssemblyContext.build(spaces_c)
    solver_c = BaseFlowSolver(ctx_c, mesh_c, bcs_c, re=RE)
    ramp_c = True
    if os.path.exists("/tmp/w167k.npy"):  # Re=47 baseflow as guess
        solver_c._initial_guess = np.load("/tmp/w167k.npy")
        ramp_c = False
    tc = time.time()
    w_c = solver_c.solve(ramp=ramp_c, steps=4, tol=1e-9, max_it=40,
                         linear_solver="banded" if on_tpu else "lu")
    np.save(wpath_c, np.asarray(w_c))
    print(f"coarse baseflow computed ({time.time()-tc:.0f}s)", flush=True)
    return wpath_c


WCACHE = f"/tmp/w500k_{SCALE}.npy"
if os.path.exists(WCACHE):
    w = np.load(WCACHE)
    t_base = 0.0
    print("baseflow loaded from cache", flush=True)
else:
    solver = BaseFlowSolver(ctx, mesh, bcs, re=RE)
    ramp = True
    mesh_c, spaces_c, wpath_c, _ = coarse_setup()
    wsrc = ensure_coarse_baseflow()
    if wsrc is not None:
        # mesh-sequenced continuation: a converged coarser-resolution
        # baseflow interpolated as the Re=50 initial guess — skips the
        # fine-mesh Stokes + ramp
        from lsafw_tpu.solver.baseflow import interpolate_state

        w_c = np.load(wsrc)
        if w_c.shape[0] == spaces_c.num_dofs:
            guess = interpolate_state(w_c, spaces_c, spaces)
            solver._initial_guess = np.where(
                bcs.dirichlet_mask, bcs.dirichlet_values, guess)
            ramp = False
            print(f"mesh-sequenced guess from {wsrc} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    w = solver.solve(
        ramp=ramp, steps=4, tol=1e-9, max_it=40,
        linear_solver="banded" if on_tpu else "lu",
    )
    np.save(WCACHE, np.asarray(w))
    t_base = time.time() - t0
    print(f"baseflow: {t_base:.0f}s", flush=True)

# ---- coarse eigenpair for the nested path: computed BEFORE the fine
# assembly so the 6.5 GB coarse band never coexists with the fine
# operator arrays (the coexistence OOM'd the 500k rerun) ----
if not os.environ.get("DEV500_KS"):
    import gc

    from lsafw_tpu.solver.baseflow import BaseFlowSolver as _BFS
    from lsafw_tpu.solver.baseflow import interpolate_state
    from lsafw_tpu.solver.eigen import ShiftInvertOperator, nested_eigenpair

    t0 = time.time()
    mesh_c, spaces_c, wpath_c, epath_c = coarse_setup()
    if os.path.exists(epath_c):
        d = np.load(epath_c)
        lam_c = complex(d["sig_re"], d["sig_im"])
        x_c = d["v_re"] + 1j * d["v_im"]
        print(f"coarse eigenpair loaded from {epath_c} "
              f"(sigma={lam_c:.6f})", flush=True)
    else:
        if COARSE != "prod":
            raise RuntimeError(
                f"chained coarse eigenpair {epath_c} missing — run "
                f"DEV500_SCALE={COARSE} first")
        bcs_c = define_bcs(mesh_c, spaces_c,
                           load_bc_config(os.path.join(cfg_dir, "bcs.toml")))
        bcs_pert_c = define_bcs(
            mesh_c, spaces_c,
            load_bc_config(os.path.join(cfg_dir, "bcs_perturbation.toml")))
        ctx_c = AssemblyContext.build(spaces_c)
        w_c = np.load(ensure_coarse_baseflow())
        print(f"coarse baseflow ready ({time.time()-t0:.0f}s)", flush=True)

        asm_c = LinearizedNavierStokesAssembler(
            jnp.asarray(w_c), ctx_c, RE, bcs_pert_c, mesh_c)
        A_c, M_c = asm_c.assemble_eigensystem()
        A_el_c, M_el_c, dofs_c = asm_c.element_matrices()
        es_c = EigenSolver(A_c, M_c, EigensolverConfig(num_eig=1, atol=1e-9,
                                                       ncv=16))
        es_c.set_st_type(STType.SINVERT)
        es_c.set_target(TARGET)
        es_c.set_st_pc_type("banded")
        es_c.set_elements(ctx_c, A_el_c, M_el_c,
                          np.asarray(bcs_pert_c.dirichlet_mask), dofs=dofs_c)
        lam_c, x_c = es_c.solve()[0]
        np.savez(epath_c, sig_re=lam_c.real, sig_im=lam_c.imag,
                 v_re=np.real(x_c), v_im=np.imag(x_c))
        print(f"coarse eigen: sigma={lam_c:.6f} ({time.time()-t0:.0f}s)",
              flush=True)
        # free the coarse band factor BEFORE the fine SI op builds
        del es_c, asm_c, A_c, M_c, A_el_c, M_el_c
        gc.collect()

    v0 = (interpolate_state(np.real(x_c), spaces_c, spaces)
          + 1j * interpolate_state(np.imag(x_c), spaces_c, spaces))
    # free every coarse-stage device array before the fine stages
    _coarse_memo.clear()
    del mesh_c, spaces_c, x_c
    gc.collect()
    print(f"coarse eigenpair + interpolation ready ({time.time()-t0:.0f}s)",
          flush=True)

t0 = time.time()
asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
A, M = asm.assemble_eigensystem()
if not os.environ.get("DEV500_TG"):
    # element matrices feed the legacy/KS matrix-free paths only; the
    # TG branch rides BCSR and must not carry the extra device arrays
    A_el, M_el, dofs = asm.element_matrices()
A.data.block_until_ready()
del asm
import gc as _gc

_gc.collect()
t_asm = time.time() - t0
print(f"assemble: {t_asm:.0f}s (nnz={A.pattern.nnz})", flush=True)

t0 = time.time()
if os.environ.get("DEV500_KS"):
    # legacy path: full Krylov-Schur on the truncated-band SI
    es = EigenSolver(A, M, EigensolverConfig(num_eig=1, atol=1e-8, ncv=24))
    es.set_st_type(STType.SINVERT)
    es.set_target(TARGET)
    es.set_st_pc_type("banded")
    es.set_elements(ctx, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask),
                    dofs=dofs)
    pairs = es.solve()
    sigma = pairs[0][0]
elif os.environ.get("DEV500_TG"):
    # TWO-GRID nested path: the truncated fine band alone has
    # contraction 1.12 at 500k (every inner solve stalls ~1e-2);
    # TwoGridSIPC adds the coarse exact-band SI correction through the
    # barycentric P/R (lsafw_tpu.solver.eigen.TwoGridSIPC)
    from lsafw_tpu.ops.bcsr import BCSRShiftedOp, plan_for_pattern
    from lsafw_tpu.solver.band import factor_auto, plan_for_csr
    from lsafw_tpu.solver.baseflow import interpolation_matrix
    from lsafw_tpu.solver.eigen import BandedSIOp, TwoGridSIPC, ell_of_csr

    # the PC's coarse grid is independent of the GUESS chain: at 1M the
    # guess comes from the 500k eigenpair (COARSE=0.58) but the coarse
    # correction must ride an EXACT band — the prod 175k level
    # the PC grid only provides the interpolation space for P: the
    # coarse operator is GALERKIN-projected from the fine one (below),
    # so no coarse baseflow or assembly is required
    PCGRID = os.environ.get("DEV500_PCGRID", "prod")
    geo_pc = geo_full if PCGRID == "prod" else _scaled(geo_full, float(PCGRID))
    mesh_c = cached_cyl_mesh(geo_pc, "prod" if PCGRID == "prod" else PCGRID)
    spaces_c = define_spaces(mesh_c)
    P = interpolation_matrix(spaces_c, spaces)
    Pd, Pc_ = ell_of_csr(P)
    nc_pc = P.shape[1]
    _coarse_memo.clear()
    del mesh_c, spaces_c
    gc.collect()

    # GALERKIN coarse operator G = P^T (A, M) P: its near-null
    # direction under the shift IS the prolonged fine eigendirection,
    # so the (amplified) coarse solution is the USEFUL correction; the
    # re-assembled C_c's near-null direction differs from the fine one
    # by DISCRETIZATION error, which the shift amplifies into junk
    # (scripts/dev_tg_repro.py q0/q1: 1.49 assembled vs 0.19 Galerkin).
    # No coarse assembly/baseflow is needed at all: the band PC of the
    # coarse GCR is factored from the GALERKIN data too (the assembled
    # factor preconditions G with the same mismatch and the coarse GCR
    # stalls — repro2f/2h).
    t0g = time.time()
    from lsafw_tpu.ops.sparse import CSRMatrix
    from lsafw_tpu.solver.eigen import galerkin_pair

    gcache = f"/tmp/galerkin_{SCALE}_{PCGRID}.npz"
    if os.path.exists(gcache):
        d_g = np.load(gcache)
        import scipy.sparse as _sp

        A_g = CSRMatrix.from_scipy(_sp.csr_matrix(
            (d_g["a"], d_g["idx"], d_g["ptr"]), shape=(nc_pc, nc_pc)))
        M_g = CSRMatrix(A_g.pattern, jnp.asarray(d_g["m"]))
    else:
        A_g, M_g = galerkin_pair(P, A, M)
        np.savez(gcache, a=np.asarray(A_g.data), m=np.asarray(M_g.data),
                 idx=A_g.pattern.indices, ptr=A_g.pattern.indptr)
    gc.collect()
    print(f"Galerkin coarse op: nnz={A_g.pattern.nnz} "
          f"({time.time()-t0g:.0f}s host triple products)", flush=True)
    # allocation order: every smaller block FIRST, the multi-GB coarse
    # band factor LAST (its elimination temps ride on an emptier HBM —
    # building blocks after the 6.9 GB band OOM'd, run r5g).  The
    # Galerkin operator is NEVER materialized on device for application
    # (its BCSR plan sat at 1.2% fill = 6.6 GB, run r5h): the coarse
    # GCR applies G as the sandwich P^T C_f P through Cop_f, and only
    # the band PC is factored from the host Galerkin data.
    os.environ["LSAFW_BAND_DTYPE"] = "f32"
    os.environ["LSAFW_PIVOT_MEM_GB"] = "0"
    # HI-ONLY fine channels: the full f64 pair blocks (4.3 GB) do not
    # fit next to the bands — eta-grade correction solves tolerate
    # 1e-7 applies; the once-per-outer residual rides the f64 ELL
    # resid_op below.  Cop_f lives INSIDE the PC (one pytree leaf);
    # _si_apply_C/_with_sigma reuse and retarget it from there.
    Cop_f = BCSRShiftedOp.from_csr(
        A, M, TARGET, plan_for_pattern(A, br=16, bc=16), lo_channels=False)
    # budget-truncated FINE band: useless standalone (contraction ~1 at
    # 500k) but as the multiplicative fine term it smooths the
    # broadband interpolation noise the coarse grid cannot see — the
    # missing piece that took the 43k miniature from a 0.9x/outer stall
    # to 0.05x/outer geometric convergence (repro2h vs repro2i)
    os.environ["LSAFW_BAND_MEM_GB"] = os.environ.get("DEV500_FB_GB", "2.5")
    plan_f = plan_for_csr(A, force_f32=True)
    blu_f, _ = factor_auto(
        plan_f, A.data - TARGET.real * M.data, (-TARGET.imag) * M.data,
        diag_slots=A.pattern.diag_slots)
    os.environ["LSAFW_BAND_MEM_GB"] = os.environ.get("DEV500_CB_GB", "6")
    plan_c = plan_for_csr(A_g, force_f32=True)
    blu_c, _ = factor_auto(
        plan_c, A_g.data - TARGET.real * M_g.data,
        (-TARGET.imag) * M_g.data, diag_slots=A_g.pattern.diag_slots)
    del A_g, M_g  # only the band factor holds Galerkin data now
    gc.collect()
    pc2 = TwoGridSIPC(blu_c, blu_f, Pd, Pc_, Cop=Cop_f,
                      sig0_re=jnp.asarray(TARGET.real),
                      sig0_im=jnp.asarray(TARGET.imag),
                      cproj=None, nc=nc_pc,
                      coarse_tol=float(os.environ.get("DEV500_CTOL", "1e-2")),
                      coarse_its=int(os.environ.get("DEV500_CITS", "12")),
                      smooth_steps=int(os.environ.get("DEV500_SMOOTH", "1")),
                      omega=float(os.environ.get("DEV500_OMEGA", "1.0")))
    op2 = BandedSIOp(A, M, pc2, jnp.asarray(TARGET.real),
                     jnp.asarray(TARGET.imag), None, None)
    rop2 = BandedSIOp(A, M, None, jnp.asarray(TARGET.real),
                      jnp.asarray(TARGET.imag), None, None)
    tg_inner = int(os.environ.get("DEV500_TG_INNER", "30"))
    sigma, v, rel, n_outer = nested_eigenpair(
        op2, v0, lam_c, tol=1e-8, inner_tol=1e-4, inner_its=tg_inner,
        m=16, max_outer=20, bc_mask=np.asarray(bcs_pert.dirichlet_mask),
        resid_op=rop2)
    pairs = [(sigma, v)]
    np.savez(f"/tmp/eig500k_{SCALE}.npz", sig_re=sigma.real,
             sig_im=sigma.imag, v_re=np.real(v), v_im=np.imag(v))
    print(f"two-grid nested refine: {n_outer} outer steps, rel {rel:.2e}",
          flush=True)
else:
    # the nested refinement tolerates a WEAK preconditioner by design:
    # a smaller truncated f32 band (f32: the bf16 pair factor risks the
    # non-finite growth seen on the real Newton factors) leaves HBM
    # headroom for the GCR window and the refinement temps.  NEVER let
    # the SI matvecs fall through to the element operator here: the
    # CElementOperator inside a long jitted loop at >100k DOFs
    # hard-crashes the TPU worker (the BCSR policy exists for this).
    os.environ["LSAFW_BAND_MEM_GB"] = "6"
    os.environ["LSAFW_BAND_DTYPE"] = "f32"
    os.environ["LSAFW_SI_MATVEC"] = "bcsr"
    sio = ShiftInvertOperator(
        A, M, TARGET, method="banded",
        elements=(dofs, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask)),
        skip_calibration=True)
    # inner_its=100 keeps each correction DISPATCH under the tunnel's
    # execution watchdog (~60 s kills: a 300-iteration GCR dispatch
    # hard-crashed the worker; the outer loop absorbs the difference)
    sigma, v, rel, n_outer = nested_eigenpair(
        sio.device_op, v0, lam_c, tol=1e-8, inner_tol=1e-3, inner_its=100,
        max_outer=30, bc_mask=np.asarray(bcs_pert.dirichlet_mask))
    pairs = [(sigma, v)]
    np.savez(f"/tmp/eig500k_{SCALE}.npz", sig_re=sigma.real,
             sig_im=sigma.imag, v_re=np.real(v), v_im=np.imag(v))
    print(f"nested refine: {n_outer} outer steps, rel {rel:.2e}", flush=True)
t_eig = time.time() - t0
resid = float(eigen_residuals(A, M, pairs)[0])
print(
    f"RESULT n={n} sigma={sigma.real:+.5f}{sigma.imag:+.5f}j resid={resid:.2e} "
    f"baseflow={t_base:.0f}s assemble={t_asm:.0f}s eigen={t_eig:.0f}s",
    flush=True,
)
out = dict(n=n, sigma_re=sigma.real, sigma_im=sigma.imag, resid=resid,
           t_base=t_base, t_asm=t_asm, t_eig=t_eig, scale=SCALE, re=RE)
with open("/tmp/dev500k_result.json", "w") as f:
    json.dump(out, f)
