"""Supercritical cylinder: march to the saturated shedding limit cycle.

The nonlinear closing of the stability story: at Re > Re_c ~ 46.9 the
Hopf mode grows, saturates, and the wake sheds vortices.  This script
marches the full nonlinear equations (``solver/timestepping.py``) from
the (unstable) steady baseflow plus a small eigenmode kick, detects
saturation of the wake probe, and reports

  * the saturated shedding frequency as a Strouhal number
    St = f D / U  (D = 2 r = 1, U = 1), literature ~0.13-0.14 at Re=60;
  * the linear eigenfrequency sigma_im/(2 pi) for comparison (the
    limit-cycle frequency shifts O(amplitude^2) from the Hopf value).

Usage:
    python examples/vortex_shedding.py [--full] [--re 60] [--dt 0.2]
        [--t-end 250] [--platform cpu] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--re", type=float, default=60.0)
    ap.add_argument("--dt", type=float, default=0.2)
    ap.add_argument("--t-end", type=float, default=250.0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--checkpoint", type=Path, default=None,
                    help=".npz march checkpoint (resume on rerun)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    if args.platform:
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])
    import jax.numpy as jnp

    from lsafw_tpu.config import load_bc_config, load_cylinder_flow_config, load_facet_config
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
    from lsafw_tpu.solver.timestepping import UnsteadySolver, dominant_frequency
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    cfg_dir = Path(__file__).resolve().parents[1] / "config_files" / "2D" / "cylinder"
    geo = load_cylinder_flow_config(
        cfg_dir / ("geometry.toml" if args.full else "geometry_small.toml"))
    marker_fn = load_facet_config(
        cfg_dir / ("facets.toml" if args.full else "facets_small.toml"))
    mesh = cylinder_flow_mesh(geo)
    mark_boundary_facets(mesh, marker_fn)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs.toml"))
    bcs_pert = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs_perturbation.toml"))
    ctx = AssemblyContext.build(spaces)
    print(f"{spaces.num_dofs} DOFs", file=sys.stderr)

    on_tpu = jax.default_backend() == "tpu"
    lin = "banded" if on_tpu else "lu"
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40, linear_solver=lin)

    asm = LinearizedNavierStokesAssembler(w, ctx, args.re, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-8, ncv=30))
    es.set_st_type(STType.SINVERT)
    es.set_target(0.05 + 0.75j)
    if on_tpu:
        A_el, M_el, dofs = asm.element_matrices()
        es.set_st_pc_type("banded")
        es.set_elements(ctx, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask), dofs=dofs)
    pairs = es.solve()
    sigma, vhat = max(pairs, key=lambda p: p[0].real)
    print(f"linear: sigma = {sigma.real:+.4f} {sigma.imag:+.4f}j "
          f"(f = {sigma.imag/2/np.pi:.4f})", file=sys.stderr)
    v = np.real(vhat)
    v /= np.linalg.norm(v)

    us = UnsteadySolver(ctx, mesh, bcs, args.re, method=lin,
                        newton_tol=1e-9, refactor_every=10)
    coords = spaces.velocity.dof_coords
    nu_d = spaces.num_velocity_dofs
    d2 = (coords[1:nu_d:2, 0] - 2.5) ** 2 + coords[1:nu_d:2, 1] ** 2
    probe = 2 * int(np.argmin(d2)) + 1
    n_steps = int(args.t_end / args.dt)
    t0 = time.time()
    res = us.run(jnp.asarray(np.asarray(w) + 1e-3 * v), args.dt, n_steps,
                 probe_dofs=[probe], checkpoint_path=args.checkpoint)
    print(f"marched {n_steps} steps in {time.time()-t0:.0f}s", file=sys.stderr)
    sig = res.probes[:, 0] - np.asarray(w)[probe]

    # saturation: amplitude of the last quarter within 5% of the
    # previous quarter
    q = len(sig) // 4
    a_last, a_prev = np.abs(sig[-q:]).max(), np.abs(sig[-2 * q:-q]).max()
    saturated = abs(a_last - a_prev) < 0.05 * a_last
    omega_sat = dominant_frequency(res.t[-2 * q:], sig[-2 * q:])
    St = omega_sat / (2.0 * np.pi)  # D = U = 1
    out = {
        "re": args.re, "dofs": spaces.num_dofs, "dt": args.dt,
        "sigma_linear": [sigma.real, sigma.imag],
        "f_linear": sigma.imag / 2 / np.pi,
        "omega_saturated": omega_sat, "strouhal": St,
        "saturated": bool(saturated), "amplitude": float(a_last),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
