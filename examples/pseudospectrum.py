"""Energy-norm pseudospectrum of the linearized cylinder operator.

Maps ||R(z)||_E over a complex-plane grid around the shedding branch
(one factorization pair per grid point, the resolvent machinery at
complex z).  For the stable Re=40 cylinder the eigenvalues sit in the
left half-plane, but the operator's NON-NORMALITY pushes the
pseudospectrum contours far into the right half-plane near the
incipient shedding frequency — the quantitative bridge between the
eigenvalue picture, the resolvent gains (sigma_1(omega) is the imag-
axis slice of this map) and transient growth (Trefethen & Embree).

Usage:
    python examples/pseudospectrum.py [--re 40] [--nx 9 --ny 9] [--out f.json]
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
    ap.add_argument("--re", type=float, default=40.0)
    ap.add_argument("--re-range", type=float, nargs=2, default=[-0.35, 0.05])
    ap.add_argument("--im-range", type=float, nargs=2, default=[0.30, 1.10])
    ap.add_argument("--nx", type=int, default=9)
    ap.add_argument("--ny", type=int, default=9)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--plot", type=Path, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    if args.platform:
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])

    from lsafw_tpu.config import load_bc_config, load_cylinder_flow_config, load_facet_config
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.resolvent import ResolventSolver
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    cfg_dir = Path(__file__).resolve().parents[1] / "config_files" / "2D" / "cylinder"
    geo = load_cylinder_flow_config(cfg_dir / "geometry_small.toml")
    marker_fn = load_facet_config(cfg_dir / "facets_small.toml")
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
    A, M = LinearizedNavierStokesAssembler(
        w, ctx, args.re, bcs_pert, mesh).assemble_eigensystem()
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, bcs_pert.dirichlet_mask, method=lin)

    re_pts = np.linspace(*args.re_range, args.nx)
    im_pts = np.linspace(*args.im_range, args.ny)
    t0 = time.time()
    G = rs.pseudospectrum(re_pts, im_pts, tol=1e-6)
    dt = time.time() - t0
    # the right-half-plane protrusion: largest eps^-1 at Re(z) >= 0
    rhp = G[:, re_pts >= 0.0]
    out = {
        "re": args.re, "dofs": spaces.num_dofs,
        "re_pts": re_pts.tolist(), "im_pts": im_pts.tolist(),
        "resolvent_norm": G.tolist(),
        "max_norm_right_half_plane": float(rhp.max()) if rhp.size else None,
        "seconds": dt,
        "note": ("contour at level 1/eps bounds the eps-pseudospectrum "
                 "in the energy metric; imag-axis slice = resolvent "
                 "gain curve sigma_1(omega)"),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    if args.plot:
        from lsafw_tpu.plot import plot_pseudospectrum

        plot_pseudospectrum(
            re_pts, im_pts, G, path=args.plot,
            title=f"cylinder Re={args.re:g}: " r"$\log_{10}\|R(z)\|_E$")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
