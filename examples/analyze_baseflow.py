"""Cylinder flow: analyze the baseflow wake over a Reynolds sweep.

Counterpart of the reference's ``.examples/analyze_baseflow.py``:
per Re, solve the steady baseflow and record the recirculation length
and nondimensional drag to CSV.  Unlike the reference there is no
real-build requirement — one process, one dtype policy.

Usage:
    python examples/analyze_baseflow.py [--full] [--re 10 60 10]
        [--out wake.csv]
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="production geometry")
    ap.add_argument("--re", nargs=3, type=float, default=(10, 60, 10),
                    metavar=("START", "STOP", "STEP"))
    ap.add_argument("--out", type=Path, default=Path("wake.csv"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    from lsafw_tpu.config import (
        load_bc_config,
        load_cylinder_flow_config,
        load_facet_config,
    )
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.solver.baseflow import (
        BaseFlowSolver,
        compute_drag,
        compute_recirculation_length,
    )
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
    ctx = AssemblyContext.build(spaces)
    print(f"{spaces.num_dofs} DOFs", file=sys.stderr)

    on_tpu = jax.default_backend() == "tpu"
    lin = "banded" if on_tpu else "lu"
    rows = []
    w = None
    re_values = np.arange(args.re[0], args.re[1] + 0.5 * args.re[2], args.re[2])
    for re in re_values:
        t0 = time.time()
        solver = BaseFlowSolver(ctx, mesh, bcs, re=float(re))
        if w is not None:
            solver._initial_guess = w  # continuation across the sweep
        w = solver.solve(ramp=w is None, steps=3, tol=1e-9, max_it=40,
                         linear_solver=lin)
        try:
            lr = compute_recirculation_length(ctx, np.asarray(w))
            # measured from the cylinder's downstream face
            lr_cyl = lr - (geo.cylinder_center[0] + geo.cylinder_radius)
        except RuntimeError:
            lr_cyl = 0.0  # attached flow, no wake bubble
        cd = 2.0 * compute_drag(ctx, mesh, np.asarray(w), re=float(re),
                                cylinder_marker=5)
        rows.append((float(re), lr_cyl, cd, time.time() - t0))
        print(f"Re={re:5.1f}  L_r={lr_cyl:7.3f}  Cd={cd:7.4f}  "
              f"({rows[-1][3]:.1f}s)", flush=True)

    with open(args.out, "w", newline="") as f:
        wcsv = csv.writer(f)
        wcsv.writerow(["re", "recirculation_length", "drag"])
        for re, lr, cd, _ in rows:
            wcsv.writerow([re, lr, cd])
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
