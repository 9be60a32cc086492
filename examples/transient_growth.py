"""Cylinder flow at subcritical Re: optimal transient growth G(T).

The non-normal companion of examples/resolvent_gains.py: the largest
kinetic-energy amplification any initial perturbation of the stable
baseflow reaches by time T.  Each G(T) costs one single-channel banded
factorization pair (real Crank-Nicolson shift s = 2/dt) plus Lanczos
iterations of 2*n_steps banded solves each.

Usage:
    python examples/transient_growth.py [--full] [--re 40]
        [--horizons 2 4 8 16] [--steps 32] [--platform cpu] [--out f.json]
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
    ap.add_argument("--full", action="store_true", help="production geometry")
    ap.add_argument("--re", type=float, default=40.0)
    ap.add_argument("--horizons", nargs="+", type=float, default=(2.0, 4.0, 8.0, 16.0))
    ap.add_argument("--steps", type=int, default=32, help="CN steps per horizon")
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", type=Path, default=None)
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
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.transient import TransientGrowthSolver
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    cfg_dir = Path(__file__).resolve().parents[1] / "config_files" / "2D" / "cylinder"
    geo = load_cylinder_flow_config(
        cfg_dir / ("geometry.toml" if args.full else "geometry_small.toml")
    )
    marker_fn = load_facet_config(
        cfg_dir / ("facets.toml" if args.full else "facets_small.toml")
    )
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
        ramp=True, steps=4, tol=1e-9, max_it=40, linear_solver=lin
    )
    asm = LinearizedNavierStokesAssembler(w, ctx, args.re, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    elements = None
    if on_tpu:
        A_el, M_el, dofs = asm.element_matrices()
        elements = (dofs, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask))
    ts = TransientGrowthSolver(
        A, M, spaces.num_velocity_dofs, bcs_pert.dirichlet_mask,
        method=lin, elements=elements,
    )
    rows = []
    for T in args.horizons:
        t0 = time.time()
        res = ts.solve(float(T), args.steps, k=args.k)
        rows.append({"T": float(T), "gains": res.gains.tolist(),
                     "seconds": time.time() - t0})
        print(f"T={T:6.1f}: G = {res.gains[0]:10.3f}  [{rows[-1]['seconds']:.1f}s]")
    peak = max(rows, key=lambda r: r["gains"][0])
    print(f"peak growth G={peak['gains'][0]:.2f} at T={peak['T']:.1f}")
    if args.out:
        args.out.write_text(json.dumps(
            {"re": args.re, "dofs": spaces.num_dofs,
             "n_steps": args.steps, "rows": rows}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
