"""Cylinder flow at subcritical Re: resolvent gain curve sigma_1(omega).

Beyond the reference's modal toolbox: the peak of the optimal-gain
curve of the stable Re=40 flow sits near the incipient vortex-shedding
frequency (the Hopf mode crosses at Re_c ~ 46.9 with omega ~ 0.73 —
doc/cylinder_sigma_table.md), showing the flow as a selective
amplifier before it becomes an oscillator.

Per frequency: two banded device factorizations (direct + adjoint,
shared RCM/plan) and a handful of W-weighted Lanczos iterations whose
applies are shift-invert solves — the same cost shape as one
shift-invert eigensolve.

Usage:
    python examples/resolvent_gains.py [--full] [--re 40]
        [--omega 0.3 1.2 0.15] [--k 2] [--platform cpu] [--out f.json]
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
    ap.add_argument("--omega", nargs=3, type=float, default=(0.3, 1.2, 0.15),
                    metavar=("START", "STOP", "STEP"))
    ap.add_argument("--k", type=int, default=1, help="number of gains")
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
    from lsafw_tpu.resolvent import ResolventSolver
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    cfg_dir = Path(__file__).resolve().parents[1] / "config_files" / "2D" / "cylinder"
    geo = load_cylinder_flow_config(
        cfg_dir / ("geometry.toml" if args.full else "geometry_small.toml")
    )
    marker_fn = load_facet_config(
        cfg_dir / ("facets.toml" if args.full else "facets_small.toml")
    )
    t0 = time.time()
    mesh = cylinder_flow_mesh(geo)
    mark_boundary_facets(mesh, marker_fn)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs.toml"))
    bcs_pert = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs_perturbation.toml"))
    ctx = AssemblyContext.build(spaces)
    print(f"setup {time.time()-t0:.1f}s, {spaces.num_dofs} DOFs", file=sys.stderr)

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
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, bcs_pert.dirichlet_mask,
        method=lin, elements=elements,
    )
    omegas = np.arange(args.omega[0], args.omega[1] + 0.5 * args.omega[2], args.omega[2])
    rows = []
    for om in omegas:
        t0 = time.time()
        m = rs.solve(float(om), k=args.k)
        rows.append({"omega": float(om), "gains": m.gains.tolist(),
                     "seconds": time.time() - t0})
        print(f"omega={om:5.2f}: sigma_1 = {m.gains[0]:9.2f}  "
              f"[{rows[-1]['seconds']:.1f}s]")
    peak = max(rows, key=lambda r: r["gains"][0])
    print(f"peak gain {peak['gains'][0]:.1f} at omega={peak['omega']:.2f}")
    if args.out:
        args.out.write_text(json.dumps(
            {"re": args.re, "dofs": spaces.num_dofs, "rows": rows}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
