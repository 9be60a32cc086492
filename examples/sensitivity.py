"""Cylinder adjoint sensitivity: d sigma/d Re and the wavemaker map.

Counterpart of ``.examples/sensitivity.py``: direct + adjoint leading
modes at Re, bi-orthonormal normalization, baseflow sensitivity,
total d sigma/d Re, and the structural-sensitivity (wavemaker) field
exported as a figure + npz.

Usage: python examples/sensitivity.py [--re 50] [--out cases/sens]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, default=50.0)
    ap.add_argument("--target", default="0.02+0.74j")
    ap.add_argument("--out", type=Path, default=Path("cases/sensitivity"))
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    if args.platform:
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])

    from lsafw_tpu.config import (
        BoundaryConditionsConfig,
        CylinderFlowGeometryConfig,
    )
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.plot import plot_mixed_function
    from lsafw_tpu.sensitivity import EigenSensitivitySolver
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.io import export_function
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    cfg = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-10.0, 30.0), y_range=(-10.0, 10.0), resolution=1.0,
        resolution_around_cylinder=0.25, influence_radius=8.0,
    )
    mesh = cylinder_flow_mesh(cfg)

    def marker(x):
        out = np.full(x.shape[0], 5, dtype=np.int32)
        out[np.isclose(x[:, 1], -10.0)] = 3
        out[np.isclose(x[:, 1], 10.0)] = 4
        out[np.isclose(x[:, 0], -10.0)] = 1
        out[np.isclose(x[:, 0], 30.0)] = 2
        return out

    mark_boundary_facets(mesh, marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=3, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=4, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=2, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=5, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=5, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    ctx = AssemblyContext.build(spaces)
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=True, steps=4, tol=1e-9, max_it=40
    )

    sens = EigenSensitivitySolver(
        ctx, mesh, bcs, w, args.re,
        perturbation_bcs=bcs_pert, target=complex(args.target),
    )
    d_sigma = sens.evaluate()
    print(f"sigma = {sens._sigma}")
    print(f"d sigma/d Re = {d_sigma}")

    sw = sens.compute_wavemaker()
    args.out.mkdir(parents=True, exist_ok=True)
    export_function(sw, spaces, args.out, name="wavemaker")
    export_function(w, spaces, args.out, name="baseflow")
    plot_mixed_function(w, spaces, path=args.out / "baseflow.png",
                        title=f"baseflow Re={args.re:g}")
    # wavemaker lives in the pressure slot: plot as a pressure field
    plot_mixed_function(sw, spaces, path=args.out / "wavemaker.png",
                        title=f"wavemaker Sw, Re={args.re:g}")
    p = sw[spaces.dofs_p]
    peak = spaces.pressure.node_coords[np.argmax(np.abs(p))]
    print(f"wavemaker peak at x={peak[0]:.2f}, y={peak[1]:.2f} (max Sw={np.abs(p).max():.2f})")
    print(f"artifacts in {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
