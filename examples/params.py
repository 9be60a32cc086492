"""Cylinder flow: domain-parameter study (channel length).

Counterpart of the reference's ``.examples/params.py``: sweep the
outlet distance of the cylinder channel and record how the leading
eigenvalue moves — the domain-truncation sensitivity that explains the
sigma offset between the reduced and production geometries
(VALIDATION.md).

Usage:
    python examples/params.py [--lengths 20 30 45] [--re 50]
        [--out params.csv]
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", nargs="+", type=float, default=[20.0, 30.0, 45.0],
                    help="outlet distances (domain x_max)")
    ap.add_argument("--re", type=float, default=50.0)
    ap.add_argument("--target", nargs=2, type=float, default=(0.018, 0.738))
    ap.add_argument("--out", type=Path, default=Path("params.csv"))
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
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    cfg_dir = Path(__file__).resolve().parents[1] / "config_files" / "2D" / "cylinder"
    geo0 = load_cylinder_flow_config(cfg_dir / "geometry_small.toml")
    target = complex(args.target[0], args.target[1])
    on_tpu = jax.default_backend() == "tpu"
    lin = "banded" if on_tpu else "lu"

    rows = []
    for L in args.lengths:
        t0 = time.time()
        geo = dataclasses.replace(geo0, x_range=(geo0.x_range[0], float(L)))

        # facet rules depend on the outlet x: tag by coordinates directly
        x_min, x_max = geo.x_range
        y_min, y_max = geo.y_range

        def marker(x):
            # np.isclose tolerances, as the TOML `equals` rules use
            # (config.py facet conditions); distmesh boundary vertices
            # sit within ~rtol of the exact planes
            out = np.full(x.shape[0], 5, dtype=np.int32)  # default cylinder
            out[np.isclose(x[:, 1], y_min)] = 3
            out[np.isclose(x[:, 1], y_max)] = 4
            out[np.isclose(x[:, 0], x_max)] = 2
            out[np.isclose(x[:, 0], x_min)] = 1
            return out

        mesh = cylinder_flow_mesh(geo)
        mark_boundary_facets(mesh, marker)
        spaces = define_spaces(mesh)
        bcs = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs.toml"))
        bcs_pert = define_bcs(
            mesh, spaces, load_bc_config(cfg_dir / "bcs_perturbation.toml"))
        ctx = AssemblyContext.build(spaces)

        w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
            ramp=True, steps=3, tol=1e-9, max_it=40, linear_solver=lin)
        asm = LinearizedNavierStokesAssembler(w, ctx, args.re, bcs_pert, mesh)
        A, M = asm.assemble_eigensystem()
        es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-9, ncv=30))
        es.set_st_type(STType.SINVERT)
        es.set_target(target)
        if on_tpu:
            A_el, M_el, dofs = asm.element_matrices()
            es.set_st_pc_type("banded")
            es.set_elements(ctx, A_el, M_el,
                            np.asarray(bcs_pert.dirichlet_mask), dofs=dofs)
        pairs = es.solve()
        sigma = max((p[0] for p in pairs), key=lambda s: s.real)
        rows.append((L, spaces.num_dofs, sigma))
        print(f"L={L:6.1f}  n={spaces.num_dofs}  "
              f"sigma={sigma.real:+.5f}{sigma.imag:+.5f}j  "
              f"({time.time()-t0:.1f}s)", flush=True)

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["length", "dofs", "sigma_re", "sigma_im"])
        for L, n, s in rows:
            w.writerow([L, n, s.real, s.imag])
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
