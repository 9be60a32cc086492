"""Self-consistent model vs DNS: predict the limit cycle without marching.

Runs the Mantic-Lugo self-consistent model at Re=60 on the reduced
cylinder and compares its predicted saturated frequency against the
DNS-measured one (omega_sat = 0.8529, doc/shedding_re60_small.json) —
the published result is agreement to a couple of percent, at a tiny
fraction of the DNS cost (a handful of Newton+eigensolve sweeps vs
2250 time steps).

Usage:
    python examples/scm_limit_cycle.py [--re 60] [--platform cpu] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

DNS_OMEGA_SAT = {60.0: 0.8528907621933606}  # doc/shedding_re60_small.json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, default=60.0)
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
    from lsafw_tpu.scm import SelfConsistentModel
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

    on_tpu = __import__("jax").default_backend() == "tpu"
    lin = "banded" if on_tpu else "lu"
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40, linear_solver=lin)

    scm = SelfConsistentModel(
        ctx, mesh, bcs, bcs_pert, args.re,
        linear_solver=lin, si_method=lin if lin == "banded" else "lu",
    )
    t0 = time.time()
    res = scm.solve(np.asarray(w), A0=0.1, tol_sigma=2e-4)
    dt_scm = time.time() - t0
    omega_scm = res.sigma.imag
    ref = DNS_OMEGA_SAT.get(args.re)
    out = {
        "re": args.re, "dofs": spaces.num_dofs,
        "amplitude": res.amplitude,
        "sigma_final": [res.sigma.real, res.sigma.imag],
        "omega_scm": omega_scm,
        "omega_dns": ref,
        "freq_error_vs_dns": (abs(omega_scm - ref) / ref) if ref else None,
        "converged": res.converged,
        "outer_iterations": len(res.history) - 1,
        "seconds": dt_scm,
        "history": res.history,
    }
    print(json.dumps(out, indent=1))
    if ref:
        print(
            f"SCM: omega = {omega_scm:.4f} vs DNS {ref:.4f} "
            f"({100*abs(omega_scm-ref)/ref:.1f}%), A = {res.amplitude:.4f}, "
            f"marginality {res.sigma.real:+.2e}, {dt_scm:.0f}s "
            f"(DNS saturation took ~650s on the same host)",
            file=sys.stderr,
        )
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
