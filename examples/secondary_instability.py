"""3D secondary instability of the 2D cylinder shedding cycle.

The Barkley & Henderson (JFM 322, 1996) calculation: march the 2D
cycle to saturation, store one period of snapshots, then sweep the
spanwise wavenumber beta and compute the leading Floquet multipliers
of the QUASI-3D monodromy (``lsafw_tpu.span.spanwise_floquet``).
|mu|(beta) > 1 inside a band marks the three-dimensional transition:
mode A (beta ~ 1.6, onset Re ~ 189) and mode B (beta ~ 7.6, onset
Re ~ 259) in the published, well-resolved setting.  Below onset (e.g.
--re 60) the whole curve must sit below 1 — the cheap correctness run.

NOTE: quantitative onset values need a production mesh; the default
config here is the reduced geometry, good for band SHAPE and for
sub-onset stability checks.

Usage:
    python examples/secondary_instability.py [--re 220] [--betas 0.5 ...]
        [--dt 0.15] [--t-sat 400] [--n-snaps 32] [--k 3] [--out f.json]
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
    ap.add_argument("--re", type=float, default=220.0)
    ap.add_argument("--betas", type=float, nargs="+",
                    default=[0.8, 1.2, 1.6, 2.0, 2.5])
    ap.add_argument("--dt", type=float, default=0.15)
    ap.add_argument("--t-sat", type=float, default=400.0)
    ap.add_argument("--n-snaps", type=int, default=32)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--prestored", action="store_true",
                    help="prestore all N implicit factors instead of the "
                         "one cycle-mean factor")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", type=Path, default=None)
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
    from lsafw_tpu.span import SpanwiseStability, spanwise_floquet
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
        ramp=True, steps=6, tol=1e-10, max_it=60, linear_solver=lin)
    asm = LinearizedNavierStokesAssembler(w, ctx, args.re, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-8, ncv=30))
    es.set_st_type(STType.SINVERT)
    es.set_target(0.05 + 0.75j)
    sigma, vhat = max(es.solve(), key=lambda p: p[0].real)
    print(f"2D leading eigenvalue {sigma:.4f}", file=sys.stderr)
    v = np.real(vhat)
    v /= np.linalg.norm(v)

    us = UnsteadySolver(ctx, mesh, bcs, args.re, method=lin,
                        newton_tol=1e-9, refactor_every=10)
    coords = spaces.velocity.dof_coords
    nu_d = spaces.num_velocity_dofs
    d2 = (coords[1:nu_d:2, 0] - 2.5) ** 2 + coords[1:nu_d:2, 1] ** 2
    probe = 2 * int(np.argmin(d2)) + 1
    t0 = time.time()
    res = us.run(jnp.asarray(np.asarray(w) + 1e-3 * v), args.dt,
                 int(args.t_sat / args.dt), probe_dofs=[probe])
    print(f"saturation march: {time.time()-t0:.0f}s", file=sys.stderr)
    q = len(res.t) // 4
    sig = res.probes[:, 0] - np.asarray(w)[probe]
    omega = dominant_frequency(res.t[-2 * q:], sig[-2 * q:])
    period = 2.0 * np.pi / omega
    print(f"saturated omega = {omega:.4f}, period = {period:.3f}", file=sys.stderr)

    n_snaps = args.n_snaps
    dt_f = period / n_snaps
    snaps = np.empty((n_snaps, spaces.num_dofs))
    qstate = jnp.asarray(res.q)
    us_f = UnsteadySolver(ctx, mesh, bcs, args.re, method=lin,
                          newton_tol=1e-10, refactor_every=1)
    for kk in range(n_snaps):
        snaps[kk] = np.asarray(qstate)
        qstate, _ = us_f.step(qstate, dt_f)
    closure = float(np.linalg.norm(np.asarray(qstate) - snaps[0])
                    / np.linalg.norm(snaps[0]))
    print(f"orbit closure = {closure:.2e}", file=sys.stderr)

    span = SpanwiseStability(ctx, snaps[0], args.re, bcs_pert, mesh)
    curve = []
    for beta in args.betas:
        t1 = time.time()
        fs = spanwise_floquet(span, snaps, dt_f, beta, method=lin,
                              inexact=not args.prestored)
        fr = fs.solve(k=args.k)
        mu_max = float(np.abs(fr.multipliers).max())
        curve.append({
            "beta": beta,
            "mu_max": mu_max,
            "multipliers": [[m.real, m.imag] for m in fr.multipliers],
            "seconds": time.time() - t1,
        })
        print(f"beta = {beta:.2f}: |mu|max = {mu_max:.4f} "
              f"({curve[-1]['seconds']:.0f}s)", file=sys.stderr)

    out = {
        "re": args.re, "dofs": spaces.num_dofs,
        "quasi3d_dofs": span.num_dofs,
        "period": period, "omega_saturated": omega,
        "orbit_closure": closure,
        "curve": curve,
        "unstable_band": [c["beta"] for c in curve if c["mu_max"] > 1.0],
    }
    print(json.dumps(out, indent=1))
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
