"""Floquet stability of the saturated cylinder shedding cycle.

Pipeline: steady baseflow (unstable) -> eigenmode kick -> nonlinear
march to the saturated limit cycle -> detect the period from the wake
probe -> store N snapshots over one period -> Floquet multipliers of
the monodromy operator.

Physics checks reported:
  * the trivial multiplier mu = 1 (phase mode of an autonomous cycle);
  * all other |mu| <= 1 for the stable 2D cycle at moderate Re (the
    2D secondary instability appears only at much higher Re).

Usage:
    python examples/floquet_cycle.py [--re 60] [--dt 0.2] [--t-sat 350]
        [--n-snaps 40] [--k 5] [--platform cpu] [--out f.json]
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
    ap.add_argument("--re", type=float, default=60.0)
    ap.add_argument("--dt", type=float, default=0.2)
    ap.add_argument("--t-sat", type=float, default=350.0)
    ap.add_argument("--n-snaps", type=int, default=40)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--inexact", action="store_true",
                    help="production-scale memory: one cycle-mean "
                         "factor as the reusable PC instead of N factors")
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
    from lsafw_tpu.floquet import FloquetSolver
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
    from lsafw_tpu.solver.timestepping import UnsteadySolver, dominant_frequency
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
    asm = LinearizedNavierStokesAssembler(w, ctx, args.re, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-8, ncv=30))
    es.set_st_type(STType.SINVERT)
    es.set_target(0.05 + 0.75j)
    pairs = es.solve()
    sigma, vhat = max(pairs, key=lambda p: p[0].real)
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

    # one more period, storing N snapshots (dt adjusted to fit exactly)
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
    print(f"orbit closure |q(T)-q(0)|/|q(0)| = {closure:.2e}", file=sys.stderr)

    fs = FloquetSolver(ctx, mesh, bcs, args.re, snaps, dt_f, method=lin,
                       inexact=args.inexact)
    fr = fs.solve(k=args.k)
    out = {
        "re": args.re, "dofs": spaces.num_dofs, "period": fr.period,
        "omega_saturated": omega,
        "multipliers": [[m.real, m.imag] for m in fr.multipliers],
        "abs_multipliers": np.abs(fr.multipliers).tolist(),
        "trivial_error": fr.trivial_error,
        "orbit_closure": closure,
        "stable_cycle": bool(np.sort(np.abs(fr.multipliers))[-2] < 1.0 + 1e-3),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
