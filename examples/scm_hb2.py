"""Harmonic-balance convergence at Re=60: alternation -> HB1 -> HB2 -> DNS.

The self-consistent model (first-harmonic truncation) predicts the
cylinder limit-cycle frequency ~0.4% above the DNS-saturated value.
Adding the second harmonic (``solve_coupled(harmonics=2)``) retains the
B(q1*, q2) feedback on the fundamental and the q2 Reynolds stress on
the mean — the frequency and amplitude should move toward the DNS
values (Mantic-Lugo et al. 2014 report the same hierarchy).

Reference DNS values on this 11k-DOF mesh (doc/shedding_re60_small.json):
omega_sat = 0.8529, energy amplitude of the fundamental ~ A_scm.

Usage:
    python examples/scm_hb2.py [--re 60] [--out f.json]
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
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument(
        "--hill", action="store_true",
        help="Floquet exponents of the HB2 cycle by Hill's method, "
             "compared against the time-domain monodromy multipliers "
             "(doc/floquet_re60_small.json)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    if args.platform:
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])

    from lsafw_tpu.config import (
        load_bc_config, load_cylinder_flow_config, load_facet_config,
    )
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
    bcs_pert = define_bcs(
        mesh, spaces, load_bc_config(cfg_dir / "bcs_perturbation.toml"))
    ctx = AssemblyContext.build(spaces)
    print(f"{spaces.num_dofs} DOFs", file=sys.stderr)

    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40))
    scm = SelfConsistentModel(ctx, mesh, bcs, bcs_pert, args.re,
                              linear_solver="lu")

    t0 = time.time()
    alt = scm.solve(w, A0=1.0, tol_sigma=5e-4, max_outer=20)
    t_alt = time.time() - t0
    A0 = alt.amplitude_sl or alt.amplitude

    t0 = time.time()
    hb1 = scm.solve_coupled(alt.mean, A0 * alt.mode, abs(alt.sigma.imag))
    t_hb1 = time.time() - t0

    t0 = time.time()
    hb2 = scm.solve_coupled(hb1.mean, hb1.amplitude * hb1.mode,
                            hb1.sigma.imag, harmonics=2)
    t_hb2 = time.time() - t0

    dns_omega = None
    dns_path = Path(__file__).resolve().parents[1] / "doc" / "shedding_re60_small.json"
    if dns_path.exists() and args.re == 60.0:
        d = json.loads(dns_path.read_text())
        dns_omega = d.get("omega_saturated")

    out = {
        "note": (
            "Harmonic-balance hierarchy on the 11k-DOF cylinder: the "
            "alternation (inexact marginality), HB1 (exact coupled "
            "first-harmonic root), HB2 (adds the second harmonic's "
            "feedback on fundamental and mean).  Frequencies should "
            "approach the DNS-saturated omega monotonically."),
        "re": args.re,
        "alternation": {"A": alt.amplitude,
                        "sigma": [alt.sigma.real, alt.sigma.imag],
                        "converged": alt.converged, "seconds": t_alt},
        "hb1": {"A": hb1.amplitude, "omega": hb1.sigma.imag,
                "converged": hb1.converged, "seconds": t_hb1},
        "hb2": {"A": hb2.amplitude, "omega": hb2.sigma.imag,
                "A2": float(np.sqrt(np.real(np.vdot(
                    hb2.q2, scm._Ms @ hb2.q2)))) if hb2.q2 is not None
                else None,
                "converged": hb2.converged, "seconds": t_hb2},
        "dns_omega": dns_omega,
    }
    if dns_omega:
        out["omega_err_hb1"] = abs(hb1.sigma.imag - dns_omega) / dns_omega
        out["omega_err_hb2"] = abs(hb2.sigma.imag - dns_omega) / dns_omega

    if args.hill and hb2.converged:
        import jax.numpy as jnp

        from lsafw_tpu.hill import hill_floquet
        from lsafw_tpu.models.navier_stokes import (
            LinearizedNavierStokesAssembler,
        )

        om = hb2.sigma.imag
        asm = LinearizedNavierStokesAssembler(
            jnp.asarray(hb2.mean), ctx, args.re, bcs, mesh)
        A, M = (m.to_scipy() for m in asm.assemble_eigensystem())
        t0 = time.time()
        hl = hill_floquet(
            ctx, A, M, [hb2.amplitude * hb2.mode, hb2.q2], om,
            n_blocks=3, num=12,
            bc_mask=np.asarray(bcs.dirichlet_mask, bool))
        t_hill = time.time() - t0
        lead = sorted(hl.exponents, key=lambda s: -s.real)[:4]
        out["hill"] = {
            "exponents": [[s.real, s.imag] for s in lead],
            "multipliers_abs": sorted(
                np.abs(hl.multipliers), reverse=True)[:4],
            "trivial_error": float(min(abs(s) for s in hl.exponents)),
            "seconds": t_hill,
            "note": (
                "Floquet exponents of the HB2 cycle (frequency "
                "domain).  The trivial (phase) exponent must sit at 0 "
                "up to the HB truncation; compare |mu| with the "
                "time-domain monodromy around the DNS cycle, "
                "doc/floquet_re60_small.json: subdominant |mu| = 0.802."),
        }
    print(json.dumps(out, indent=1))
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
