"""Mean-flow linear analysis of the saturated shedding cycle (RZIF).

Barkley (2006): linearizing about the TIME-MEAN of the saturated
vortex-shedding cycle — not the unstable fixed point — yields an
eigenvalue that is (i) marginally stable (sigma_r ~ 0) and (ii)
oscillating at the SATURATED shedding frequency, while the fixed-point
linearization gives the (different) linear Hopf frequency.  This
"real zero imaginary frequency" (RZIF) property is the foundation of
mean-flow/self-consistent modeling; reproducing it exercises the DNS,
the averaging, and the eigensolver against a famous literature result.

Pipeline: baseflow -> eigenmode kick -> nonlinear march to saturation
-> average one period -> linearized eigensolve about the mean.

Usage:
    python examples/meanflow_eigen.py [--re 60] [--dt 0.2] [--t-sat 350]
        [--platform cpu] [--out f.json]
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
    lin_solver = "banded" if on_tpu else "lu"
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=True, steps=4, tol=1e-10, max_it=40, linear_solver=lin_solver)

    def eig_about(state, target):
        asm = LinearizedNavierStokesAssembler(
            jnp.asarray(state), ctx, args.re, bcs_pert, mesh)
        A, M = asm.assemble_eigensystem()
        es = EigenSolver(A, M, EigensolverConfig(num_eig=2, atol=1e-8, ncv=30))
        es.set_st_type(STType.SINVERT)
        es.set_target(target)
        if on_tpu:
            A_el, M_el, dofs = asm.element_matrices()
            es.set_st_pc_type("banded")
            es.set_elements(ctx, A_el, M_el,
                            np.asarray(bcs_pert.dirichlet_mask), dofs=dofs)
        pairs = es.solve()
        return max(pairs, key=lambda p: p[0].real)

    sigma_base, vhat = eig_about(np.asarray(w), 0.05 + 0.75j)
    print(f"fixed-point sigma = {sigma_base.real:+.4f} {sigma_base.imag:+.4f}j",
          file=sys.stderr)
    v = np.real(vhat)
    v /= np.linalg.norm(v)

    us = UnsteadySolver(ctx, mesh, bcs, args.re, method=lin_solver,
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
    omega_sat = dominant_frequency(res.t[-2 * q:], sig[-2 * q:])
    period = 2.0 * np.pi / omega_sat

    # time-mean over one period (trapezoid over n_avg snapshots)
    n_avg = 64
    dt_f = period / n_avg
    mean = np.zeros(spaces.num_dofs)
    qstate = jnp.asarray(res.q)
    for _ in range(n_avg):
        mean += np.asarray(qstate)
        qstate, _ = us.step(qstate, dt_f)
    mean /= n_avg

    sigma_mean, _ = eig_about(mean, 0.0 + 1.05 * omega_sat * 1j)
    out = {
        "re": args.re, "dofs": spaces.num_dofs,
        "sigma_baseflow": [sigma_base.real, sigma_base.imag],
        "omega_saturated": omega_sat,
        "sigma_meanflow": [sigma_mean.real, sigma_mean.imag],
        "rzif_marginal": abs(sigma_mean.real),
        "rzif_freq_error": abs(sigma_mean.imag - omega_sat) / omega_sat,
    }
    print(json.dumps(out, indent=1))
    print(
        f"RZIF: mean-flow sigma = {sigma_mean.real:+.4f} {sigma_mean.imag:+.4f}j"
        f" vs saturated omega {omega_sat:.4f} "
        f"(freq err {out['rzif_freq_error']*100:.1f}%, "
        f"marginality |sigma_r| = {abs(sigma_mean.real):.4f} "
        f"vs fixed-point {sigma_base.real:+.4f})",
        file=sys.stderr,
    )
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
