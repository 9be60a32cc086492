"""Cylinder flow: sigma(Re) table against the literature targets.

Counterpart of the reference's flagship workflow
(``.examples/assembler.py`` + ``.examples/eigenvalues.py``): per
Reynolds number, solve the baseflow, assemble the linearized
eigensystem and find the leading eigenvalue by shift-invert at the
literature target (DOI 10.1115/1.4042737; table in BASELINE.md).
Unlike the reference there is no real/complex build hand-off — one
process does everything.

Usage:
    python examples/cylinder_stability.py [--full] [--re 40 90 5]
        [--platform cpu]

``--full`` uses the reference's production geometry
(``config_files/2D/cylinder/geometry.toml``, ~150k DOFs); the default
is the reduced domain (fast, sigma shifted slightly by truncation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# Literature targets (shift-invert shifts), Re = 40..90 step 5
# (parity: ``.examples/eigenvalues.py:36-49``)
TARGETS = {
    40: -0.03 + 0.7197388769374216j,
    45: 0.7316769290210628j,
    50: 0.018 + 0.7379601143282424j,
    55: 0.03 + 0.742986662573986j,
    60: 0.05 + 0.744243299635422j,
    65: 0.061 + 0.7461282552275759j,
    70: 0.072 + 0.7461282552275759j,
    75: 0.085 + 0.744557458900781j,
    80: 0.09 + 0.742986662573986j,
    85: 0.1 + 0.7398450699203962j,
    90: 0.115 + 0.7351326809400116j,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="production geometry")
    ap.add_argument("--re", nargs=3, type=float, default=(40, 60, 10),
                    metavar=("START", "STOP", "STEP"))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])

    from lsafw_tpu.config import load_bc_config, load_cylinder_flow_config, load_facet_config
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver, compute_drag, compute_recirculation_length
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
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
    print(mesh.summary(), file=sys.stderr)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs.toml"))
    bcs_pert = define_bcs(mesh, spaces, load_bc_config(cfg_dir / "bcs_perturbation.toml"))
    ctx = AssemblyContext.build(spaces)
    print(f"setup {time.time()-t0:.1f}s, {spaces.num_dofs} DOFs", file=sys.stderr)

    # device paths by default on TPU: banded Newton inner solves and the
    # banded fused shift-invert (the band plan is shared across the whole
    # Re sweep — one RCM/plan, one compiled factorization)
    on_tpu = jax.default_backend() == "tpu"
    lin = "banded" if on_tpu else "lu"
    results = []
    w = None
    v_eig = None
    re_values = np.arange(args.re[0], args.re[1] + 0.5 * args.re[2], args.re[2])
    for re in re_values:
        t0 = time.time()
        solver = BaseFlowSolver(ctx, mesh, bcs, re=float(re))
        if w is not None:
            solver._initial_guess = w  # continuation across the Re sweep
        w = solver.solve(ramp=(w is None), steps=4, tol=1e-9, max_it=40,
                         linear_solver=lin)
        L = compute_recirculation_length(ctx, w)
        cd = 2.0 * compute_drag(ctx, mesh, w, re=float(re), cylinder_marker=5)
        target = TARGETS.get(int(re), 0.03 + 0.74j)
        asm = LinearizedNavierStokesAssembler(w, ctx, float(re), bcs_pert, mesh)
        A, M = asm.assemble_eigensystem()
        es = EigenSolver(A, M, EigensolverConfig(num_eig=3, atol=1e-9, ncv=40))
        es.set_st_type(STType.SINVERT)
        es.set_target(target)
        if on_tpu:
            A_el, M_el, dofs = asm.element_matrices()
            es.set_st_pc_type("banded")
            es.set_elements(ctx, A_el, M_el, np.asarray(bcs_pert.dirichlet_mask),
                            dofs=dofs)
        if v_eig is not None:
            # continuation warm start: the previous Re's eigenvector
            es.set_initial_vector(v_eig)
        pairs = es.solve()
        sigma, v_eig = max(pairs, key=lambda p: p[0].real)
        dt = time.time() - t0
        row = {
            "re": float(re),
            "sigma_re": sigma.real, "sigma_im": sigma.imag,
            "target_re": target.real, "target_im": target.imag,
            "recirculation_length": L, "cd": cd, "seconds": dt,
        }
        results.append(row)
        print(
            f"Re={re:5.1f}: sigma = {sigma.real:+.4f} {sigma.imag:+.4f}j "
            f"(target {target.real:+.3f} {target.imag:+.3f}j)  "
            f"L={L:.2f} Cd={cd:.3f}  [{dt:.1f}s]"
        )
        if args.out:  # incremental: a timeout keeps the finished points
            _atomic_write_json(args.out, results)
    return 0


def _atomic_write_json(path: Path, obj) -> None:
    """Write-then-rename so a kill mid-write never truncates ``path``."""
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(obj, indent=1))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


if __name__ == "__main__":
    sys.exit(main())
