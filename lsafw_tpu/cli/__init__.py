"""Unified command-line interface.

One coherent CLI replacing the reference's three drifted per-package
CLIs (``Meshing/cli.py``, ``FEM/cli.py``, ``Solver/cli.py`` — whose
stale imports/signatures are catalogued in SURVEY.md section 2.4); every
subcommand here calls the same library APIs the tests exercise.

Subcommands:
  mesh        generate/import a mesh, tag boundaries, export (Meshing/cli.py:156)
  baseflow    steady NS solve + diagnostics + export (Solver/cli.py:57)
  assemble    baseflow + linearized eigensystem -> .mtx (FEM/cli.py:122, Solver/cli.py:96)
  eigen       shift-invert eigensolve on (A, M) (Solver/cli.py:158)
  sensitivity adjoint d sigma/d Re + wavemaker (reference .examples/sensitivity.py)
  resolvent   optimal harmonic forcing gains sigma_1(omega) (beyond the reference)
  transient   optimal transient energy growth G(T) (beyond the reference)
  scm         self-consistent mean-flow model (beyond the reference)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from lsafw_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)


def _build_case(args):
    """Shared mesh -> spaces -> bcs construction for solver commands."""
    from lsafw_tpu.config import (
        load_bc_config,
        load_cylinder_flow_config,
        load_facet_config,
        load_step_flow_config,
    )
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing import generate_mesh, mark_boundary_facets
    from lsafw_tpu.meshing.mesh import Shape

    if getattr(args, "from_file", None):
        # mesh import path (parity: python -m Meshing import,
        # /root/reference/Meshing/cli.py:106-121)
        from lsafw_tpu.meshing.io import from_file

        mesh = from_file(args.from_file)
    else:
        shape = Shape.from_string(args.shape)
        kw = {}
        if args.geometry_config:
            if shape is Shape.CYLINDER_FLOW:
                kw["config"] = load_cylinder_flow_config(args.geometry_config)
            elif shape is Shape.STEP_FLOW:
                kw["config"] = load_step_flow_config(args.geometry_config)
        if args.n:
            kw.update(dict(zip(("nx", "ny", "nz"), args.n)))
            if shape is Shape.UNIT_INTERVAL:
                kw = {"n": args.n[0]}
        mesh = generate_mesh(shape, **kw)
    if args.facet_config:
        mark_boundary_facets(mesh, load_facet_config(args.facet_config))
    spaces = define_spaces(mesh, args.space_type)
    bcs = None
    if args.bc_config:
        bcs = define_bcs(mesh, spaces, load_bc_config(args.bc_config))
    ctx = AssemblyContext.build(spaces)
    return mesh, spaces, bcs, ctx


def _add_case_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--shape", default="cylinder_flow")
    p.add_argument("--n", type=int, nargs="*", default=None, help="structured mesh divisions")
    p.add_argument("--geometry-config", type=Path, default=None)
    p.add_argument("--facet-config", type=Path, default=None)
    p.add_argument("--bc-config", type=Path, default=None)
    p.add_argument("--space-type", default="taylor_hood")


def _export_mesh_file(mesh, path: Path) -> None:
    """Write a mesh to ``.msh`` or ``.xdmf`` by extension (parity:
    ``_export_mesh``, ``/root/reference/Meshing/cli.py:38-59``)."""
    path = Path(path)
    if path.suffix == ".msh":
        from lsafw_tpu.meshing.io import write_msh

        write_msh(mesh, path)
    elif path.suffix == ".xdmf":
        from lsafw_tpu.io.xdmf import write_xdmf

        write_xdmf(path, mesh)
    else:
        raise SystemExit(f"unsupported mesh export format: {path.suffix}")
    logger.info("Mesh exported to %s", path)


def _cmd_mesh(args) -> int:
    from lsafw_tpu.utils.cache import CacheStore

    mesh, spaces, bcs, ctx = _build_case(args)
    print(mesh.summary())
    if args.outdir:
        CacheStore(args.outdir).save_mesh(args.key or "mesh", mesh)
    if args.export:
        _export_mesh_file(mesh, args.export)
    if args.plot:
        from lsafw_tpu.plot import plot_mesh

        plot_mesh(mesh, path=args.plot)
    return 0


def _cmd_benchmark(args) -> int:
    """Generate a predefined CFD benchmark geometry (parity:
    ``python -m Meshing benchmark``,
    ``/root/reference/Meshing/cli.py:124-153``)."""
    from lsafw_tpu.config import (
        load_cylinder_flow_config,
        load_facet_config,
        load_step_flow_config,
    )
    from lsafw_tpu.meshing import generate_mesh, mark_boundary_facets
    from lsafw_tpu.meshing.mesh import Shape

    shape = Shape.from_string(args.geometry)
    if shape is Shape.CYLINDER_FLOW:
        cfg = load_cylinder_flow_config(args.config)
    elif shape is Shape.STEP_FLOW:
        cfg = load_step_flow_config(args.config)
    else:
        raise SystemExit(f"unsupported benchmark geometry: {args.geometry}")
    mesh = generate_mesh(shape, config=cfg)
    if args.facet_config:
        mark_boundary_facets(mesh, load_facet_config(args.facet_config))
    print(mesh.summary())
    if args.export:
        _export_mesh_file(mesh, args.export)
    if args.plot:
        from lsafw_tpu.plot import plot_mesh

        plot_mesh(mesh, path=args.plot)
    return 0


def _cmd_baseflow(args) -> int:
    from lsafw_tpu.io import export_function
    from lsafw_tpu.solver.baseflow import BaseFlowSolver, compute_recirculation_length

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("baseflow requires --bc-config")
    solver = BaseFlowSolver(ctx, mesh, bcs, re=args.re)
    w = solver.solve(ramp=args.ramp, steps=args.steps, tol=args.tol, max_it=args.max_it,
                     damping_factor=args.damping)
    try:
        L = compute_recirculation_length(ctx, w)
        logger.info("Recirculation length: %.4f", L)
    except RuntimeError:
        pass
    if args.outdir:
        export_function(w, spaces, args.outdir, name=args.key or "baseflow")
    return 0


def _cmd_assemble(args) -> int:
    from lsafw_tpu.config import load_bc_config
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.io import export_function, export_matrix
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("assemble requires --bc-config")
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=args.ramp, steps=args.steps, tol=args.tol, max_it=args.max_it
    )
    pert_bcs = (
        define_bcs(mesh, spaces, load_bc_config(args.perturbation_bc_config))
        if args.perturbation_bc_config
        else bcs.homogeneous()
    )
    asm = LinearizedNavierStokesAssembler(w, ctx, args.re, pert_bcs, mesh)
    A, M = asm.assemble_eigensystem()
    out = Path(args.outdir or ".")
    export_matrix(A, out / "A.mtx")
    export_matrix(M, out / "M.mtx")
    export_function(w, spaces, out, name="baseflow")
    logger.info("Assembled eigensystem exported to %s (n=%d)", out, A.shape[0])
    return 0


def _cmd_eigen(args) -> int:
    from lsafw_tpu.io import export_eigenvector, import_matrix
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType

    A = import_matrix(Path(args.matdir) / "A.mtx")
    M = import_matrix(Path(args.matdir) / "M.mtx")
    cfg = EigensolverConfig(num_eig=args.num_eig, atol=args.atol, ncv=args.ncv)
    es = EigenSolver(A, M, cfg, check_hermitian=args.check_hermitian)
    if args.target is not None:
        es.set_st_type(STType.SINVERT)
        es.set_target(complex(args.target))
        es.set_st_pc_type(args.si_method)
    pairs = es.solve()
    for i, (lam, vec) in enumerate(pairs):
        logger.info("sigma[%d] = %.6e %+.6e j", i, lam.real, lam.imag)
        if args.outdir:
            export_eigenvector(vec, Path(args.outdir) / f"eigvec_{i}.npz")
    if args.outdir:
        (Path(args.outdir) / "eigenvalues.json").write_text(
            json.dumps([[p[0].real, p[0].imag] for p in pairs])
        )
    return 0


def _cmd_sensitivity(args) -> int:
    from lsafw_tpu.io import export_function
    from lsafw_tpu.sensitivity import EigenSensitivitySolver
    from lsafw_tpu.solver.baseflow import BaseFlowSolver

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("sensitivity requires --bc-config")
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=args.ramp, steps=args.steps, tol=args.tol, max_it=args.max_it
    )
    sens = EigenSensitivitySolver(
        ctx, mesh, bcs, w, args.re,
        target=complex(args.target) if args.target else None,
    )
    d_sigma = sens.evaluate()
    logger.info("d sigma / d Re = %.6e %+.6e j", d_sigma.real, d_sigma.imag)
    if args.wavemaker and args.outdir:
        sw = sens.compute_wavemaker()
        export_function(sw, spaces, args.outdir, name="wavemaker")
    return 0


def _nonmodal_case(args):
    """Shared baseflow + LNS assembly for the non-modal commands."""
    from lsafw_tpu.config import load_bc_config
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("this command requires --bc-config")
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=args.ramp, steps=args.steps, tol=args.tol, max_it=args.max_it
    )
    pert_bcs = (
        define_bcs(mesh, spaces, load_bc_config(args.perturbation_bc_config))
        if args.perturbation_bc_config
        else bcs.homogeneous()
    )
    asm = LinearizedNavierStokesAssembler(w, ctx, args.re, pert_bcs, mesh)
    A, M = asm.assemble_eigensystem()
    return spaces, pert_bcs, A, M


def _cmd_resolvent(args) -> int:
    from lsafw_tpu.resolvent import ResolventSolver

    spaces, pert_bcs, A, M = _nonmodal_case(args)
    rs = ResolventSolver(
        A, M, spaces.num_velocity_dofs, pert_bcs.dirichlet_mask,
        method=args.si_method,
    )
    rows = []
    for m in rs.gain_curve(args.omega, k=args.k):
        rows.append({"omega": m.omega, "gains": m.gains.tolist()})
        logger.info("omega=%.4f: sigma_1 = %.4e", m.omega, m.gains[0])
    if args.outdir:
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        (Path(args.outdir) / "resolvent_gains.json").write_text(
            json.dumps(rows, indent=1))
    return 0


def _cmd_transient(args) -> int:
    from lsafw_tpu.transient import TransientGrowthSolver

    spaces, pert_bcs, A, M = _nonmodal_case(args)
    ts = TransientGrowthSolver(
        A, M, spaces.num_velocity_dofs, pert_bcs.dirichlet_mask,
        method=args.si_method,
    )
    rows = []
    for r in ts.growth_curve(args.horizons, args.n_steps, k=args.k):
        rows.append({"T": r.horizon, "gains": r.gains.tolist()})
        logger.info("T=%.3f: G = %.4e", r.horizon, r.gains[0])
    if args.outdir:
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        (Path(args.outdir) / "transient_gains.json").write_text(
            json.dumps(rows, indent=1))
    return 0


def _cmd_span(args) -> int:
    """sigma(beta) of spanwise-Fourier perturbations of the 2D baseflow
    (quasi-3D stability; see ``lsafw_tpu.span``)."""
    import numpy as np

    from lsafw_tpu.config import load_bc_config
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
    from lsafw_tpu.span import SpanwiseStability

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("span requires --bc-config")
    w = BaseFlowSolver(ctx, mesh, bcs, re=args.re).solve(
        ramp=args.ramp, steps=args.steps, tol=args.tol, max_it=args.max_it
    )
    pert_bcs = (
        define_bcs(mesh, spaces, load_bc_config(args.perturbation_bc_config))
        if args.perturbation_bc_config
        else bcs.homogeneous()
    )
    span = SpanwiseStability(ctx, np.asarray(w), args.re, pert_bcs, mesh)
    target = complex(args.target) if args.target else 0.05 + 0.75j
    v0 = None
    rows = []
    for beta in args.betas:
        A, M = span.assemble_eigensystem(beta)
        es = EigenSolver(A, M, EigensolverConfig(
            num_eig=2, atol=1e-8, ncv=30))
        es.set_st_type(STType.SINVERT)
        es.set_target(target)
        if v0 is not None:
            es.set_initial_vector(v0)
        lam, vec = max(es.solve(), key=lambda p: p[0].real)
        # continue the branch in beta: warm-start vector and target
        v0, target = vec, lam
        rows.append({"beta": beta, "sigma": [lam.real, lam.imag]})
        logger.info("beta = %.3f: sigma = %+.5e %+.5e j",
                    beta, lam.real, lam.imag)
    if args.outdir:
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        (Path(args.outdir) / "span_sigma.json").write_text(
            json.dumps(rows, indent=1))
    return 0


def _cmd_wnl(args) -> int:
    from lsafw_tpu.config import load_bc_config
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.wnl import find_critical_re, weakly_nonlinear

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("wnl requires --bc-config")
    pert_bcs = (
        define_bcs(mesh, spaces, load_bc_config(args.perturbation_bc_config))
        if args.perturbation_bc_config
        else bcs.homogeneous()
    )
    re_c, w_c, sigma_c = find_critical_re(
        ctx, mesh, bcs, pert_bcs, args.re_lo, args.re_hi)
    res = weakly_nonlinear(ctx, mesh, bcs, pert_bcs, re_c, w_c)
    rows = [{"re": re, "amplitude": res.amplitude(re),
             "frequency": res.frequency(re)} for re in (args.res or [])]
    logger.info(
        "WNL: Re_c = %.4f, omega_c = %.5f, lambda' = %+.4e %+.4e j, "
        "mu = %+.4e %+.4e j", re_c, res.omega_c, res.lambda_p.real,
        res.lambda_p.imag, res.mu.real, res.mu.imag)
    for row in rows:
        logger.info("WNL Re=%g: A = %.5f, omega = %.5f",
                    row["re"], row["amplitude"], row["frequency"])
    if args.outdir:
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        (Path(args.outdir) / "wnl.json").write_text(json.dumps({
            "re_c": re_c, "omega_c": res.omega_c,
            "sigma_at_re_c": [sigma_c.real, sigma_c.imag],
            "lambda_prime": [res.lambda_p.real, res.lambda_p.imag],
            "mu": [res.mu.real, res.mu.imag],
            "supercritical": bool(res.mu.real > 0),
            "points": rows,
        }, indent=1))
    return 0


def _cmd_scm(args) -> int:
    import numpy as np

    from lsafw_tpu.scm import SelfConsistentModel, scm_continuation
    from lsafw_tpu.solver.baseflow import BaseFlowSolver
    from lsafw_tpu.config import load_bc_config
    from lsafw_tpu.fem.bcs import define_bcs

    mesh, spaces, bcs, ctx = _build_case(args)
    if bcs is None:
        raise SystemExit("scm requires --bc-config")
    pert_bcs = (
        define_bcs(mesh, spaces, load_bc_config(args.perturbation_bc_config))
        if args.perturbation_bc_config
        else bcs.homogeneous()
    )

    def baseflow_fn(re):
        return np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=re).solve(
            ramp=args.ramp, steps=args.steps, tol=args.tol,
            max_it=args.max_it))

    if args.res:  # Re-continuation up the amplitude curve
        results = scm_continuation(
            ctx, mesh, bcs, pert_bcs, list(args.res), baseflow_fn,
            linear_solver="lu", tol_sigma=args.tol_sigma)
        rows = []
        for re, r in results:
            rows.append({
                "re": re, "amplitude": r.amplitude,
                "sigma": [r.sigma.real, r.sigma.imag],
                "converged": r.converged,
            })
            logger.info(
                "SCM Re=%g: A = %.5f, sigma = %+.5e %+.5e j (converged=%s)",
                re, r.amplitude, r.sigma.real, r.sigma.imag, r.converged)
        if args.outdir:
            Path(args.outdir).mkdir(parents=True, exist_ok=True)
            (Path(args.outdir) / "scm_curve.json").write_text(
                json.dumps(rows, indent=1))
        return 0 if all(r["converged"] for r in rows) else 1

    scm = SelfConsistentModel(ctx, mesh, bcs, pert_bcs, args.re,
                              linear_solver="lu")
    res = scm.solve(baseflow_fn(args.re), A0=args.a0,
                    tol_sigma=args.tol_sigma)
    if not res.converged and res.amplitude > 0:
        # wall-limited alternation: finish with the coupled Newton
        A0 = res.amplitude_sl or res.amplitude
        cres = scm.solve_coupled(res.mean, A0 * res.mode,
                                 abs(res.sigma.imag))
        if cres.converged:
            res = cres
    logger.info(
        "SCM: A = %.5f, sigma = %+.5e %+.5e j (converged=%s)",
        res.amplitude, res.sigma.real, res.sigma.imag, res.converged,
    )
    if args.outdir:
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        (Path(args.outdir) / "scm.json").write_text(json.dumps({
            "amplitude": res.amplitude,
            "sigma": [res.sigma.real, res.sigma.imag],
            "converged": res.converged,
            "history": res.history,
        }, indent=1))
    return 0 if res.converged else 1


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="lsafw_tpu", description="TPU-native global linear stability analysis"
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument(
        "--platform",
        choices=("auto", "cpu", "tpu"),
        default="auto",
        help="pin the JAX default device (cpu is useful for small problems "
        "where per-kernel compile latency dominates)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="initialize the multi-controller runtime (one process per "
        "host on a TPU pod slice — the mpirun -n analog; see "
        "parallel/launch.py)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_mesh = sub.add_parser("mesh", help="generate or import and tag a mesh")
    _add_case_args(p_mesh)
    p_mesh.add_argument(
        "--from-file", type=Path, default=None,
        help="import a .msh/.xdmf mesh instead of generating one",
    )
    p_mesh.add_argument("--export", type=Path, default=None,
                        help="write the mesh to .msh or .xdmf")
    p_mesh.add_argument("--plot", type=Path, default=None,
                        help="save a mesh plot image")
    p_mesh.add_argument("--outdir", type=Path, default=None)
    p_mesh.add_argument("--key", default=None)
    p_mesh.set_defaults(fn=_cmd_mesh)

    p_bench = sub.add_parser(
        "benchmark", help="generate a predefined CFD benchmark geometry"
    )
    p_bench.add_argument("--geometry", default="cylinder_flow",
                         choices=("cylinder_flow", "step_flow"))
    p_bench.add_argument("--config", type=Path, required=True)
    p_bench.add_argument("--facet-config", type=Path, default=None)
    p_bench.add_argument("--export", type=Path, default=None)
    p_bench.add_argument("--plot", type=Path, default=None)
    p_bench.set_defaults(fn=_cmd_benchmark)

    def _solver_args(p):
        _add_case_args(p)
        p.add_argument("--re", type=float, required=True)
        p.add_argument("--ramp", action="store_true")
        p.add_argument("--steps", type=int, default=3)
        p.add_argument("--tol", type=float, default=1e-8)
        p.add_argument("--max-it", type=int, default=50)
        p.add_argument("--damping", type=float, default=1.0)
        p.add_argument("--outdir", type=Path, default=None)
        p.add_argument("--key", default=None)

    p_bf = sub.add_parser("baseflow", help="steady Navier-Stokes solve")
    _solver_args(p_bf)
    p_bf.set_defaults(fn=_cmd_baseflow)

    p_asm = sub.add_parser("assemble", help="assemble linearized eigensystem")
    _solver_args(p_asm)
    p_asm.add_argument("--perturbation-bc-config", type=Path, default=None)
    p_asm.set_defaults(fn=_cmd_assemble)

    p_eig = sub.add_parser("eigen", help="solve eigenproblem from .mtx matrices")
    p_eig.add_argument("--matdir", type=Path, required=True)
    p_eig.add_argument("--target", default=None)
    p_eig.add_argument("--num-eig", type=int, default=5)
    p_eig.add_argument("--atol", type=float, default=1e-8)
    p_eig.add_argument("--ncv", type=int, default=80)
    p_eig.add_argument("--check-hermitian", action="store_true")
    p_eig.add_argument(
        "--si-method", choices=("lu", "banded", "gmres"), default="lu",
        help="shift-invert inner solve: host LU, device blocked band LU "
        "+ refinement (TPU direct path), or device GMRES",
    )
    p_eig.add_argument("--outdir", type=Path, default=None)
    p_eig.set_defaults(fn=_cmd_eigen)

    p_sens = sub.add_parser("sensitivity", help="adjoint eigenvalue sensitivity")
    _solver_args(p_sens)
    p_sens.add_argument("--target", default=None)
    p_sens.add_argument("--wavemaker", action="store_true")
    p_sens.set_defaults(fn=_cmd_sensitivity)

    p_res = sub.add_parser(
        "resolvent", help="optimal harmonic forcing gains sigma_1(omega)"
    )
    _solver_args(p_res)
    p_res.add_argument("--perturbation-bc-config", type=Path, default=None)
    p_res.add_argument("--omega", nargs="+", type=float, required=True)
    p_res.add_argument("--k", type=int, default=1)
    p_res.add_argument("--si-method", choices=("lu", "banded"), default="lu")
    p_res.set_defaults(fn=_cmd_resolvent)

    p_tg = sub.add_parser(
        "transient", help="optimal transient energy growth G(T)"
    )
    _solver_args(p_tg)
    p_tg.add_argument("--perturbation-bc-config", type=Path, default=None)
    p_tg.add_argument("--horizons", nargs="+", type=float, required=True)
    p_tg.add_argument("--n-steps", type=int, default=32)
    p_tg.add_argument("--k", type=int, default=1)
    p_tg.add_argument("--si-method", choices=("lu", "banded"), default="lu")
    p_tg.set_defaults(fn=_cmd_transient)

    p_span = sub.add_parser(
        "span", help="quasi-3D spanwise-Fourier stability of a 2D baseflow"
    )
    _solver_args(p_span)
    p_span.add_argument("--perturbation-bc-config", type=Path, default=None)
    p_span.add_argument("--betas", nargs="+", type=float, required=True)
    p_span.add_argument("--target", default=None)
    p_span.set_defaults(fn=_cmd_span)

    p_scm = sub.add_parser(
        "scm", help="self-consistent mean-flow model (limit cycle w/o DNS)"
    )
    _solver_args(p_scm)
    p_scm.add_argument("--perturbation-bc-config", type=Path, default=None)
    p_scm.add_argument("--a0", type=float, default=0.1)
    p_scm.add_argument("--tol-sigma", type=float, default=2e-4)
    p_scm.add_argument(
        "--res", nargs="+", type=float, default=None,
        help="Re-continuation: solve at each Re ascending, warm-starting "
             "from the previous converged state (--re is ignored)")
    p_scm.set_defaults(fn=_cmd_scm)

    p_wnl = sub.add_parser(
        "wnl", help="weakly nonlinear Stuart-Landau expansion at the "
                    "Hopf point"
    )
    _solver_args(p_wnl)
    p_wnl.add_argument("--perturbation-bc-config", type=Path, default=None)
    p_wnl.add_argument("--re-lo", type=float, default=40.0,
                       help="lower bracket of the onset")
    p_wnl.add_argument("--re-hi", type=float, default=55.0,
                       help="upper bracket of the onset")
    p_wnl.add_argument(
        "--res", nargs="+", type=float, default=None,
        help="Reynolds numbers to tabulate amplitude/frequency "
             "predictions at")
    p_wnl.set_defaults(fn=_cmd_wnl)

    args = parser.parse_args(argv)
    setup_logging(verbose=args.verbose)
    # x64 must be on before any tracing: stability analysis needs 1e-8
    # eigenvalue accuracy (f64 is emulated but correct on TPU)
    import jax

    jax.config.update("jax_enable_x64", True)
    if args.platform != "auto":
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])
    if args.distributed:
        from lsafw_tpu.parallel import initialize_distributed

        initialize_distributed()
    try:
        return args.fn(args)
    except Exception as exc:  # fail-fast with exit 1 (parity: Solver/cli.py:348)
        logger.error("%s", exc)
        return 1


if __name__ == "__main__":
    sys.exit(main())
