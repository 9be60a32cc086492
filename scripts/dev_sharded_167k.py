"""Sharded shift-invert eigensolve at PRODUCTION scale (167k DOFs) on
the 8-virtual-device CPU mesh (VERDICT r4 item 7: nothing sharded had
run past 43k; segment-count/bandwidth scaling of the SPIKE reduced
interface system was untested).

Consumes the production Re=50 baseflow cached by ``dev_500k.py``
(/tmp/w167k_re50.npy) and its TPU-computed eigenpair (/tmp/eig_prod.npz)
as the single-device reference: the sharded sigma must match to <=1e-8.
Logs the SPIKE reduced-system size (2bw x 2bw blocks, D-1 boundaries)
and its block conditioning.

Run (any host):  timeout 14400 python scripts/dev_sharded_167k.py
(re-execs itself with JAX_PLATFORMS=cpu and 8 virtual devices)
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

N_DEV = int(os.environ.get("SHARDED167K_DEVICES", "8"))


def main() -> None:
    import numpy as np
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lsafw_tpu.config import (
        load_bc_config, load_cylinder_flow_config, load_facet_config,
    )
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.parallel.sharded import sharded_si_eigensolve
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    assert jax.default_backend() == "cpu" and len(jax.devices()) >= N_DEV

    cfg_dir = os.path.join(HERE, "..", "config_files", "2D", "cylinder")
    geo = load_cylinder_flow_config(os.path.join(cfg_dir, "geometry.toml"))
    marker_fn = load_facet_config(os.path.join(cfg_dir, "facets.toml"))
    RE = 50.0
    TARGET = 0.018 + 0.7379601143282424j

    t0 = time.time()
    mesh_g = cylinder_flow_mesh(geo)
    mark_boundary_facets(mesh_g, marker_fn)
    spaces = define_spaces(mesh_g)
    bcs_pert = define_bcs(
        mesh_g, spaces,
        load_bc_config(os.path.join(cfg_dir, "bcs_perturbation.toml")))
    ctx = AssemblyContext.build(spaces)
    n = spaces.num_dofs
    print(f"setup: {n} DOFs ({time.time()-t0:.0f}s)", flush=True)

    w = np.load("/tmp/w167k_re50.npy")
    assert w.shape[0] == n, (w.shape, n)
    ref = np.load("/tmp/eig_prod.npz")
    sigma_ref = complex(float(ref["sig_re"]), float(ref["sig_im"]))
    print(f"single-device reference sigma = {sigma_ref:.10f}", flush=True)

    t0 = time.time()
    asm = LinearizedNavierStokesAssembler(
        jnp.asarray(w), ctx, RE, bcs_pert, mesh_g)
    A, M = asm.assemble_eigensystem()
    print(f"assemble: {time.time()-t0:.0f}s (nnz={A.pattern.nnz})", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]), ("dof",))
    t0 = time.time()
    res = sharded_si_eigensolve(
        A, M, TARGET, mesh, nev=1, ncv=16, tol=1e-9, spike="exact")
    t_eig = time.time() - t0
    assert res.nconv >= 1, res
    k = int(np.argmax(res.eigenvalues[: res.nconv].real))
    sigma = complex(res.eigenvalues[k])
    v = np.asarray(res.eigenvectors[k])
    dsig = abs(sigma - sigma_ref)
    # residual against the true (host) operator
    As, Ms = A.to_scipy(), M.to_scipy()
    r = As @ v - sigma * (Ms @ v)
    resid = float(np.linalg.norm(r) / max(np.linalg.norm(As @ v), 1e-300))
    print(
        f"RESULT sharded sigma = {sigma.real:+.9f}{sigma.imag:+.9f}j "
        f"|dsigma| = {dsig:.2e} resid = {resid:.2e} eigen = {t_eig:.0f}s",
        flush=True,
    )
    out = dict(n=n, n_devices=N_DEV, sigma_re=sigma.real, sigma_im=sigma.imag,
               sigma_ref_re=sigma_ref.real, sigma_ref_im=sigma_ref.imag,
               dsigma=dsig, resid=resid, t_eigen=t_eig)
    with open(os.path.join(HERE, "data", "sharded_pipeline_167k.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    assert dsig <= 1e-8, f"|dsigma| = {dsig:.2e} > 1e-8"


if __name__ == "__main__":
    if os.environ.get("_SHARDED167K_IMPL"):
        main()
        sys.exit(0)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU client
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["JAX_PLATFORMS"] = "cpu"
    # raise the collective-rendezvous timeouts: 8 virtual devices
    # timeshare ONE core here and the reduced-SPIKE build runs for
    # hours — the default 40 s termination killed the first 167k run
    # at its first post-build all-gather
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_DEV} "
        "--xla_cpu_collective_call_terminate_timeout_seconds=7200 "
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300 "
        + env.get("XLA_FLAGS", ""))
    env["_SHARDED167K_IMPL"] = "1"
    env["PYTHONPATH"] = (os.path.join(HERE, "..") + os.pathsep
                         + env.get("PYTHONPATH", ""))
    sys.exit(subprocess.run([sys.executable, os.path.abspath(__file__)],
                            env=env).returncode)
