"""Stage-instrumented 3D pipeline for the performance harness.

Counterpart of ``.examples/cube.py:31-79``: unit-cube Taylor-Hood
baseflow + assembly with per-stage ``perf_counter_ns`` timers, emitting
one JSON line of stage timings on stdout — consumed by
``tests/performance/test_scaling.py`` (the reference runs this under
``mpirun -n {1..12}``; here the scaling axis is the virtual device
count).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    timings: dict[str, float] = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter_ns()

            def __exit__(self, *a):
                timings[name] = (time.perf_counter_ns() - self.t0) / 1e9

        return _T()

    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from lsafw_tpu.config import BoundaryConditionsConfig
    from lsafw_tpu.fem.assembly import AssemblyContext
    from lsafw_tpu.fem.bcs import define_bcs
    from lsafw_tpu.fem.spaces import define_spaces
    from lsafw_tpu.meshing.mesh import unit_cube
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver

    n = int(os.environ.get("CUBE_N", "8"))
    with stage("mesh"):
        mesh = unit_cube(n)
        mark_boundary_facets(mesh, lambda x: np.where(
            np.isclose(x[:, 2], 1.0), 2, 1).astype(np.int32))
    with stage("spaces"):
        spaces = define_spaces(mesh)
        ctx = AssemblyContext.build(spaces)
    with stage("bcs"):
        bcs = define_bcs(mesh, spaces, [
            BoundaryConditionsConfig(marker=1, type="dirichlet_velocity", value=(0.0, 0.0, 0.0)),
            BoundaryConditionsConfig(marker=2, type="dirichlet_velocity", value=(1.0, 0.0, 0.0)),
        ])
        pin = spaces.dofs_p[0]
        bcs.dirichlet_mask[pin] = True
    with stage("baseflow"):
        w = BaseFlowSolver(ctx, mesh, bcs, re=50.0).solve(ramp=True, steps=2, tol=1e-8, max_it=25)
    with stage("assembly"):
        asm = LinearizedNavierStokesAssembler(w, ctx, 50.0, bcs.homogeneous(), mesh)
        A, M = asm.assemble_eigensystem()
        float(abs(A.data).sum() + abs(M.data).sum())  # force execution

    timings["total"] = sum(timings.values())
    timings["n_dofs"] = spaces.num_dofs
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    sys.exit(main())
