"""NAFEMS FV52 steel-plate eigenmodes.

Counterpart of ``Elasticity/.example.py``: 10 x 10 x 1 simply-supported
plate, E = 200 GPa, nu = 0.3, rho = 8000; reports computed vs NAFEMS
frequencies and the density sensitivity of the first mode
(analytical / assembled / finite-difference cross-check).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

EXPECTED = (45.897, 109.440, 109.440, 167.890, 193.590, 206.190, 206.190)


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    from lsafw_tpu.meshing.mesh import CellType, box_mesh
    from lsafw_tpu.meshing.tags import mark_boundary_facets
    from lsafw_tpu.models.elasticity import (
        AxisNormalBc,
        ElasticityEigenAssembler,
        compute_density_sensitivity_fd,
        define_bcs,
        define_space,
        process_modes,
        process_sensitivity,
    )
    from lsafw_tpu.solver.eigen import EigenSolver, EigensolverConfig, STType
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    L, H = 10.0, 1.0
    E, NU, RHO = 200e9, 0.3, 8000.0
    mesh = box_mesh((0, 0, 0), (L, L, H), 12, 12, 2, CellType.TETRAHEDRON)

    def marker(x):
        out = np.full(x.shape[0], 9, dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], L)] = 2
        out[np.isclose(x[:, 1], 0.0)] = 3
        out[np.isclose(x[:, 1], L)] = 4
        return out

    mark_boundary_facets(mesh, marker)
    space = define_space(mesh, degree=2)
    bcs = define_bcs(
        mesh, space,
        axis_normal=(AxisNormalBc(tags=(1, 2), axis=2), AxisNormalBc(tags=(3, 4), axis=2)),
    )
    asm = ElasticityEigenAssembler(
        space, young_modulus=E, poisson_ratio=NU, density=RHO, bcs=bcs
    )
    M, K = asm.assemble_eigensystem()
    es = EigenSolver(K, M, EigensolverConfig(num_eig=12, atol=1e-9, ncv=48))
    es.set_st_type(STType.SINVERT)
    es.set_target((2 * math.pi * 40.0) ** 2)
    modes = process_modes(es.solve(), K, M, skip_below_hz=0.2)

    print("\nEigenfrequency comparison (first %d modes)" % min(7, len(modes)))
    for k, m in enumerate(modes[:7]):
        ref = EXPECTED[k]
        print(
            f"#{k+1:02d}  f_comp={m.fn:8.3f} Hz | f_ref={ref:8.3f} Hz | "
            f"rel_err={100.0*(m.fn-ref)/ref:+6.2f}%  (mass_chk={m.mass_chk})"
        )

    m0 = modes[0]
    lam0 = m0.wn**2
    d_lam = asm.compute_sensitivity(m0.function, lam0, param="rho", dparam=1.0)
    print(f"\nd f1/d rho (assembled):  {process_sensitivity(d_lam, m0.fn):.3e} Hz per kg/m^3")
    print(f"d f1/d rho (analytical): {process_sensitivity(-lam0 / RHO, m0.fn):.3e}")

    def lam_of_rho(rho):
        a = ElasticityEigenAssembler(
            space, young_modulus=E, poisson_ratio=NU, density=rho, bcs=bcs
        )
        Mm, Kk = a.assemble_eigensystem()
        e = EigenSolver(Kk, Mm, EigensolverConfig(num_eig=2, atol=1e-9, ncv=20))
        e.set_st_type(STType.SINVERT)
        e.set_target((2 * math.pi * 40.0) ** 2 * RHO / rho)
        md = process_modes(e.solve(), Kk, Mm, skip_below_hz=0.2)
        return md[0].wn ** 2

    fd = compute_density_sensitivity_fd(lam_of_rho, RHO, step=40.0)
    print(f"d f1/d rho (FD):         {process_sensitivity(fd, m0.fn):.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
