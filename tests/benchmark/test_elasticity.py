"""Elasticity EVP validation.

NAFEMS FV52 simply-supported thick plate (the reference's validation,
``Elasticity/.example.py:33-46``): 10 x 10 x 1 plate, E = 200 GPa,
nu = 0.3, rho = 8000, z-displacement pinned on the four side faces;
reference frequencies 45.897, 109.44 (x2), 167.89, 193.59, 206.19 (x2) Hz.

Here on a tetrahedral (Kuhn-subdivided) box at reduced resolution —
P1 tets are stiffer than the reference's Q1 hexes, so tolerances are
mesh-accuracy-bound; sensitivities are validated analytically and by
finite differences (``Elasticity/utils.py:128-182``).
"""

import math

import numpy as np
import pytest

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

L, H = 10.0, 1.0
E, NU, RHO = 200e9, 0.3, 8000.0
NAFEMS_FREQS = (45.897, 109.440, 109.440, 167.890, 193.590, 206.190, 206.190)


def build_plate(n=10, nz=2, degree=2):
    """P2 tetrahedra (P1 tets shear-lock on this bending-dominated
    plate; the reference's Q1 hexes need 32x32x6 for similar accuracy)."""
    mesh = box_mesh((0, 0, 0), (L, L, H), n, n, nz, CellType.TETRAHEDRON)

    def marker(x):
        out = np.full(x.shape[0], 9, dtype=np.int32)
        out[np.isclose(x[:, 0], 0.0)] = 1
        out[np.isclose(x[:, 0], L)] = 2
        out[np.isclose(x[:, 1], 0.0)] = 3
        out[np.isclose(x[:, 1], L)] = 4
        return out

    mark_boundary_facets(mesh, marker)
    space = define_space(mesh, degree=degree)
    bcs = define_bcs(
        mesh, space,
        axis_normal=(
            AxisNormalBc(tags=(1, 2), axis=2, value=0.0),
            AxisNormalBc(tags=(3, 4), axis=2, value=0.0),
        ),
    )
    return mesh, space, bcs


def solve_modes(assembler, num=8):
    M, K = assembler.assemble_eigensystem()
    es = EigenSolver(K, M, EigensolverConfig(num_eig=num, atol=1e-9, ncv=40))
    es.set_st_type(STType.SINVERT)
    es.set_target((2 * math.pi * 40.0) ** 2)  # around the first NAFEMS mode
    pairs = es.solve()
    return process_modes(pairs, K, M, skip_below_hz=0.2), K, M


@pytest.mark.slow
def test_nafems_plate_frequencies():
    mesh, space, bcs = build_plate(10, 2)
    asm = ElasticityEigenAssembler(
        space, young_modulus=E, poisson_ratio=NU, density=RHO, bcs=bcs
    )
    modes, K, M = solve_modes(asm, num=12)
    assert len(modes) >= 7, [m.fn for m in modes]
    freqs = np.array([m.fn for m in modes[:7]])
    ref = np.array(NAFEMS_FREQS)
    rel = np.abs(freqs - ref) / ref
    # NAFEMS gate stays 5%: the refinement ladder
    # (scripts/dev_nafems_study.py -> scripts/data/nafems_study.json)
    # shows the CONVERGED 3D-elasticity values sit 1.3-3.8% below the
    # plate-theory-era NAFEMS targets on the bending modes (Richardson
    # f_inf = 44.17, 107.31 x2, 163.07, 193.64, 203.1, 203.4 Hz; the
    # thickness-dominated mode 5 agrees to 0.03%) — the gap is a
    # modeling difference, not discretization error, and the
    # reference's Q1 32x32x6 hexes land nearer the targets through
    # shear-locking stiffness cancelling the 3D softening.
    assert rel[0] < 0.05, (freqs[:3], rel)
    assert rel.max() < 0.05, (freqs, rel)
    # self-consistency regression gate against the recorded study values
    # on this exact (10, 2) mesh (1% window)
    study_10_2 = np.array(
        [44.479, 108.1, 108.3, 165.5, 193.74, 205.6, 205.9])
    assert np.all(np.abs(freqs - study_10_2) / study_10_2 < 0.01), freqs
    # double modes present (109.44 x2 within discrete accuracy)
    assert abs(freqs[1] - freqs[2]) / freqs[1] < 0.02
    # mass-normalization held
    assert all(m.mass_chk for m in modes[:7])
    # Rayleigh quotient consistency: v^T K v ~ omega_n^2
    for m in modes[:3]:
        assert abs(m.rq_omega2 - m.wn**2) / m.wn**2 < 1e-6


@pytest.mark.slow
def test_density_sensitivity_analytical_and_fd():
    mesh, space, bcs = build_plate(5, 1)
    asm = ElasticityEigenAssembler(
        space, young_modulus=E, poisson_ratio=NU, density=RHO, bcs=bcs
    )
    modes, K, M = solve_modes(asm, num=3)
    m0 = modes[0]
    lam0 = m0.wn**2
    # adjoint-free sensitivity (self-adjoint problem): v^T (dK - lam dM) v
    d_lam = asm.compute_sensitivity(m0.function, lam0, param="rho", dparam=1.0)
    # analytical: -lambda/rho for uniform perturbation, mass-normalized v
    assert np.isclose(d_lam, -lam0 / RHO, rtol=1e-3)

    def lam_of_rho(rho):
        a = ElasticityEigenAssembler(
            space, young_modulus=E, poisson_ratio=NU, density=rho, bcs=bcs
        )
        mm, _, _ = solve_modes(a, num=1)
        return mm[0].wn ** 2

    fd = compute_density_sensitivity_fd(lam_of_rho, RHO, step=40.0)
    assert np.isclose(d_lam, fd, rtol=2e-3), (d_lam, fd)
    # frequency sensitivity conversion
    dfn = process_sensitivity(d_lam, m0.fn)
    assert dfn < 0  # heavier plate -> lower frequency
