"""Finite-difference consistency of the coupled SCM (harmonic-balance)
bordered Jacobian on a tiny cylinder mesh.

The coupled Newton's quadratic convergence rests on the Jacobian blocks
being the EXACT derivatives of the residual — in particular the four
coupling blocks built from the one convective-linearization matrix C(b)
(``models/navier_stokes.py::convective_linearization_data``).  This test
checks K(z) dz against a central finite difference of F(z) at a generic
(non-solution) state, which exercises every block including the
omega-column and the phase row.
"""

import numpy as np
import pytest

from lsafw_tpu.config import (
    BoundaryConditionsConfig,
    CylinderFlowGeometryConfig,
)
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.scm import SelfConsistentModel

INLET, OUTLET, BOTTOM, TOP, CYL = 1, 2, 3, 4, 5


@pytest.fixture(scope="module")
def tiny_model():
    geo = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-3.0, 6.0), y_range=(-3.0, 3.0), resolution=1.1,
        resolution_around_cylinder=0.45, influence_radius=1.8)
    mesh = cylinder_flow_mesh(geo, max_iter=60)

    def _marker(x):
        out = np.full(x.shape[0], -1)
        out[np.isclose(x[:, 0], geo.x_range[0])] = INLET
        out[np.isclose(x[:, 0], geo.x_range[1])] = OUTLET
        out[np.isclose(x[:, 1], geo.y_range[0])] = BOTTOM
        out[np.isclose(x[:, 1], geo.y_range[1])] = TOP
        out[np.hypot(x[:, 0], x[:, 1]) < geo.cylinder_radius * 1.5] = CYL
        return out

    mark_boundary_facets(mesh, _marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(
            marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(
            marker=BOTTOM, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(
            marker=TOP, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(
            marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(
            marker=m, type="dirichlet_velocity", value=(0.0, 0.0))
        for m in (INLET, BOTTOM, TOP, CYL)
    ] + [BoundaryConditionsConfig(
        marker=OUTLET, type="dirichlet_pressure", value=0.0)])
    ctx = AssemblyContext.build(spaces)
    return SelfConsistentModel(ctx, mesh, bcs, bcs_pert, 40.0,
                               linear_solver="lu")


def test_coupled_jacobian_matches_fd(tiny_model):
    import scipy.sparse as sp

    model = tiny_model
    n = model.ctx.spaces.num_dofs
    rng = np.random.default_rng(7)
    mask_m = np.asarray(model._base_asm.bc_mask, dtype=bool)
    bcv_m = np.asarray(model._base_asm.bc_values, dtype=float)
    mask_p = np.asarray(model.bcs_pert.dirichlet_mask, dtype=bool)
    zm = sp.diags(np.where(mask_m, 0.0, 1.0))
    zp = sp.diags(np.where(mask_p, 0.0, 1.0))

    # generic smooth-ish state obeying the masking convention
    U = np.where(mask_m, bcv_m, 0.3 * rng.standard_normal(n))
    qr = np.where(mask_p, 0.0, rng.standard_normal(n))
    qi = np.where(mask_p, 0.0, rng.standard_normal(n))
    om = 0.73
    avec = model._Ms.T @ qr
    bvec = model._Ms.T @ qi

    def resid(z):
        Uz, qrz, qiz, omz = z[:n], z[n:2 * n], z[2 * n:3 * n], z[-1]
        Aop = model._linearized_scipy(Uz)
        return model._coupled_residual(
            Uz, qrz, qiz, float(omz), Aop, avec, bvec, mask_m, mask_p)

    z0 = np.concatenate([U, qr, qi, [om]])
    Aop = model._linearized_scipy(U)
    K = model._coupled_matrix(U, qr, qi, om, Aop, avec, bvec, zm, zp)
    assert K.shape == (3 * n + 1, 3 * n + 1)

    # direction zeroed at BC dofs (those deltas are pinned by the
    # identity rows; coupling columns there are intentionally unmasked)
    dz = rng.standard_normal(3 * n + 1)
    dz[:n][mask_m] = 0.0
    dz[n:2 * n][mask_p] = 0.0
    dz[2 * n:3 * n][mask_p] = 0.0
    dz /= np.linalg.norm(dz)

    eps = 1e-6
    fd = (resid(z0 + eps * dz) - resid(z0 - eps * dz)) / (2 * eps)
    an = K @ dz
    err = np.linalg.norm(an - fd) / np.linalg.norm(fd)
    assert err < 1e-6, err


def test_hb2_jacobian_matches_fd(tiny_model):
    """Same FD consistency for the second-harmonic-balance (HB2)
    bordered system — exercises the q2 blocks, the B(q1*, q2)
    first-harmonic feedback, and both omega columns."""
    import scipy.sparse as sp

    model = tiny_model
    n = model.ctx.spaces.num_dofs
    rng = np.random.default_rng(11)
    mask_m = np.asarray(model._base_asm.bc_mask, dtype=bool)
    bcv_m = np.asarray(model._base_asm.bc_values, dtype=float)
    mask_p = np.asarray(model.bcs_pert.dirichlet_mask, dtype=bool)
    zm = sp.diags(np.where(mask_m, 0.0, 1.0))
    zp = sp.diags(np.where(mask_p, 0.0, 1.0))

    U = np.where(mask_m, bcv_m, 0.3 * rng.standard_normal(n))
    q1 = np.where(mask_p, 0.0,
                  rng.standard_normal(n) + 1j * rng.standard_normal(n))
    q2 = np.where(mask_p, 0.0,
                  rng.standard_normal(n) + 1j * rng.standard_normal(n))
    om = 0.73
    avec = model._Ms.T @ q1.real
    bvec = model._Ms.T @ q1.imag

    def resid(z):
        Uz = z[:n]
        q1z = z[n:2 * n] + 1j * z[2 * n:3 * n]
        q2z = z[3 * n:4 * n] + 1j * z[4 * n:5 * n]
        Aop = model._linearized_scipy(Uz)
        return model._hb2_residual(
            Uz, q1z, q2z, float(z[-1]), Aop, avec, bvec, mask_m, mask_p)

    z0 = np.concatenate([U, q1.real, q1.imag, q2.real, q2.imag, [om]])
    Aop = model._linearized_scipy(U)
    K = model._hb2_matrix(U, q1, q2, om, Aop, avec, bvec, zm, zp)
    assert K.shape == (5 * n + 1, 5 * n + 1)

    dz = rng.standard_normal(5 * n + 1)
    for blk in range(5):
        dz[blk * n:(blk + 1) * n][mask_m if blk == 0 else mask_p] = 0.0
    dz /= np.linalg.norm(dz)

    eps = 1e-6
    fd = (resid(z0 + eps * dz) - resid(z0 - eps * dz)) / (2 * eps)
    an = K @ dz
    err = np.linalg.norm(an - fd) / np.linalg.norm(fd)
    assert err < 1e-6, err


def test_coupled_residual_zero_at_eigenpair(tiny_model):
    """At (any baseflow U, its exact marginal-shifted eigenpair scaled
    to zero amplitude) F2 must vanish: build q from an actual
    eigensolve about a Stokes-like state and check the mode rows."""
    model = tiny_model
    n = model.ctx.spaces.num_dofs
    mask_m = np.asarray(model._base_asm.bc_mask, dtype=bool)
    bcv_m = np.asarray(model._base_asm.bc_values, dtype=float)
    mask_p = np.asarray(model.bcs_pert.dirichlet_mask, dtype=bool)

    U = np.where(mask_m, bcv_m, 0.0)
    sigma, mode = model._eig_about(U, 0.05 + 0.6j)
    mode = model._normalize(mode)
    qr, qi = mode.real.copy(), mode.imag.copy()
    Aop = model._linearized_scipy(U)
    avec = model._Ms.T @ qr
    bvec = model._Ms.T @ qi
    # at the TRUE sigma (not only i*omega) the mode equations read
    # (A - sigma M) q = 0; emulate by folding sigma_r into A
    Ashift = Aop - sigma.real * model._Ms
    Ms = model._Ms
    F2r = np.where(mask_p, 0.0,
                   Ashift @ qr + sigma.imag * (Ms @ qi))
    F2i = np.where(mask_p, 0.0,
                   Ashift @ qi - sigma.imag * (Ms @ qr))
    scale = np.linalg.norm(Aop @ qr) + np.linalg.norm(Aop @ qi)
    assert np.linalg.norm(np.concatenate([F2r, F2i])) < 1e-6 * scale

def test_device_bordered_solve_matches_splu(tiny_model, monkeypatch):
    """The device bordered solve (banded f32 factor of K0 + full-system
    GCR) must reproduce the host splu solution of the coupled Newton
    system (VERDICT r4 item 9: zero host factorizations in
    solve_coupled's inner loop)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    model = tiny_model
    n = model.ctx.spaces.num_dofs
    rng = np.random.default_rng(3)
    mask_m = np.asarray(model._base_asm.bc_mask, dtype=bool)
    bcv_m = np.asarray(model._base_asm.bc_values, dtype=float)
    mask_p = np.asarray(model.bcs_pert.dirichlet_mask, dtype=bool)
    zm = sp.diags(np.where(mask_m, 0.0, 1.0))
    zp = sp.diags(np.where(mask_p, 0.0, 1.0))
    U = np.where(mask_m, bcv_m, 0.3 * rng.standard_normal(n))
    qr = np.where(mask_p, 0.0, rng.standard_normal(n))
    qi = np.where(mask_p, 0.0, rng.standard_normal(n))
    avec = model._Ms.T @ qr
    bvec = model._Ms.T @ qi
    Aop = model._linearized_scipy(U)
    K = model._coupled_matrix(U, qr, qi, 0.73, Aop, avec, bvec, zm, zp)
    F = rng.standard_normal(3 * n + 1)

    monkeypatch.setenv("LSAFW_SCM_DEVICE", "1")
    dz_dev = model._bordered_solve(K, F)
    dz_host = spla.splu(K).solve(F)
    rel = np.linalg.norm(dz_dev - dz_host) / np.linalg.norm(dz_host)
    assert rel < 1e-7, rel
    # the full-system residual is the real acceptance criterion
    res = np.linalg.norm(K @ dz_dev - F) / np.linalg.norm(F)
    assert res < 1e-9, res
