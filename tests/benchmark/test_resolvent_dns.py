"""Resolvent gain vs nonlinear DNS: the harmonic-response closure test.

Force the STABLE flow with eps * Re(M f_opt e^{i w t}) — the optimal
forcing mode the resolvent solver returns — starting ON the predicted
harmonic orbit q(t) = w + eps * Re(gain * q_mode e^{i w t}).  If the
resolvent gain, mode phases, and the unsteady stepper are all
consistent, the nonlinear march SUSTAINS that orbit: after two forcing
periods the reconstructed complex response amplitude still equals the
predicted gain.  Three independent code paths (complex shift-invert
Lanczos, real theta-stepper, dense energy norms) meet on one number.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.bcs import define_bcs
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.geometries import cylinder_flow_mesh
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
from lsafw_tpu.resolvent import ResolventSolver
from lsafw_tpu.solver.baseflow import BaseFlowSolver
from lsafw_tpu.solver.timestepping import UnsteadySolver

from lsafw_tpu.config import CylinderFlowGeometryConfig
from tests.benchmark.test_unsteady import _marker, INLET, OUTLET, BOTTOM, TOP, CYL

RE = 35.0  # subcritical on this mesh (checked in the test)


def test_forced_dns_sustains_resolvent_response():
    geo = CylinderFlowGeometryConfig(
        dim=2, cylinder_radius=0.5, cylinder_center=(0.0, 0.0),
        x_range=(-6.0, 16.0), y_range=(-5.0, 5.0), resolution=0.6,
        resolution_around_cylinder=0.2, influence_radius=4.0,
    )
    mesh = cylinder_flow_mesh(geo, max_iter=80, seed=0)
    mark_boundary_facets(mesh, _marker)
    spaces = define_spaces(mesh)
    bcs = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(1.0, 0.0)),
        BoundaryConditionsConfig(marker=BOTTOM, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=TOP, type="neumann_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
    ])
    bcs_pert = define_bcs(mesh, spaces, [
        BoundaryConditionsConfig(marker=INLET, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=CYL, type="dirichlet_velocity", value=(0.0, 0.0)),
        BoundaryConditionsConfig(marker=OUTLET, type="dirichlet_pressure", value=0.0),
    ])
    ctx = AssemblyContext.build(spaces)
    w = np.asarray(BaseFlowSolver(ctx, mesh, bcs, re=RE).solve(
        ramp=True, steps=3, tol=1e-10, max_it=40))

    asm = LinearizedNavierStokesAssembler(jnp.asarray(w), ctx, RE, bcs_pert, mesh)
    A, M = asm.assemble_eigensystem()
    Ms = M.to_scipy()

    omega = 0.8
    rs = ResolventSolver(A, M, spaces.num_velocity_dofs,
                         bcs_pert.dirichlet_mask, method="lu")
    modes = rs.solve(omega, k=1)
    gain = modes.gains[0]
    fhat, qhat = modes.forcings[0], gain * modes.responses[0]
    assert gain > 1.0

    eps = 1e-6
    a = np.asarray(Ms @ fhat.real)
    b = np.asarray(Ms @ fhat.imag)

    def load_fn(t):
        return eps * (a * np.cos(omega * t) - b * np.sin(omega * t))

    # start ON the predicted harmonic orbit and march two periods.
    # dt matters: CN shifts the resonance pole by O((w dt)^2), and the
    # gain near a lightly damped pole inherits that relative error
    # (measured: 5.1% at 32 steps/period, ~1.3% at 64)
    period = 2 * np.pi / omega
    n_per = 64
    dt = period / n_per
    us = UnsteadySolver(ctx, mesh, bcs, RE, newton_tol=1e-11,
                        refactor_every=100)
    q = jnp.asarray(w + eps * qhat.real)
    t = 0.0
    for k in range(2 * n_per):
        q, st = us.step(q, dt, t, load0=load_fn(t), load1=load_fn(t + dt))
        t = st.t
    q_full = np.asarray(q)  # t = 2 periods -> e^{i w t} = 1
    for k in range(n_per // 4):
        q, st = us.step(q, dt, t, load0=load_fn(t), load1=load_fn(t + dt))
        t = st.t
    q_quarter = np.asarray(q)  # t = 2.25 periods -> e^{i w t} = i

    qhat_est = (q_full - w) / eps - 1j * (q_quarter - w) / eps
    amp = np.sqrt(np.real(np.vdot(qhat_est, Ms @ qhat_est)))
    # the DNS sustained the predicted response amplitude
    assert abs(amp - gain) < 0.05 * gain, (amp, gain)
    # and the response SHAPE matches the resolvent mode
    corr = abs(np.vdot(qhat_est, Ms @ qhat)) / (
        amp * np.sqrt(np.real(np.vdot(qhat, Ms @ qhat))))
    assert corr > 0.99, corr
