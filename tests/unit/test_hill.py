"""Hill's method vs the time-domain snapshot monodromy.

Both analyze the SAME prescribed periodic base
v(t) = U + Re(q1 e^{i omega t}) on the tiny cylinder: the time-domain
path (lsafw_tpu.floquet: theta-stepper monodromy around snapshot
Jacobians) and the frequency-domain path (lsafw_tpu.hill: the Hill
matrix built from the convective-linearization blocks).  The leading
multipliers must agree to the time-discretization error — the two
share nothing above the assembled operators.
"""

import numpy as np
import pytest

from tests.unit.test_scm_coupled import tiny_model  # noqa: F401


@pytest.fixture(scope="module")
def periodic_base(tiny_model):  # noqa: F811
    import jax.numpy as jnp

    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler
    from lsafw_tpu.solver.baseflow import BaseFlowSolver

    model = tiny_model
    U = np.asarray(BaseFlowSolver(
        model.ctx, model.mesh, model.bcs, re=model.re).solve(
        ramp=False, tol=1e-10, max_it=30))
    sigma, mode = model._eig_about(U, 0.0 + 0.6j)
    q1 = 0.6 * model._normalize(mode)  # smooth, satisfies the BCs
    omega = 0.9
    return model, U, q1, omega


def test_hill_matches_time_domain_monodromy(periodic_base):
    import jax.numpy as jnp

    from lsafw_tpu.floquet import FloquetSolver
    from lsafw_tpu.hill import hill_floquet
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler

    model, U, q1, omega = periodic_base
    T = 2.0 * np.pi / omega
    N = 96
    dt = T / N
    ts = dt * np.arange(N)
    snaps = np.stack([
        U + np.real(q1 * np.exp(1j * omega * t)) for t in ts])
    td = FloquetSolver(model.ctx, model.mesh, model.bcs, model.re,
                       snaps, dt).solve(k=10)

    # frequency side: A, M about the mean with the SAME bcs convention
    # the time-domain solver uses (the nonlinear/mean BCs)
    asm = LinearizedNavierStokesAssembler(
        jnp.asarray(U), model.ctx, model.re, model.bcs, model.mesh)
    A, M = (m.to_scipy() for m in asm.assemble_eigensystem())
    mask = np.asarray(model.bcs.dirichlet_mask, bool)
    hl = hill_floquet(model.ctx, A, M, [q1], omega,
                      n_blocks=3, num=10, bc_mask=mask)

    # the theta-stepper's Dirichlet identity rows contribute exact
    # mu = 1 artifacts (this prescribed base is not a solution, so
    # there is no physical trivial multiplier to confuse them with)
    mu_td_all = np.abs(td.multipliers)
    mu_td = np.sort(mu_td_all[np.abs(mu_td_all - 1.0) > 1e-8])[::-1][:2]
    mu_hl = np.sort(np.abs(hl.multipliers))[::-1][:2]
    # CN stepping at N=96 carries O((omega dt)^2) phase/growth error
    assert np.allclose(mu_td, mu_hl, rtol=2e-2), (mu_td, mu_hl)


def test_hill_unperturbed_reduces_to_eigenvalues(periodic_base):
    """With a zero harmonic the Hill exponents ARE the eigenvalues of
    (A, M) folded to the principal strip."""
    import jax.numpy as jnp

    from lsafw_tpu.hill import hill_floquet
    from lsafw_tpu.models.navier_stokes import LinearizedNavierStokesAssembler

    model, U, q1, omega = periodic_base
    asm = LinearizedNavierStokesAssembler(
        jnp.asarray(U), model.ctx, model.re, model.bcs, model.mesh)
    A, M = (m.to_scipy() for m in asm.assemble_eigensystem())
    mask = np.asarray(model.bcs.dirichlet_mask, bool)
    hl = hill_floquet(model.ctx, A, M, [np.zeros_like(q1)], omega,
                      n_blocks=2, num=8, bc_mask=mask)

    import scipy.sparse.linalg as spla
    vals = spla.eigs(A.astype(complex), k=4, M=M.astype(complex),
                     sigma=1e-4 + 1e-4j, return_eigenvectors=False)
    lead = vals[np.argmax(vals.real)]
    im_folded = (lead.imag + 0.5 * omega) % omega - 0.5 * omega
    match = min(abs(hl.exponents - complex(lead.real, im_folded)))
    assert match < 1e-6 * max(1.0, abs(lead)), (hl.exponents, lead)
