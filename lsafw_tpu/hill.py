"""Hill's method: Floquet exponents of a periodic orbit in the
FREQUENCY domain.

Given a harmonic-balance representation of the cycle,
v(t) = U + Re(q1 e^{i w t}) + Re(q2 e^{2 i w t}) + ...,
perturbations w(t) = e^{lambda t} sum_k w_k e^{i k w t} satisfy the
block-coupled generalized eigenproblem (the Hill matrix):

  lambda M w_k = (A(U) - i k w M) w_k
                 + 1/2 sum_m [ C(q_m) w_{k-m} + C(q_m*) w_{k+m} ],

with A the linearized operator about the mean and C(b) the
convective-linearization matrix (the SAME block the coupled SCM Newton
uses — ``models/navier_stokes.convective_linearization_data``).  This
is the frequency-domain counterpart of the time-domain monodromy
(:mod:`lsafw_tpu.floquet`): exponents lambda relate to multipliers by
mu = exp(lambda T), T = 2 pi / w.

Hill's spectral redundancy: every true exponent appears as
lambda + i m w for all integer m representable in the truncation.  The
principal representative is selected by the harmonic-energy centroid
of the eigenvector (Lazarus & Thomas 2010): the physical exponent's
vector concentrates at k = 0.

Validation: against the time-domain snapshot monodromy on the same
prescribed periodic base (``tests/unit/test_hill.py``) and against the
shedding-cycle multipliers at Re=60 (``examples/scm_hb2.py --hill`` vs
``doc/floquet_re60_small.json``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class HillResult:
    exponents: np.ndarray  # (k,) complex principal Floquet exponents
    multipliers: np.ndarray  # exp(lambda T)
    omega: float
    centroids: np.ndarray  # harmonic-energy centroid of each vector
    raw: np.ndarray  # all converged eigenvalues before deduplication


def _cmatrix(ctx, b):
    """C(b) for a complex field b as a complex scipy CSR."""
    import jax.numpy as jnp

    from lsafw_tpu.models.navier_stokes import convective_linearization_data
    from lsafw_tpu.ops.sparse import CSRMatrix

    b = np.asarray(b)
    Cr = CSRMatrix(ctx.pattern, convective_linearization_data(
        ctx, jnp.asarray(b.real.copy()))).to_scipy()
    if np.iscomplexobj(b) and np.abs(b.imag).max() > 0:
        Ci = CSRMatrix(ctx.pattern, convective_linearization_data(
            ctx, jnp.asarray(b.imag.copy()))).to_scipy()
        return Cr + 1j * Ci
    return Cr.astype(complex)


def hill_floquet(
    ctx,
    A,
    M,
    harmonics,
    omega: float,
    *,
    n_blocks: int | None = None,
    num: int = 8,
    target: complex = 0.0 + 0.0j,
    bc_mask=None,
    tol: float = 1e-9,
) -> HillResult:
    """Principal Floquet exponents of the cycle by Hill's method.

    ``ctx``: assembly context (supplies the C(b) blocks).
    ``A``/``M``: scipy sparse linearized operator / mass about the MEAN
    (Dirichlet convention: A identity rows, M zero rows — as produced
    by :class:`LinearizedNavierStokesAssembler`).
    ``harmonics``: [q1, q2, ...] complex fields, v = U + sum Re(q_m E^m).
    ``num``: Krylov eigenpairs requested near ``target`` (exponent
    plane, i.e. near 0 for the dominant multipliers).
    ``bc_mask``: optional Dirichlet mask; C-block rows there are zeroed
    (their w rows are pinned by A's identity rows).
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    K = n_blocks if n_blocks is not None else len(harmonics) + 1
    n = A.shape[0]
    Acx = A.astype(complex)
    Mcx = M.astype(complex)
    Cs = [_cmatrix(ctx, q) for q in harmonics]
    if bc_mask is not None:
        Z = sp.diags(np.where(np.asarray(bc_mask, bool), 0.0, 1.0))
        Cs = [Z @ C for C in Cs]
    Cconj = [_cmatrix(ctx, np.conj(q)) for q in harmonics]
    if bc_mask is not None:
        Cconj = [Z @ C for C in Cconj]

    ks = list(range(-K, K + 1))
    nb = len(ks)
    blocks = [[None] * nb for _ in range(nb)]
    for i, k in enumerate(ks):
        blocks[i][i] = Acx - 1j * k * omega * Mcx
        for m, (Cm, Cmc) in enumerate(zip(Cs, Cconj), start=1):
            if i - m >= 0:  # couples to w_{k-m}
                blocks[i][i - m] = (blocks[i][i - m] + 0.5 * Cm
                                    if blocks[i][i - m] is not None
                                    else 0.5 * Cm)
            if i + m < nb:  # couples to w_{k+m}
                blocks[i][i + m] = (blocks[i][i + m] + 0.5 * Cmc
                                    if blocks[i][i + m] is not None
                                    else 0.5 * Cmc)
    H = sp.bmat(blocks, format="csc")
    B = sp.block_diag([Mcx] * nb, format="csc")

    # shift-invert Arnoldi about the exponent target; a small complex
    # offset keeps the factorization away from an exact exponent
    sigma = complex(target) + 1e-4 + 1e-4j
    vals, vecs = spla.eigs(H, k=num, M=B, sigma=sigma, tol=tol,
                           maxiter=300)

    # Floquet exponents are defined modulo i*omega; Hill's redundancy
    # produces each one as lambda + i m omega for every representable
    # m.  Fold everything to the principal strip Im in (-w/2, w/2] and
    # dedupe by proximity — copies of one exponent fold onto the SAME
    # point, so nothing physical is lost (a harmonic-energy-centroid
    # filter would wrongly drop strongly-coupled modes, whose vectors
    # legitimately concentrate away from the k = 0 block).  The
    # centroid is kept as a diagnostic only.
    order = np.argsort(-vals.real)
    vals, vecs = vals[order], vecs[:, order]
    centroids = np.empty(len(vals))
    for j in range(len(vals)):
        e = np.array([np.linalg.norm(vecs[i * n:(i + 1) * n, j]) ** 2
                      for i in range(nb)])
        centroids[j] = float(np.dot(ks, e) / max(e.sum(), 1e-300))
    T = 2.0 * np.pi / omega
    principal = []
    for lam in vals:
        im = (lam.imag + 0.5 * omega) % omega - 0.5 * omega
        lam_f = complex(lam.real, im)
        tol_d = 1e-6 * max(1.0, abs(lam_f))
        if any(abs(lam_f - s) < tol_d
               # strip-boundary wraparound of a folded copy
               or (abs(abs(lam_f.imag - s.imag) - omega) < tol_d
                   and abs(lam_f.real - s.real) < tol_d)
               for s in principal):
            continue
        principal.append(lam_f)  # conjugate partners are kept: they
        # are distinct physical exponents of the real-coefficient system
    principal = np.array(principal)
    logger.info("Hill: %d raw eigenvalues -> %d principal exponents "
                "(leading %s)", len(vals), len(principal),
                np.array2string(principal[:3], precision=4))
    return HillResult(principal, np.exp(principal * T), float(omega),
                      centroids, vals)
