"""Quasi-3D (spanwise-Fourier) linear stability of 2D base flows.

Secondary-instability analysis in the classic sense of Barkley &
Henderson (JFM 322, 1996): perturbations of a two-dimensional base
state (steady or periodic) carrying a single spanwise Fourier mode

    q'(x, y, z, t) = (u', v', w', p')(x, y, t) . e_beta(z),

on the SAME 2D mesh — the third dimension enters only through the
wavenumber ``beta``, so a full 3D eigenproblem collapses onto a 2D one
with one extra scalar velocity field.  Beyond the reference's toolbox
(the reference is strictly 2D/3D-primary, ``FEM/operators.py:399-562``
is its closest surface); companions: :mod:`lsafw_tpu.floquet` (2D
monodromy), :mod:`lsafw_tpu.resolvent`.

Real reduction (what keeps the operators in the framework's real-pair
world): for base flows with ZERO spanwise component the substitution

    (u', v', p') ~ (u, v, p)(x, y) cos(beta z),   w' ~ w(x, y) sin(beta z)

closes the linearized Navier-Stokes system over REAL 2D fields:

    momentum (in-plane d):  A_2d(U) u_d  - (beta^2/Re) u_d
    momentum (spanwise):    -(U . grad2) w - (1/Re)(grad2^2 + beta^2) w
                            + beta p
    continuity:             div2 u + beta w = 0

so A(beta) and M are real matrices on the block layout
``[u, v, p (the existing mixed space); w (one scalar velocity field)]``
and every existing solver (shift-invert Krylov-Schur, banded LU,
Newton) applies unchanged.  The spectrum of the real reduction equals
the spectrum of the complex e^{i beta z} operator.

Dirichlet rule for the spanwise field: w is constrained at a node iff
ALL in-plane velocity components are constrained there (no-slip and
inflow walls pin w; symmetry planes — where w is tangential — leave it
free).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import (
    AssemblyContext,
    convection_scalar,
    dirichlet_matrix_data,
    expand_vector_diag,
    mass_scalar,
    stiffness_scalar,
)
from lsafw_tpu.fem.bcs import BoundaryConditions
from lsafw_tpu.fem.facets import FacetContext, _pair_slots, build_facet_context
from lsafw_tpu.models.navier_stokes import (
    _split_local,
    linearized_ns_elements,
    mass_elements,
)
from lsafw_tpu.ops.sparse import CSRMatrix, SparsityPattern, assemble_csr_data, build_sparsity
from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# Element kernels
# ---------------------------------------------------------------------------


def quasi3d_elements(
    ctx: AssemblyContext, w_base: jnp.ndarray, re, beta
) -> jnp.ndarray:
    """Element matrices of the quasi-3D linearized operator A(beta)
    around the 2D mixed state ``w_base`` (traced in ``re``, ``beta``).

    Local DOF layout: ``[u,v (interleaved), p, w]`` —
    (nc, nd + nu_el, nd + nu_el) with nd = ctx.ndofs_el."""
    nd, nu, g = ctx.ndofs_el, ctx.nu_el, ctx.gdim
    nud = nu * g
    A2 = linearized_ns_elements(ctx, w_base, re)
    ms = mass_scalar(ctx)
    ub_el, _ = _split_local(ctx, w_base)
    conv = convection_scalar(ctx, ub_el)
    stiff = stiffness_scalar(ctx)
    wdet = ctx.w[None, :] * ctx.detJ[:, None]
    mup = jnp.einsum("cq,qi,qk->cik", wdet, ctx.phi_u, ctx.phi_p)  # (nc,nu,np)
    nc = A2.shape[0]
    NE = nd + nu
    A = jnp.zeros((nc, NE, NE), A2.dtype)
    A = A.at[:, :nd, :nd].set(A2)
    # spanwise viscous damping of the in-plane components
    A = A.at[:, :nud, :nud].add(expand_vector_diag(-(beta * beta / re) * ms, g))
    # spanwise momentum: advection-diffusion + beta^2 damping
    A = A.at[:, nd:, nd:].set(-conv - (stiff + (beta * beta) * ms) / re)
    # z-momentum pressure gradient: + beta (p, w_test)
    A = A.at[:, nd:, nud:nd].set(beta * mup)
    # continuity: div2 u' + beta w'
    A = A.at[:, nud:nd, nd:].set(beta * jnp.swapaxes(mup, 1, 2))
    return A


def quasi3d_mass_elements(ctx: AssemblyContext) -> jnp.ndarray:
    """Element mass: 2D velocity mass + the spanwise scalar mass."""
    nd, nu = ctx.ndofs_el, ctx.nu_el
    m2 = mass_elements(ctx)
    ms = mass_scalar(ctx)
    nc = m2.shape[0]
    NE = nd + nu
    M = jnp.zeros((nc, NE, NE), m2.dtype)
    M = M.at[:, :nd, :nd].set(m2)
    return M.at[:, nd:, nd:].set(ms)


def _q3_outlet_blocks(fc: FacetContext, ctx: AssemblyContext, re) -> jnp.ndarray:
    """(nf, NE, NE) viscous-outlet facet blocks: the component-diagonal
    (u, v) term of the 2D operator (``fem.facets.viscous_outlet_*``)
    plus the SAME scalar block on the spanwise field (the w momentum
    equation integrates its in-plane Laplacian by parts over the same
    outflow boundary)."""
    g = ctx.gdim
    nd, nu = ctx.ndofs_el, ctx.nu_el
    nud = nu * g
    gn = jnp.einsum("fqjd,fd->fqj", fc.gphi_u, fc.normals)
    s = (1.0 / re) * jnp.einsum(
        "q,f,fqi,fqj->fij", fc.w, fc.detJf, fc.phi_u, gn)
    eye = jnp.eye(g, dtype=s.dtype)
    vv = jnp.einsum("fij,de->fidje", s, eye).reshape(
        s.shape[0], nud, nud)
    B = jnp.zeros((s.shape[0], nd + nu, nd + nu), s.dtype)
    B = B.at[:, :nud, :nud].set(vv)
    return B.at[:, nd:, nd:].set(s)


@jax.jit
def _jit_q3_operator_data(ctx, sdev, w, re, beta, mask, outlets):
    data = assemble_csr_data(sdev, quasi3d_elements(ctx, w, re, beta))
    for fc, slots in outlets:
        from lsafw_tpu.ops.exact import segment_sum_fast

        blocks = _q3_outlet_blocks(fc, ctx, re)
        data = data + segment_sum_fast(
            blocks.reshape(-1), slots, data.shape[0])
    return dirichlet_matrix_data(sdev, data, mask, 1.0)


@jax.jit
def _jit_q3_mass_data(ctx, sdev, mask, diag):
    return dirichlet_matrix_data(
        sdev, assemble_csr_data(sdev, quasi3d_mass_elements(ctx)), mask, diag
    )


# ---------------------------------------------------------------------------
# Assembler
# ---------------------------------------------------------------------------


@dataclass
class SpanwiseStability:
    """Quasi-3D eigensystem builder: ``A(beta) x = sigma M x`` on the
    block space [2D mixed; spanwise velocity].

    ``beta`` is a TRACED argument of the assembly, so a wavenumber
    sweep reuses one compiled scatter.
    """

    ctx: AssemblyContext
    base_flow: jnp.ndarray
    re: float
    bcs_pert: BoundaryConditions
    mesh: object = None
    mass_diag: float = 0.0

    def __post_init__(self) -> None:
        ctx = self.ctx
        if ctx.gdim != 2:
            raise NotImplementedError(
                "Spanwise-Fourier analysis is defined for 2D base flows."
            )
        spaces = ctx.spaces
        self.n2 = spaces.num_dofs
        g = ctx.gdim
        self.ns = spaces.num_velocity_dofs // g
        # super-element DOFs: the mixed cell DOFs + offset w nodes
        cell_w = np.asarray(ctx.cell_nodes_u) + self.n2
        super_dofs = np.concatenate(
            [np.asarray(ctx.mixed_cell_dofs), cell_w], axis=1
        )
        self.pattern: SparsityPattern = build_sparsity(
            super_dofs, shape=(self.n2 + self.ns, self.n2 + self.ns)
        )
        mask2 = np.asarray(self.bcs_pert.dirichlet_mask)
        mv = mask2[: spaces.num_velocity_dofs].reshape(-1, g)
        self.bc_mask = jnp.asarray(
            np.concatenate([mask2, mv.all(axis=1)]))
        self.base_flow = jnp.asarray(self.base_flow)
        outlets = tuple(getattr(self.bcs_pert, "outlet_markers", ()))
        if outlets and self.mesh is None:
            raise ValueError(
                "Pressure-outlet perturbation BCs add a viscous-outlet "
                "facet term; pass the mesh to build its facet contexts."
            )
        self._outlets = []
        for m in outlets:
            fc = build_facet_context(ctx, self.mesh, m)
            sup_dofs = np.concatenate(
                [np.asarray(fc.cell_dofs),
                 np.asarray(ctx.cell_nodes_u)[np.asarray(fc.parent_cells)]
                 + self.n2],
                axis=1,
            )
            self._outlets.append(
                (fc, jnp.asarray(_pair_slots(self.pattern, sup_dofs))))
        self._outlets = tuple(self._outlets)
        logger.info(
            "SpanwiseStability: %d mixed + %d spanwise DOFs, %d nnz, "
            "%d outlet boundaries",
            self.n2, self.ns, self.pattern.nnz, len(outlets),
        )

    @property
    def num_dofs(self) -> int:
        return self.n2 + self.ns

    def operator_data(self, beta, state: jnp.ndarray | None = None) -> jnp.ndarray:
        w = self.base_flow if state is None else jnp.asarray(state)
        return _jit_q3_operator_data(
            self.ctx, self.pattern.dev, w, self.re,
            jnp.asarray(float(beta)), self.bc_mask, self._outlets,
        )

    def assemble_eigensystem(self, beta) -> tuple[CSRMatrix, CSRMatrix]:
        """(A(beta), M) on the shared quasi-3D pattern; Dirichlet rows
        get identity in A and ``mass_diag`` (default 0 = modes at
        infinity) in M — same convention as the 2D eigensystem."""
        A = CSRMatrix(self.pattern, self.operator_data(beta))
        M = CSRMatrix(
            self.pattern,
            _jit_q3_mass_data(
                self.ctx, self.pattern.dev, self.bc_mask,
                jnp.asarray(self.mass_diag),
            ),
        )
        return A, M

    def momentum_mask(self) -> np.ndarray:
        """All velocity rows (in-plane + spanwise) not under Dirichlet —
        the explicit-side restriction of a theta step."""
        spaces = self.ctx.spaces
        mom = np.zeros(self.num_dofs, dtype=bool)
        mom[: spaces.num_velocity_dofs] = True
        mom[self.n2:] = True
        return mom & ~np.asarray(self.bc_mask)

    def embed(self, w2: np.ndarray) -> np.ndarray:
        """Lift a 2D mixed vector into the quasi-3D space (w = 0)."""
        out = np.zeros(self.num_dofs, dtype=np.asarray(w2).dtype)
        out[: self.n2] = np.asarray(w2)
        return out


def spanwise_floquet(
    span: SpanwiseStability,
    snapshots: np.ndarray,
    dt: float,
    beta,
    *,
    theta: float = 0.5,
    method: str = "lu",
    inexact: bool = True,
):
    """Floquet solver for SPANWISE perturbations of a 2D periodic orbit
    — the secondary-instability calculation of Barkley & Henderson
    (JFM 322, 1996): multipliers mu(beta) of the quasi-3D monodromy
    around the 2D shedding cycle; |mu| > 1 at some beta marks the
    three-dimensional transition (mode A / mode B bands).

    ``snapshots``: (N, n2) 2D states over one period (the same arrays
    the 2D :class:`lsafw_tpu.floquet.FloquetSolver` consumes); the
    returned solver's monodromy acts on quasi-3D vectors
    ``[u, v, p; w]``.  Defaults to the inexact (one cycle-mean factor)
    backend since the quasi-3D space is ~4/3 the 2D size.
    """
    from lsafw_tpu.floquet import FloquetSolver

    snaps = np.asarray(snapshots)
    Md = _jit_q3_mass_data(
        span.ctx, span.pattern.dev, span.bc_mask, jnp.asarray(0.0))
    Jdata = [span.operator_data(beta, state=snaps[k])
             for k in range(snaps.shape[0])]
    return FloquetSolver.from_operator_data(
        span.pattern, Md, Jdata, span.momentum_mask(), dt,
        theta=theta, method=method, inexact=inexact,
    )
