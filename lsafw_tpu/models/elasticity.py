"""Linear elasticity eigenproblem: K v = lambda M v.

Counterpart of the reference's second physics domain
(``Elasticity/operators.py``, ``Elasticity/bcs.py``,
``Elasticity/spaces.py``, ``Elasticity/utils.py``): isotropic
small-strain elasticity in Lame form with DG-0 (per-cell) material
fields, component-wise Dirichlet constraints, modal post-processing
and eigenvalue sensitivities to material parameters.

Element matrices (affine cells, blocked DOFs (i, d)):
  K[(i,d),(j,e)] = mu [delta_de <grad phi_i, grad phi_j>
                       + <d phi_i/dx_e, d phi_j/dx_d>]
                   + lam <d phi_i/dx_d, d phi_j/dx_e>
  M[(i,d),(j,e)] = rho delta_de <phi_i, phi_j>
assembled from the same static reference tensors as the flow kernels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Iterable, Sequence

import jax.numpy as jnp
import numpy as np

from lsafw_tpu.fem.assembly import (
    SpaceContext,
    dirichlet_matrix_data,
    mass_scalar,
    stiffness_scalar,
)
from lsafw_tpu.fem.spaces import FunctionSpace, make_vector_space
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.meshing.tags import facets_with_marker
from lsafw_tpu.ops.sparse import CSRMatrix


def define_space(mesh: Mesh, degree: int = 1) -> FunctionSpace:
    """Vector H1 Lagrange displacement space
    (parity: ``Elasticity/spaces.py:11``)."""
    family = {1: "p1", 2: "p2"}[degree]
    return make_vector_space(mesh, family)


# ---------------------------------------------------------------------------
# Boundary conditions (parity: Elasticity/bcs.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ComponentDirichlet:
    """Dirichlet on selected displacement components
    (parity: ``Elasticity/bcs.py:24``)."""

    tags: Iterable[int]
    components: Sequence[int]
    value: float | Sequence[float] | Callable = 0.0


@dataclass(frozen=True)
class AxisNormalBc:
    """Axis-aligned normal-displacement constraint
    (parity: ``Elasticity/bcs.py:33``)."""

    tags: Iterable[int]
    axis: int
    value: float = 0.0


@dataclass
class BoundaryConditions:
    """(parity: ``Elasticity/bcs.py:15``)."""

    dirichlet_mask: np.ndarray
    dirichlet_values: np.ndarray


def define_bcs(
    mesh: Mesh,
    space: FunctionSpace,
    *,
    component: Iterable[ComponentDirichlet] = (),
    axis_normal: Iterable[AxisNormalBc] = (),
) -> BoundaryConditions:
    """(parity: ``Elasticity/bcs.py:106``)."""
    if mesh.facet_tags is None:
        raise ValueError("Mesh boundaries are not properly tagged.")
    mask = np.zeros(space.num_dofs, dtype=bool)
    values = np.zeros(space.num_dofs, dtype=np.float64)
    specs = list(component) + [
        ComponentDirichlet(tags=s.tags, components=(s.axis,), value=s.value)
        for s in axis_normal
    ]
    for spec in specs:
        for tag in spec.tags:
            facets = facets_with_marker(mesh, tag)
            for c in spec.components:
                dofs = space.dofs_on_facets(facets, component=c)
                mask[dofs] = True
                if callable(spec.value):
                    values[dofs] = np.asarray(spec.value(space.dof_coords[dofs])).ravel()
                else:
                    v = np.atleast_1d(spec.value).astype(float)
                    values[dofs] = v[c] if v.size > c else v[0]
    return BoundaryConditions(dirichlet_mask=mask, dirichlet_values=values)


# ---------------------------------------------------------------------------
# Material properties (parity: Elasticity/operators.py:67-121)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MaterialProperties:
    """DG-0 (per-cell) material fields."""

    mu: np.ndarray
    lam: np.ndarray
    rho: np.ndarray
    young_modulus: np.ndarray
    poisson_ratio: np.ndarray

    @classmethod
    def from_basic_properties(
        cls, mesh: Mesh, young_modulus, poisson_ratio, density
    ) -> "MaterialProperties":
        nc = mesh.num_cells
        E = np.broadcast_to(np.asarray(young_modulus, dtype=float), (nc,)).copy()
        nu = np.broadcast_to(np.asarray(poisson_ratio, dtype=float), (nc,)).copy()
        rho = np.broadcast_to(np.asarray(density, dtype=float), (nc,)).copy()
        mu = E / (2.0 * (1.0 + nu))
        lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        return cls(mu=mu, lam=lam, rho=rho, young_modulus=E, poisson_ratio=nu)


# ---------------------------------------------------------------------------
# Assembler (parity: ElasticityEigenAssembler, Elasticity/operators.py:124)
# ---------------------------------------------------------------------------


def _grad_grad_tensor(ctx: SpaceContext) -> jnp.ndarray:
    """D[c,i,d,j,e] = integral d phi_i/dx_d * d phi_j/dx_e."""
    if not ctx.is_affine:  # quad/hex: per-qp geometry factors
        g = ctx.phys_grad_u()  # (nc, nq, i, d)
        return jnp.einsum("q,cq,cqid,cqje->cidje", ctx.w, ctx.detJ, g, g)
    return jnp.einsum(
        "tsij,ctd,cse,c->cidje", ctx.K0, ctx.Jinv, ctx.Jinv, ctx.detJ
    )


def elasticity_stiffness_elements(ctx: SpaceContext, mu: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    g = ctx.gdim
    S = stiffness_scalar(ctx)  # (nc, i, j)
    D = _grad_grad_tensor(ctx)  # (nc, i, d, j, e)
    eye = jnp.eye(g, dtype=S.dtype)
    term1 = jnp.einsum("c,cij,de->cidje", mu, S, eye)
    term2 = jnp.einsum("c,ciejd->cidje", mu, D)  # swap pairing (i,e),(j,d)
    term3 = jnp.einsum("c,cidje->cidje", lam, D)
    nc, n_el = S.shape[0], S.shape[1]
    return (term1 + term2 + term3).reshape(nc, n_el * g, n_el * g)


def elasticity_mass_elements(ctx: SpaceContext, rho: jnp.ndarray) -> jnp.ndarray:
    g = ctx.gdim
    Ms = mass_scalar(ctx)
    eye = jnp.eye(g, dtype=Ms.dtype)
    nc, n_el = Ms.shape[0], Ms.shape[1]
    return jnp.einsum("c,cij,de->cidje", rho, Ms, eye).reshape(nc, n_el * g, n_el * g)


class ElasticityEigenAssembler:
    """(parity: ``ElasticityEigenAssembler``, ``Elasticity/operators.py:124-302``)."""

    def __init__(
        self,
        space: FunctionSpace,
        *,
        young_modulus: float,
        poisson_ratio: float,
        density: float,
        bcs: BoundaryConditions | None = None,
    ) -> None:
        self.space = space
        self.ctx = SpaceContext.build(space, quad_degree=2 * space.element.degree)
        self.material_properties = MaterialProperties.from_basic_properties(
            space.mesh, young_modulus, poisson_ratio, density
        )
        self.bcs = bcs
        self._cache: dict[str, CSRMatrix] = {}

    @property
    def _mask(self) -> jnp.ndarray:
        if self.bcs is None:
            return jnp.zeros(self.space.num_dofs, dtype=bool)
        return jnp.asarray(self.bcs.dirichlet_mask)

    def assemble_stiffness(self, *, mu=None, lam=None, apply_bcs: bool = True) -> CSRMatrix:
        """(parity: ``assemble_stiffness``, ``Elasticity/operators.py:229``)."""
        key = "k" if (mu is None and lam is None and apply_bcs) else None
        if key and key in self._cache:
            return self._cache[key]
        ctx = self.ctx
        mp = self.material_properties
        el = elasticity_stiffness_elements(
            ctx, jnp.asarray(mu if mu is not None else mp.mu),
            jnp.asarray(lam if lam is not None else mp.lam),
        )
        K = ctx.scatter(el)
        if apply_bcs:
            K = CSRMatrix(ctx.pattern, dirichlet_matrix_data(ctx.pattern, K.data, self._mask, 1.0))
        if key:
            self._cache[key] = K
        return K

    def assemble_mass(self, *, rho=None, apply_bcs: bool = True) -> CSRMatrix:
        """(parity: ``assemble_mass``, ``Elasticity/operators.py:252``).
        BC rows get diag 0 so constrained DOFs sit at infinite frequency."""
        key = "m" if (rho is None and apply_bcs) else None
        if key and key in self._cache:
            return self._cache[key]
        ctx = self.ctx
        rho_arr = jnp.asarray(rho if rho is not None else self.material_properties.rho)
        M = ctx.scatter(elasticity_mass_elements(ctx, rho_arr))
        if apply_bcs:
            M = CSRMatrix(ctx.pattern, dirichlet_matrix_data(ctx.pattern, M.data, self._mask, 0.0))
        if key:
            self._cache[key] = M
        return M

    def assemble_eigensystem(self) -> tuple[CSRMatrix, CSRMatrix]:
        """Returns (M, K) matching the reference's order
        (``Elasticity/operators.py:273-275``)."""
        return self.assemble_mass(), self.assemble_stiffness()

    def compute_sensitivity(
        self,
        eigenfunction: np.ndarray,
        eigenvalue: float,
        param: str = "rho",
        dparam: np.ndarray | float = 1.0,
    ) -> float:
        """d lambda = v^T (dK/dp - lambda dM/dp) v in direction ``dparam``
        (parity: ``compute_sensitivity``, ``Elasticity/operators.py:277-302``,
        which uses ufl.derivative; here the derivative forms are assembled
        directly since K is linear in (mu, lam) and M in rho)."""
        v = jnp.asarray(np.real(eigenfunction))
        nc = self.space.mesh.num_cells
        dp = jnp.broadcast_to(jnp.asarray(dparam, dtype=jnp.float64), (nc,))
        mp = self.material_properties
        if param == "rho":
            dM = self.assemble_mass(rho=dp, apply_bcs=False)
            dM = CSRMatrix(self.ctx.pattern, dirichlet_matrix_data(self.ctx.pattern, dM.data, self._mask, 0.0))
            return float(-eigenvalue * (v @ (dM @ v)))
        if param in ("e", "young_modulus"):
            # mu, lam are linear in E at fixed nu
            dmu = dp / (2.0 * (1.0 + jnp.asarray(mp.poisson_ratio)))
            nu = jnp.asarray(mp.poisson_ratio)
            dlam = dp * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
            dK = self.assemble_stiffness(mu=dmu, lam=dlam, apply_bcs=False)
            dK = CSRMatrix(self.ctx.pattern, dirichlet_matrix_data(self.ctx.pattern, dK.data, self._mask, 0.0))
            return float(v @ (dK @ v))
        raise ValueError(f"Unsupported parameter {param!r}")


# ---------------------------------------------------------------------------
# Post-processing (parity: Elasticity/utils.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Eigenmode:
    """(parity: ``Eigenmode``, ``Elasticity/utils.py:45``)."""

    value: complex
    function: np.ndarray  # mass-normalized real displacement vector
    wn: float
    fn: float
    eta_r: float
    rq_omega2: float
    mass_chk: bool


def process_modes(
    eigenpairs,
    stiffness: CSRMatrix,
    mass: CSRMatrix,
    *,
    skip_below_hz: float = 0.1,
) -> list[Eigenmode]:
    """Mass-normalize, compute natural frequencies, filter spurious modes,
    sort ascending (parity: ``process_modes``, ``Elasticity/utils.py:65-120``)."""
    Ks = stiffness.to_scipy()
    Ms = mass.to_scipy()
    out: list[Eigenmode] = []
    for eigval, eigvec in eigenpairs:
        v = np.real(np.asarray(eigvec))
        vMv = float(v @ (Ms @ v))
        alpha = 1.0 / math.sqrt(vMv) if vMv > 0 else 1.0
        v = v * alpha
        vMv_n = float(v @ (Ms @ v))
        vKv = float(v @ (Ks @ v))
        lam = complex(eigval)
        wn = math.sqrt(abs(lam.real)) if lam.real > 0 else 0.0
        fn = wn / (2 * math.pi)
        eta_r = lam.imag / (wn**2) if wn > 0 else 0.0
        if fn < skip_below_hz:
            continue
        out.append(
            Eigenmode(
                value=lam, function=v, wn=wn, fn=fn, eta_r=eta_r,
                rq_omega2=vKv, mass_chk=bool(np.isclose(vMv_n, 1.0)),
            )
        )
    out.sort(key=lambda m: m.fn)
    return out


def process_sensitivity(sensitivity: float, natural_frequency: float) -> float:
    """d lambda -> d f_n in Hz (parity: ``Elasticity/utils.py:123``)."""
    return sensitivity / (8 * math.pi**2 * natural_frequency)


def compute_density_sensitivity_analytical(eigenvalue: float, *, v=None, M1=None) -> float:
    """For uniform density perturbation and mass-normalized v:
    d lambda/d rho = -lambda * v^T M_(rho=1) v = -lambda/rho
    (parity: ``Elasticity/utils.py:128``)."""
    if v is not None and M1 is not None:
        return float(-eigenvalue * (v @ (M1.to_scipy() @ v)))
    raise ValueError("Provide v and the unit-density mass matrix M1.")


def compute_density_sensitivity_fd(
    make_eigenvalue: Callable[[float], float], rho0: float, step: float = 10.0
) -> float:
    """Central finite difference of lambda(rho)
    (parity: ``Elasticity/utils.py:158``)."""
    lp = make_eigenvalue(rho0 + step)
    lm = make_eigenvalue(rho0 - step)
    return (lp - lm) / (2 * step)
