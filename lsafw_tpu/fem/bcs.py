"""Boundary conditions on the mixed velocity-pressure space.

Counterpart of ``FEM/bcs.py``: Dirichlet velocity/pressure (strong,
as masked DOFs + values), Neumann velocity/pressure and Robin (weak,
consumed by the facet-integral kernels), Symmetry (component pinning,
``FEM/bcs.py:178-182``), and Periodic (geometric DOF pairing +
post-assembly constraint folding, ``FEM/bcs.py:198-304``).

Strong conditions are represented TPU-natively as a boolean mask +
value vector over the mixed DOF layout; application to operators is
the pure-data transform :func:`lsafw_tpu.fem.assembly.dirichlet_matrix_data`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Sequence

import numpy as np
import scipy.sparse as sp

from lsafw_tpu.config import BoundaryConditionsConfig
from lsafw_tpu.fem.spaces import FunctionSpaces
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.meshing.tags import facets_with_marker
from lsafw_tpu.ops.sparse import CSRMatrix


class BoundaryConditionType(Enum):
    """Supported BC types (parity: ``FEM/bcs.py:26-54``)."""

    DIRICHLET_VELOCITY = "dirichlet_velocity"
    DIRICHLET_PRESSURE = "dirichlet_pressure"
    NEUMANN_VELOCITY = "neumann_velocity"
    NEUMANN_PRESSURE = "neumann_pressure"
    PERIODIC = "periodic"
    ROBIN = "robin"
    SYMMETRY = "symmetry"
    DIRICHLET_DISPLACEMENT = "dirichlet_displacement"

    @classmethod
    def from_string(cls, value: str) -> "BoundaryConditionType":
        return cls(value.lower().strip().replace(" ", "_"))


@dataclass
class BoundaryConditions:
    """All BCs of a problem over the mixed layout
    (parity: ``FEM/bcs.py:57-74``)."""

    num_dofs: int
    dirichlet_mask: np.ndarray  # (num_dofs,) bool
    dirichlet_values: np.ndarray  # (num_dofs,) float64
    velocity_neumann: list[tuple[int, tuple[float, ...]]] = field(default_factory=list)
    pressure_neumann: list[tuple[int, float]] = field(default_factory=list)
    robin: list[tuple[int, float, tuple[float, ...]]] = field(default_factory=list)
    velocity_periodic: list[tuple[np.ndarray, np.ndarray]] = field(default_factory=list)
    pressure_periodic: list[tuple[np.ndarray, np.ndarray]] = field(default_factory=list)
    outlet_markers: list[int] = field(default_factory=list)

    @property
    def periodic_pairs(self) -> list[tuple[np.ndarray, np.ndarray]]:
        return self.velocity_periodic + self.pressure_periodic

    def homogeneous(self) -> "BoundaryConditions":
        """Same constrained DOFs with zero values — the perturbation BCs
        used for the linearized eigenproblem (``Solver/cli.py`` assembles
        perturbation BCs separately; homogeneous Dirichlet on all
        baseflow Dirichlet boundaries)."""
        return BoundaryConditions(
            num_dofs=self.num_dofs,
            dirichlet_mask=self.dirichlet_mask.copy(),
            dirichlet_values=np.zeros_like(self.dirichlet_values),
            velocity_neumann=[(m, tuple(0.0 for _ in v)) for m, v in self.velocity_neumann],
            pressure_neumann=[(m, 0.0) for m, _ in self.pressure_neumann],
            robin=[(m, a, tuple(0.0 for _ in v)) for m, a, v in self.robin],
            velocity_periodic=list(self.velocity_periodic),
            pressure_periodic=list(self.pressure_periodic),
            outlet_markers=list(self.outlet_markers),
        )


def define_bcs(
    mesh: Mesh,
    spaces: FunctionSpaces,
    configs: Sequence[BoundaryConditionsConfig],
) -> BoundaryConditions:
    """Construct all boundary conditions (parity: ``FEM/bcs.py:77-195``)."""
    if mesh.facet_tags is None:
        raise ValueError("Mesh boundaries are not properly tagged.")
    gdim = mesh.gdim
    n = spaces.num_dofs
    nu = spaces.num_velocity_dofs
    mask = np.zeros(n, dtype=bool)
    values = np.zeros(n, dtype=np.float64)
    bcs = BoundaryConditions(num_dofs=n, dirichlet_mask=mask, dirichlet_values=values)

    for cfg in configs:
        kind = BoundaryConditionType.from_string(cfg.type)
        marker = cfg.marker
        if kind is not BoundaryConditionType.PERIODIC:
            facets = facets_with_marker(mesh, marker)

        if kind in (
            BoundaryConditionType.DIRICHLET_VELOCITY,
            BoundaryConditionType.DIRICHLET_DISPLACEMENT,
        ):
            dofs = spaces.velocity.dofs_on_facets(facets)
            vals = _velocity_values(spaces, dofs, cfg.value, gdim)
            mask[dofs] = True
            values[dofs] = vals

        elif kind is BoundaryConditionType.DIRICHLET_PRESSURE:
            nodes = spaces.pressure.nodes_on_facets(facets)
            dofs = nu + nodes
            mask[dofs] = True
            values[dofs] = _scalar_values(spaces.pressure.node_coords[nodes], cfg.value)
            bcs.outlet_markers.append(marker)

        elif kind is BoundaryConditionType.SYMMETRY:
            # pin the wall-normal component (component 1, matching the
            # reference's hard-coded comp=1, ``FEM/bcs.py:178-182``)
            dofs = spaces.velocity.dofs_on_facets(facets, component=1)
            mask[dofs] = True
            values[dofs] = 0.0

        elif kind is BoundaryConditionType.NEUMANN_VELOCITY:
            bcs.velocity_neumann.append((marker, _as_vector(cfg.value, gdim)))

        elif kind is BoundaryConditionType.NEUMANN_PRESSURE:
            bcs.pressure_neumann.append((marker, float(cfg.value)))

        elif kind is BoundaryConditionType.ROBIN:
            if cfg.robin_alpha is None:
                raise ValueError("robin_alpha must be provided for Robin BC")
            bcs.robin.append((marker, float(cfg.robin_alpha), _as_vector(cfg.value, gdim)))

        elif kind is BoundaryConditionType.PERIODIC:
            if not (isinstance(cfg.value, tuple) and len(cfg.value) == 2):
                raise TypeError("PERIODIC value must be (from_marker, to_marker)")
            fm, tm = int(cfg.value[0]), int(cfg.value[1])
            v_pairs = compute_periodic_dof_pairs(spaces.velocity, mesh, fm, tm)
            p_pairs = compute_periodic_dof_pairs(spaces.pressure, mesh, fm, tm)
            bcs.velocity_periodic.append(v_pairs)
            bcs.pressure_periodic.append((p_pairs[0] + nu, p_pairs[1] + nu))

        else:
            raise AssertionError(f"Unhandled boundary condition type: {kind!r}")

    return bcs


def pin_dofs(bcs: BoundaryConditions, dofs, values: float | np.ndarray = 0.0) -> None:
    """Pin extra DOFs as Dirichlet constraints in-place — e.g. a single
    pressure DOF for enclosed flows (parity: ``iPETScMatrix.pin_dof``,
    ``FEM/utils.py:596-602``, done here at the BC level so every
    operator sees it)."""
    dofs = np.asarray(dofs).ravel()
    bcs.dirichlet_mask[dofs] = True
    bcs.dirichlet_values[dofs] = values


def _as_vector(value, gdim: int) -> tuple[float, ...]:
    arr = np.atleast_1d(np.asarray(value, dtype=float)).ravel()
    if arr.size == 1:
        arr = np.repeat(arr, gdim)
    if arr.size != gdim:
        raise ValueError(f"Vector value must have length {gdim}, got {arr.size}")
    return tuple(arr)


def _velocity_values(spaces: FunctionSpaces, dofs: np.ndarray, value, gdim: int) -> np.ndarray:
    coords = spaces.velocity.dof_coords[dofs]
    comp = dofs % gdim
    if callable(value):
        full = np.asarray(value(coords))  # (ndofs, gdim) values at each dof coord
        return full[np.arange(dofs.size), comp]
    vec = np.asarray(_as_vector(value, gdim))
    return vec[comp]


def _scalar_values(coords: np.ndarray, value) -> np.ndarray:
    if callable(value):
        return np.asarray(value(coords), dtype=np.float64).ravel()
    return np.full(coords.shape[0], float(value))


# ---------------------------------------------------------------------------
# Periodic constraints (parity: FEM/bcs.py:198-304)
# ---------------------------------------------------------------------------


def compute_periodic_dof_pairs(
    space,
    mesh: Mesh,
    from_marker: int,
    to_marker: int,
    tolerance: float = 1e-8,
) -> tuple[np.ndarray, np.ndarray]:
    """Match DOFs on the 'to' boundary to translated 'from' DOFs.

    Returns (to_dofs, from_dofs) blocked-DOF arrays in the space's own
    layout (caller offsets into the mixed layout).  Matching is by
    nearest translated coordinate with a hard tolerance, like
    ``FEM/bcs.py:198-250`` but vectorized over all pairs.
    """
    facets_from = facets_with_marker(mesh, from_marker)
    facets_to = facets_with_marker(mesh, to_marker)
    from_nodes = space.nodes_on_facets(facets_from)
    to_nodes = space.nodes_on_facets(facets_to)
    if from_nodes.size == 0 or to_nodes.size == 0:
        raise ValueError(
            f"No DOFs found on facets for markers {from_marker} or {to_marker}"
        )
    fc = space.node_coords[from_nodes]
    tc = space.node_coords[to_nodes]
    translation = tc.mean(axis=0) - fc.mean(axis=0)
    shifted = fc + translation
    d2 = ((tc[:, None, :] - shifted[None, :, :]) ** 2).sum(-1)
    nearest = d2.argmin(axis=1)
    dist = np.sqrt(d2[np.arange(to_nodes.size), nearest])
    if (dist > tolerance).any():
        bad = dist.max()
        raise ValueError(
            f"Could not match periodic DOFs: min distance {bad:.3g} exceeds "
            f"tolerance {tolerance}"
        )
    to_n, from_n = to_nodes, from_nodes[nearest]
    if space.bs == 1:
        return to_n.astype(np.int64), from_n.astype(np.int64)
    comp = np.arange(space.bs, dtype=np.int64)
    to_d = (to_n[:, None] * space.bs + comp).ravel()
    from_d = (from_n[:, None] * space.bs + comp).ravel()
    return to_d, from_d


def apply_periodic_constraints_matrix(
    A: CSRMatrix, pairs: tuple[np.ndarray, np.ndarray]
) -> CSRMatrix:
    """Fold 'to' rows/cols into 'from' and pin 'to' DOFs (diag 1).

    Host-side (scipy) implementation of the reference's post-assembly
    folding (``FEM/bcs.py:253-304``), expressed as the congruence
    P^T A P with the identification map P, then pinning.  Periodic
    setup is per-problem preprocessing, not a hot path.
    """
    to_d, from_d = pairs
    n = A.shape[0]
    # identification map P: column j contributes to master(j)
    master = np.arange(n, dtype=np.int64)
    master[to_d] = from_d
    P = sp.csr_matrix((np.ones(n), (np.arange(n), master)), shape=(n, n))
    folded = (P.T @ A.to_scipy() @ P).tolil()
    folded[to_d, :] = 0.0
    folded[:, to_d] = 0.0
    folded[to_d, to_d] = 1.0
    return CSRMatrix.from_scipy(folded.tocsr())


def apply_periodic_constraints_vector(
    b: np.ndarray, pairs: tuple[np.ndarray, np.ndarray]
) -> np.ndarray:
    """Fold 'to' entries into 'from', zero 'to' (``FEM/bcs.py:291-299``)."""
    to_d, from_d = pairs
    out = np.array(b, copy=True)
    np.add.at(out, from_d, out[to_d])
    out[to_d] = 0.0
    return out
