"""Vibrating-membrane benchmark: Laplacian Dirichlet eigenproblem.

K v = lambda M v on a rectangle with homogeneous Dirichlet BCs,
validated against lambda_mn = pi^2 (m^2/a^2 + n^2/b^2)
(parity: ``tests/benchmark/vibrating_membrane.py:130-141`` and the
O(h^4) P2 convergence study at ``:203-266``).
"""

from __future__ import annotations

import numpy as np

from lsafw_tpu.fem.assembly import (
    SpaceContext,
    dirichlet_matrix_data,
    mass_scalar,
    stiffness_scalar,
)
from lsafw_tpu.fem.elements import ElementFamily
from lsafw_tpu.fem.spaces import make_scalar_space
from lsafw_tpu.meshing.mesh import Mesh
from lsafw_tpu.ops.sparse import CSRMatrix

import jax.numpy as jnp


def assemble_membrane_evp(
    mesh: Mesh, family: ElementFamily | str = ElementFamily.P2
) -> tuple[CSRMatrix, CSRMatrix, np.ndarray]:
    """Assemble (K, M, bc_mask) for the membrane EVP.

    Dirichlet rows get diag 1 in K and diag 0 in M, so spurious
    boundary modes sit at infinity instead of the reference's
    lambda = 1 cluster (``vibrating_membrane.py:169-173``).
    """
    space = make_scalar_space(mesh, family)
    ctx = SpaceContext.build(space)
    bc_nodes = space.nodes_on_facets(mesh.boundary_facets)
    mask = np.zeros(space.num_dofs, dtype=bool)
    mask[bc_nodes] = True
    mask_j = jnp.asarray(mask)
    K = CSRMatrix(
        ctx.pattern,
        dirichlet_matrix_data(ctx.pattern, ctx.scatter(stiffness_scalar(ctx)).data, mask_j, 1.0),
    )
    M = CSRMatrix(
        ctx.pattern,
        dirichlet_matrix_data(ctx.pattern, ctx.scatter(mass_scalar(ctx)).data, mask_j, 0.0),
    )
    return K, M, mask


def analytic_eigenvalues(a: float, b: float, count: int) -> np.ndarray:
    """First ``count`` analytic membrane eigenvalues, ascending
    (``vibrating_membrane.py:130-141``)."""
    vals = []
    kmax = int(np.ceil(np.sqrt(count) * 4)) + 4
    for m in range(1, kmax):
        for n in range(1, kmax):
            vals.append(np.pi**2 * (m**2 / a**2 + n**2 / b**2))
    return np.sort(np.asarray(vals))[:count]


def analytic_eigenvalues_3d(a: float, b: float, c: float, count: int) -> np.ndarray:
    """First ``count`` analytic Dirichlet-Laplacian eigenvalues of the
    (a, b, c) box, ascending: pi^2 (l^2/a^2 + m^2/b^2 + n^2/c^2)."""
    vals = []
    kmax = int(np.ceil(count ** (1 / 3) * 4)) + 4
    for l in range(1, kmax):
        for m in range(1, kmax):
            for n in range(1, kmax):
                vals.append(np.pi**2 * (l**2 / a**2 + m**2 / b**2 + n**2 / c**2))
    return np.sort(np.asarray(vals))[:count]
