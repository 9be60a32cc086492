"""Multigrid V-cycle quality + MG-preconditioned eigensolve."""

import jax
import jax.numpy as jnp
import numpy as np

from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.models.membrane import analytic_eigenvalues, assemble_membrane_evp
from lsafw_tpu.ops.stencil import build_stencil_operator
from lsafw_tpu.solver.multigrid import build_multigrid_pc
from lsafw_tpu.solver.power import lobpcg_smallest_pc


def _setup(nx=32, ny=64):
    mesh = rectangle_mesh((0, 0), (2.0, 4.0), nx, ny)
    K, M, mask = assemble_membrane_evp(mesh)
    pc = build_multigrid_pc(mesh, K, mask)
    from lsafw_tpu.fem.spaces import make_scalar_space

    space = make_scalar_space(mesh, "p2")
    Mop = build_stencil_operator(K.pattern, np.asarray(M.data), [(space, 1)],
                                 bc_mask=mask, bc_diag=0.0)
    return mesh, K, M, mask, pc, Mop


def test_vcycle_contracts_error():
    """One V-cycle must reduce the error of K x = b substantially."""
    mesh, K, M, mask, pc, _ = _setup(16, 32)
    rng = np.random.default_rng(0)
    n = K.shape[0]
    x_true = np.where(mask, 0.0, rng.standard_normal(n))
    xp_true = pc.op2.pack(jnp.asarray(x_true))
    b = pc.op2.matvec(xp_true)
    # iterate x <- x + V(b - K x): measure contraction factor
    x = jnp.zeros_like(b)
    errs = []
    for _ in range(6):
        x = x + pc.apply(b - pc.op2.matvec(x))
        errs.append(float(jnp.linalg.norm(x - xp_true) / jnp.linalg.norm(xp_true)))
    # average contraction per cycle well below 0.5
    rho = (errs[-1] / errs[0]) ** (1 / 5)
    assert rho < 0.5, (errs, rho)
    assert errs[-1] < 5e-4


def test_mg_lobpcg_membrane():
    mesh, K, M, mask, pc, Mop = _setup(32, 64)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(np.where(mask, 0.0, rng.standard_normal(K.shape[0])))
    x0 = pc.op2.pack(x0)
    res = lobpcg_smallest_pc(pc.op2, Mop, x0, pc, tol=1e-10, max_iter=100)
    exact = analytic_eigenvalues(2.0, 4.0, 1)[0]
    lam = float(res.eigenvalue)
    assert abs(lam - exact) / exact < 1e-5, (lam, exact)
    # MG preconditioning keeps the iteration count mesh-independent-ish
    assert int(res.iterations) < 60, int(res.iterations)
