"""Discontinuous-Galerkin (SIPG) scalar discretization.

The reference's DG ``FunctionSpaceType`` is an unimplemented stub
(``/root/reference/FEM/spaces.py:103-179`` raises); this module goes
beyond parity with a working symmetric interior-penalty Galerkin
(SIPG) discretization of the Laplacian on simplicial meshes — the
standard DG formulation (Arnold 1982):

    a(u, v) = sum_K (grad u, grad v)_K
            - sum_F ({grad u}.n [v] + {grad v}.n [u])_F
            + sum_F (eta / h_F) ([u][v])_F

with boundary faces entering through Nitsche terms (Dirichlet).  P1
basis gradients are constant per cell, so the face integrals reduce to
closed-form edge quadrature — everything assembles as batched array
arithmetic + one segment-sum scatter, like the CG path.

Host assembly (numpy C internals only for indexing; the per-entity
arithmetic is vectorized over all cells/faces at once), device CSR
output.  2D triangles; P1.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from lsafw_tpu.meshing.mesh import CellType, Mesh
from lsafw_tpu.ops.sparse import CSRMatrix


def _cell_geometry(mesh: Mesh):
    v = mesh.vertices[mesh.cells]  # (nc, 3, 2)
    J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)  # (nc,2,2)
    detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    area = 0.5 * np.abs(detJ)
    Jinv = (
        np.stack(
            [
                np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1),
                np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1),
            ],
            axis=1,
        )
        / detJ[:, None, None]
    )
    # P1 reference gradients -> physical: rows of Jinv^T @ gref
    gref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # (3, 2)
    gphys = np.einsum("kd,cde->cke", gref, Jinv)  # (nc, 3, 2)
    return v, area, gphys


def _phi_at(points_ref: np.ndarray) -> np.ndarray:
    """P1 basis at reference points (nq, 2) -> (nq, 3)."""
    x, y = points_ref[:, 0], points_ref[:, 1]
    return np.stack([1 - x - y, x, y], axis=1)


def assemble_dg_poisson(
    mesh: Mesh, *, eta: float = 10.0
) -> tuple[CSRMatrix, CSRMatrix]:
    """Assemble the SIPG stiffness K (with Dirichlet Nitsche boundary
    terms) and the block-diagonal DG mass matrix M over the broken P1
    space (3 DOFs per cell, global id = 3*cell + local)."""
    if mesh.cell_type is not CellType.TRIANGLE:
        raise NotImplementedError("SIPG DG: 2D triangles only.")
    nc = mesh.num_cells
    n = 3 * nc
    verts, area, gphys = _cell_geometry(mesh)

    rows, cols, vals = [], [], []

    # volume: (grad u, grad v) * area — constant gradients
    Ke = np.einsum("cid,cjd->cij", gphys, gphys) * area[:, None, None]
    ci = (3 * np.arange(nc))[:, None, None]
    rr = ci + np.broadcast_to(np.arange(3)[:, None], (nc, 3, 3))
    cc = ci + np.broadcast_to(np.arange(3)[None, :], (nc, 3, 3))
    rows.append(rr.ravel())
    cols.append(cc.ravel())
    vals.append(Ke.ravel())

    # mass: exact P1 mass per cell
    Mref = np.array([[2.0, 1, 1], [1, 2, 1], [1, 1, 2]]) / 12.0
    Me = Mref[None] * area[:, None, None]

    facets = mesh.facets  # (nf, 2) vertex ids
    f2c = mesh.facet_to_cells  # (nf, 2)
    fv = mesh.vertices[facets]  # (nf, 2, 2)
    tvec = fv[:, 1] - fv[:, 0]
    hf = np.linalg.norm(tvec, axis=1)
    nrm = np.stack([tvec[:, 1], -tvec[:, 0]], axis=1) / hf[:, None]

    # orient normals outward from cell 0 (away from its centroid)
    cent0 = verts[f2c[:, 0]].mean(axis=1)
    mid = fv.mean(axis=1)
    flip = np.einsum("fd,fd->f", nrm, mid - cent0) < 0
    nrm[flip] *= -1.0

    # 2-point Gauss on each edge (exact for the [u][v] P1 products)
    gq = np.array([0.5 - 0.5 / np.sqrt(3.0), 0.5 + 0.5 / np.sqrt(3.0)])
    wq = np.array([0.5, 0.5])  # of the unit interval
    pts = fv[:, None, 0, :] + gq[None, :, None] * tvec[:, None, :]  # (nf,2,2)

    def _phi_cell_at(cells_id, pts_f):
        """P1 basis of each cell evaluated at (nf, nq, 2) physical pts."""
        v0 = verts[cells_id][:, 0]  # (nf, 2)
        Jl = np.stack(
            [verts[cells_id][:, 1] - v0, verts[cells_id][:, 2] - v0], axis=2
        )  # (nf, 2, 2)
        det = Jl[:, 0, 0] * Jl[:, 1, 1] - Jl[:, 0, 1] * Jl[:, 1, 0]
        inv = (
            np.stack(
                [
                    np.stack([Jl[:, 1, 1], -Jl[:, 0, 1]], axis=1),
                    np.stack([-Jl[:, 1, 0], Jl[:, 0, 0]], axis=1),
                ],
                axis=1,
            )
            / det[:, None, None]
        )
        ref = np.einsum("fde,fqe->fqd", inv, pts_f - v0[:, None, :])
        return _phi_at(ref.reshape(-1, 2)).reshape(pts_f.shape[0], -1, 3)

    interior = f2c[:, 1] >= 0
    for side_setup in ("interior", "boundary"):
        if side_setup == "interior":
            fsel = np.flatnonzero(interior)
            if fsel.size == 0:
                continue
            cL, cR = f2c[fsel, 0], f2c[fsel, 1]
            phiL = _phi_cell_at(cL, pts[fsel])  # (nf, nq, 3)
            phiR = _phi_cell_at(cR, pts[fsel])
            gnL = np.einsum("fkd,fd->fk", gphys[cL], nrm[fsel])  # (nf, 3)
            gnR = np.einsum("fkd,fd->fk", gphys[cR], nrm[fsel])
            h = hf[fsel]
            w = (wq[None, :] * h[:, None])  # physical weights (nf, nq)

            # jump/average composite basis over 6 dofs: [u] = uL - uR,
            # {grad u}.n = (gnL + gnR)/2 (constant in q)
            jump = np.concatenate([phiL, -phiR], axis=2)  # (nf, nq, 6)
            avg = 0.5 * np.concatenate([gnL, gnR], axis=1)  # (nf, 6)

            pen = (eta / h)[:, None, None]
            Kf = pen * np.einsum("fq,fqi,fqj->fij", w, jump, jump)
            cons = np.einsum("fq,fqi,fj->fij", w, jump, avg)
            Kf -= cons + np.transpose(cons, (0, 2, 1))

            dof = np.concatenate(
                [3 * cL[:, None] + np.arange(3), 3 * cR[:, None] + np.arange(3)],
                axis=1,
            )  # (nf, 6)
            rows.append(np.repeat(dof, 6, axis=1).ravel())
            cols.append(np.tile(dof, (1, 6)).ravel())
            vals.append(Kf.ravel())
        else:
            fsel = np.flatnonzero(~interior)
            if fsel.size == 0:
                continue
            cL = f2c[fsel, 0]
            phiL = _phi_cell_at(cL, pts[fsel])
            gnL = np.einsum("fkd,fd->fk", gphys[cL], nrm[fsel])
            h = hf[fsel]
            w = (wq[None, :] * h[:, None])
            pen = (eta / h)[:, None, None]
            Kf = pen * np.einsum("fq,fqi,fqj->fij", w, phiL, phiL)
            cons = np.einsum("fq,fqi,fj->fij", w, phiL, gnL)
            Kf -= cons + np.transpose(cons, (0, 2, 1))
            dof = 3 * cL[:, None] + np.arange(3)
            rows.append(np.repeat(dof, 3, axis=1).ravel())
            cols.append(np.tile(dof, (1, 3)).ravel())
            vals.append(Kf.ravel())

    K = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    K.sum_duplicates()
    Mrows = rr.ravel()
    Mcols = cc.ravel()
    M = sp.csr_matrix((Me.ravel(), (Mrows, Mcols)), shape=(n, n))
    return CSRMatrix.from_scipy(K), CSRMatrix.from_scipy(M)
