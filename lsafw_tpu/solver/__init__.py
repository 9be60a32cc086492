"""Solver layer: Krylov methods, direct factorization, Newton,
baseflow driver, eigensolvers.

Counterpart of the reference's ``Solver/`` package (PETSc KSP/SNES,
SLEPc EPS, MUMPS reached through wrappers).
"""

from lsafw_tpu.solver.baseflow import (
    BaseFlowSolver,
    compute_drag,
    compute_recirculation_length,
)
from lsafw_tpu.solver.band import (
    BandedLU,
    BandPlan,
    PivotedBandedLU,
    RealBandedLU,
    RealPivotedBandedLU,
    factor_auto,
    plan_for_csr,
)
from lsafw_tpu.solver.direct import SparseLU, direct_solve
from lsafw_tpu.solver.eigen import (
    EigenSolver,
    EigensolverConfig,
    EpsProblemType,
    EpsWhich,
    STType,
    eigen_residuals,
    krylov_schur,
)
from lsafw_tpu.solver.eigen2 import ArpackEigenSolver, ShiftInvertConfig
from lsafw_tpu.solver.amg import amg_preconditioner, build_amg
from lsafw_tpu.solver.ilu import ilu0, ssor
from lsafw_tpu.solver.linear import (
    KSPType,
    SolveResult,
    bicg,
    bicgstab,
    cg,
    cgs,
    chebyshev,
    fgmres,
    gcr,
    gmres,
    lgmres,
    lsqr,
    minres,
    qcg,
    richardson,
    solve,
    solve_csr,
)
from lsafw_tpu.solver.pmg import PMGPreconditioner, build_pmg_pc
from lsafw_tpu.solver.newton import NewtonResult, NewtonSolver
from lsafw_tpu.solver.precond import PreconditionerType, make_preconditioner

__all__ = [
    "BaseFlowSolver",
    "compute_drag",
    "compute_recirculation_length",
    "SparseLU",
    "direct_solve",
    "BandedLU",
    "BandPlan",
    "PivotedBandedLU",
    "RealBandedLU",
    "RealPivotedBandedLU",
    "factor_auto",
    "plan_for_csr",
    "EigenSolver",
    "EigensolverConfig",
    "EpsProblemType",
    "EpsWhich",
    "STType",
    "eigen_residuals",
    "krylov_schur",
    "ArpackEigenSolver",
    "amg_preconditioner",
    "build_amg",
    "ilu0",
    "ssor",
    "bicg",
    "cgs",
    "gcr",
    "lgmres",
    "lsqr",
    "qcg",
    "ShiftInvertConfig",
    "KSPType",
    "SolveResult",
    "cg",
    "gmres",
    "fgmres",
    "bicgstab",
    "minres",
    "richardson",
    "chebyshev",
    "solve",
    "solve_csr",
    "PMGPreconditioner",
    "build_pmg_pc",
    "NewtonSolver",
    "NewtonResult",
    "PreconditionerType",
    "make_preconditioner",
]
