"""Physics operators: the assembler layer of the framework.

Counterpart of ``FEM/operators.py`` (flow) and
``Elasticity/operators.py`` (solid) plus the membrane benchmark
operator; each module composes the batched element kernels of
:mod:`lsafw_tpu.fem.assembly` into discrete operators.
"""

from lsafw_tpu.models.elasticity import ElasticityEigenAssembler
from lsafw_tpu.models.membrane import analytic_eigenvalues, assemble_membrane_evp
from lsafw_tpu.models.navier_stokes import (
    LinearizedNavierStokesAssembler,
    StationaryNavierStokesAssembler,
    StokesAssembler,
    linearized_ns_elements,
    mass_elements,
    ns_residual_elements,
    stokes_elements,
)

__all__ = [
    "StokesAssembler",
    "StationaryNavierStokesAssembler",
    "LinearizedNavierStokesAssembler",
    "ElasticityEigenAssembler",
    "assemble_membrane_evp",
    "analytic_eigenvalues",
    "linearized_ns_elements",
    "mass_elements",
    "ns_residual_elements",
    "stokes_elements",
]
