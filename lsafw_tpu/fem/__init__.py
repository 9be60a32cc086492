"""FEM layer: elements, quadrature, spaces, BCs, batched assembly.

TPU-native counterpart of the reference's ``FEM/`` package
(spaces ``FEM/spaces.py``, bcs ``FEM/bcs.py``, assemblers
``FEM/operators.py`` — the assemblers themselves live in
:mod:`lsafw_tpu.models`).
"""

from lsafw_tpu.fem.assembly import AssemblyContext, SpaceContext
from lsafw_tpu.fem.bcs import BoundaryConditions, BoundaryConditionType, define_bcs
from lsafw_tpu.fem.elements import ElementFamily, make_element
from lsafw_tpu.fem.quadrature import quadrature_rule
from lsafw_tpu.fem.spaces import (
    FunctionSpace,
    FunctionSpaces,
    FunctionSpaceType,
    define_spaces,
    make_scalar_space,
    make_vector_space,
)

__all__ = [
    "AssemblyContext",
    "SpaceContext",
    "BoundaryConditions",
    "BoundaryConditionType",
    "define_bcs",
    "ElementFamily",
    "make_element",
    "quadrature_rule",
    "FunctionSpace",
    "FunctionSpaces",
    "FunctionSpaceType",
    "define_spaces",
    "make_scalar_space",
    "make_vector_space",
]
