"""Sparse/complex/native operator layer.

Counterpart of the reference's PETSc wrapper layer
(``FEM/utils.py``): sparse containers (:mod:`.sparse`), complex-pair
linear algebra (:mod:`.cvec`), matrix-free element operators
(:mod:`.elementop`), Pallas kernels (:mod:`.kernels`) and C++ native
bindings (:mod:`.native`).
"""

from lsafw_tpu.ops.bcsr import BCSROperator, BCSRPairOperator, BCSRPlan
from lsafw_tpu.ops.cvec import CVec, caxpy, cdot, cnorm, cscale
from lsafw_tpu.ops.elementop import ElementOperator, element_operator_from_context
from lsafw_tpu.ops.sparse import (
    CSRMatrix,
    PatternDev,
    SparsityPattern,
    assemble_csr_data,
    build_sparsity,
    spmv,
    spmv_pair,
)

__all__ = [
    "BCSROperator",
    "BCSRPairOperator",
    "BCSRPlan",
    "CSRMatrix",
    "PatternDev",
    "SparsityPattern",
    "assemble_csr_data",
    "build_sparsity",
    "spmv",
    "spmv_pair",
    "CVec",
    "cdot",
    "cnorm",
    "cscale",
    "caxpy",
    "ElementOperator",
    "element_operator_from_context",
]
