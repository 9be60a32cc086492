"""Multi-chip scale-out over a jax.sharding device mesh.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md section 2.3: dolfinx cell partitioning + PETSc row-distributed
matrices + allreduce dot products): here the DOF axis is sharded over a
1D device mesh and XLA's GSPMD partitioner inserts the collectives —
gathers for SpMV column accesses (the halo exchange), psums for dot
products and norms (the MPI allreduces inside PETSc).

Because every solver in :mod:`lsafw_tpu.solver` is pure jnp array code,
*the same functions* run sharded when their operands carry shardings —
no separate distributed implementation to maintain.
"""

from lsafw_tpu.parallel.sharded import (
    ShardedOperator,
    device_mesh,
    shard_csr,
    shard_vector,
    sharded_eigensolve,
    sharded_si_eigensolve,
    sharded_solve,
)
from lsafw_tpu.parallel.partition import partition_cells
from lsafw_tpu.parallel.launch import (
    global_mesh,
    initialize_distributed,
    is_rank0,
)

__all__ = [
    "device_mesh",
    "shard_vector",
    "shard_csr",
    "ShardedOperator",
    "sharded_solve",
    "sharded_eigensolve",
    "sharded_si_eigensolve",
    "partition_cells",
    "initialize_distributed",
    "global_mesh",
    "is_rank0",
]
