"""Multi-process / multi-host launch (the ``mpirun -n <np>`` story).

The reference launches every CLI through MPI
(``/root/reference/Meshing/cli.py:26-27``, ``Solver/cli.py:23-24``:
``mpirun -n 4 python -m Meshing ...``).  The TPU-native equivalent is
JAX multi-controller: one Python process per host, each seeing its
local chips, with ``jax.distributed.initialize`` wiring the processes
into one global runtime.  After initialization, ``jax.devices()``
returns the GLOBAL device list and every mesh built from it spans the
pod slice; GSPMD inserts the cross-host collectives (which ride ICI
within a slice and DCN across slices — no program change).

Usage (one command per host, e.g. under SLURM or GKE):

    python -m lsafw_tpu.cli --distributed eigen ...        # CLI flag
    # or programmatically:
    from lsafw_tpu.parallel import initialize_distributed, global_mesh
    initialize_distributed()            # env-driven on TPU pods
    mesh = global_mesh()                # 1D "dof" mesh over all chips

On Cloud TPU pods the coordinator address, process id and process
count are discovered from the TPU metadata/environment automatically
(``jax.distributed.initialize()`` with no arguments); on generic
clusters pass them explicitly or set ``JAX_COORDINATOR_ADDRESS``,
``JAX_PROCESS_ID`` / ``JAX_NUM_PROCESSES``.

Single-controller semantics note: lsafw_tpu keeps all host-side logic
(meshing, planning, Schur bookkeeping) process-replicated — every
process computes identical host values, and device arrays are created
through sharded constructors (``jax.make_array_from_process_local_data``
for per-host input paths).  Logging is rank-0-only via
``utils.logging.setup_logging(rank=process_index())``.
"""

from __future__ import annotations

import os

import jax

from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialize the multi-controller runtime (idempotent).

    With no arguments, uses JAX's automatic discovery (TPU pod metadata
    or the ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` environment).  Returns this process's index.
    Safe to call in single-process runs: if no coordinator is
    configured, it is a no-op returning 0.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index()
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Cloud TPU pods: jax discovers everything from metadata.  Any
        # failure (single host, tunnel stubs in the env) degrades to
        # single-process — the same program runs unchanged.
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            logger.info(
                "No multi-process coordinator (%s); staying single-process.",
                e)
            _INITIALIZED = True
            return 0
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _INITIALIZED = True
    logger.info(
        "Distributed runtime up: process %d/%d, %d global / %d local devices.",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()),
    )
    return jax.process_index()


def global_mesh(axis: str = "dof"):
    """1D mesh over ALL devices of the (possibly multi-host) runtime —
    the drop-in argument for ``parallel.sharded`` constructors."""
    from lsafw_tpu.parallel.sharded import device_mesh

    return device_mesh(jax.devices(), axis=axis)


def is_rank0() -> bool:
    return jax.process_index() == 0
