"""JAX runtime configuration helpers.

The reference selects real64 vs complex128 at Docker *build* time
(``Dockerfile:7-13``, ``switch_build.sh``).  Here precision is a runtime
dtype choice: f64 is enabled process-wide (TPU emulates f64; tests run
f64 on CPU), and complex quantities are represented as (re, im) pairs
of real arrays (see ``lsafw_tpu.ops.cvec``), killing the dual-build
split by construction.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def setup_jax(*, enable_x64: bool = True, platform: str | None = None) -> None:
    """Configure JAX once, before any tracing.

    Args:
        enable_x64: enable float64/int64 (default True; stability analysis
            needs 1e-8 eigenvalue accuracy, see BASELINE.md).
        platform: force a platform ("cpu", "tpu"); None = auto.
    """
    global _CONFIGURED
    if platform is not None:
        os.environ.setdefault("JAX_PLATFORMS", platform)
    import jax

    if enable_x64:
        jax.config.update("jax_enable_x64", True)
    _CONFIGURED = True


def host_device_count(n: int) -> None:
    """Request ``n`` virtual CPU devices (must run before importing jax).

    Used by tests and ``__graft_entry__.dryrun_multichip`` to validate
    multi-chip sharding without hardware; replaces the reference's
    ``mpirun -n <np>`` test harness (``tests/performance/test_parallel.py``).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
