"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Replaces the reference's ``mpirun -n <np>`` distributed-test model
(SURVEY.md section 4): multi-device behavior is exercised on XLA
virtual host devices, no hardware needed.

This image preimports jax at interpreter startup (an ``axon`` TPU
platform hook), so backend env vars are too late here; instead the CPU
backend is initialized lazily with the virtual-device flag and pinned
as the default device.  Tests that build a ``jax.sharding.Mesh`` must
use ``jax.devices("cpu")``.
"""

import os

# must be in the environment before the first jax.devices("cpu") call
# (the CPU client is created lazily and reads XLA_FLAGS then)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
# 8 virtual devices on one physical core: the default 40 s collective-
# rendezvous termination aborts the process when the core is shared
if "collective_call_terminate" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
_cpus = jax.devices("cpu")
assert len(_cpus) == 8, f"expected 8 virtual CPU devices, got {len(_cpus)}"
jax.config.update("jax_default_device", _cpus[0])
