"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Replaces the reference's ``mpirun -n <np>`` distributed-test model
(SURVEY.md section 4): multi-device behavior is exercised on XLA
virtual host devices, no hardware needed.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
