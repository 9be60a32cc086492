"""Shared infrastructure: logging, caching, JAX configuration.

TPU-native counterpart of the reference's ``lib/`` layer
(``lib/loggingutils.py``, ``lib/cache.py``).
"""

from lsafw_tpu.utils.jaxconfig import setup_jax
from lsafw_tpu.utils.logging import get_logger, log_global, setup_logging

__all__ = ["setup_jax", "setup_logging", "get_logger", "log_global"]
