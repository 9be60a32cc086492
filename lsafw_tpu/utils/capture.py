"""fd-level capture of native-library output.

Counterpart of ``lib/gmshutils.py:20-57`` (dup2 capture of the C
layer's stdout/stderr, re-emitted through the logger): used around
native components (the C++ sparsity builder, XLA's verbose dumps) that
write directly to the process file descriptors.
"""

from __future__ import annotations

import logging
import os
import tempfile
from contextlib import contextmanager
from typing import Iterator

from lsafw_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@contextmanager
def capture_c_streams(
    target_logger: logging.Logger | None = None, level: int = logging.DEBUG
) -> Iterator[None]:
    """Redirect fd 1/2 into a temp file for the duration of the block
    and re-emit captured lines through the logger."""
    target = target_logger or logger
    saved_out = os.dup(1)
    saved_err = os.dup(2)
    with tempfile.TemporaryFile(mode="w+b") as tmp:
        try:
            os.dup2(tmp.fileno(), 1)
            os.dup2(tmp.fileno(), 2)
            yield
        finally:
            os.dup2(saved_out, 1)
            os.dup2(saved_err, 2)
            os.close(saved_out)
            os.close(saved_err)
            tmp.seek(0)
            for line in tmp.read().decode(errors="replace").splitlines():
                if line.strip():
                    target.log(level, "[captured] %s", line)
