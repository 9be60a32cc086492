"""Logging utilities.

Counterpart of the reference's ``lib/loggingutils.py:45-108`` (Rich
console + rank-aware logging).  There are no MPI ranks here — a single
controller process drives the device mesh — so ``log_global`` is the
plain logger and per-device context is carried in messages.
"""

from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Iterator

_FMT = "%(asctime)s %(levelname)-7s %(name)s: %(message)s"


def setup_logging(
    verbose: bool = False,
    *,
    log_file: Path | None = None,
) -> None:
    """Install console (and optional file) handlers on the package root logger."""
    root = logging.getLogger("lsafw_tpu")
    root.setLevel(logging.DEBUG if verbose else logging.INFO)
    root.handlers.clear()
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(logging.Formatter(_FMT))
    root.addHandler(console)
    if log_file is not None:
        log_file.parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FMT))
        root.addHandler(fh)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name if name.startswith("lsafw_tpu") else f"lsafw_tpu.{name}")


def log_global(logger: logging.Logger, level: int, msg: str, *args) -> None:
    """Single-controller equivalent of the reference's rank-0 logging."""
    logger.log(level, msg, *args)


@contextmanager
def timed(logger: logging.Logger, label: str) -> Iterator[dict]:
    """Wall-clock stage timer (the reference's perf_counter_ns stage timers,
    ``.examples/cube.py:31-79``); yields a dict that receives ``seconds``."""
    out: dict = {}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        out["seconds"] = time.perf_counter() - t0
        logger.info("%s took %.3f s", label, out["seconds"])
