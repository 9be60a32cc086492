"""Stage-instrumented scaling harness.

Counterpart of ``tests/performance/test_parallel.py``: the reference
sweeps ``mpirun -n {1..12}`` over ``.examples/cube.py`` with psutil RSS
sampling; here the sweep is over virtual CPU device counts with peak
RSS from ``resource``.  Appends one CSV row per run to
``tests/performance/data/scaling.csv``.

Opt in with ``-m perf`` (excluded from the default suite: subprocess
sweeps are minutes-long).
"""

from __future__ import annotations

import csv
import json
import os
import resource
import subprocess
import sys
import time
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[2]
DATA = Path(__file__).parent / "data"


def run_cube(n_devices: int, cube_n: int = 6) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["CUBE_N"] = str(cube_n)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, str(ROOT / "examples" / "cube.py")],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    stats["wall"] = time.time() - t0
    stats["n_devices"] = n_devices
    stats["max_rss_mb"] = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
    return stats


@pytest.mark.perf
@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_cube_scaling(n_devices):
    stats = run_cube(n_devices)
    assert stats["n_dofs"] > 0
    assert stats["total"] > 0
    DATA.mkdir(exist_ok=True)
    path = DATA / "scaling.csv"
    write_header = not path.exists()
    with path.open("a", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=sorted(stats.keys()))
        if write_header:
            w.writeheader()
        w.writerow(stats)
