"""Aggregate the scaling CSV into speedup/efficiency plots.

Counterpart of ``tests/performance/test_parallel_postprocess.py``
(pandas aggregation -> mpi_speedup/efficiency/time/rss plots): reads
``data/scaling.csv`` produced by the harness and writes the same plot
family for the virtual-device sweep.

Usage: python tests/performance/postprocess.py
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

DATA = Path(__file__).parent / "data"


def main() -> int:
    path = DATA / "scaling.csv"
    if not path.exists():
        print(f"no data at {path}; run: pytest tests/performance -m perf", file=sys.stderr)
        return 1
    rows = list(csv.DictReader(path.open()))
    by_n: dict[int, list[dict]] = defaultdict(list)
    for r in rows:
        by_n[int(r["n_devices"])].append(r)
    ns = sorted(by_n)
    stages = ["mesh", "spaces", "bcs", "baseflow", "assembly", "total"]
    mean = {
        s: np.array([np.mean([float(r[s]) for r in by_n[n]]) for n in ns])
        for s in stages
    }
    rss = np.array([np.mean([float(r["max_rss_mb"]) for r in by_n[n]]) for n in ns])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t1 = mean["total"][0]
    speedup = t1 / mean["total"]
    eff = speedup / np.array(ns)

    for name, ys, ylabel in [
        ("speedup", speedup, "speedup vs 1 device"),
        ("efficiency", eff, "parallel efficiency"),
        ("time", mean["total"], "total time [s]"),
        ("rss", rss, "peak RSS [MB]"),
    ]:
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(ns, ys, "o-")
        if name == "speedup":
            ax.plot(ns, ns, "--", color="0.6", label="ideal")
            ax.legend()
        ax.set_xlabel("virtual devices")
        ax.set_ylabel(ylabel)
        ax.grid(alpha=0.3)
        fig.savefig(DATA / f"scaling_{name}.png", dpi=150, bbox_inches="tight")
        plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 4))
    for s in stages[:-1]:
        ax.plot(ns, mean[s], "o-", label=s)
    ax.set_xlabel("virtual devices")
    ax.set_ylabel("stage time [s]")
    ax.set_yscale("log")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.savefig(DATA / "scaling_stages.png", dpi=150, bbox_inches="tight")
    print(f"wrote plots to {DATA}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
