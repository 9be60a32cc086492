"""Solve the EVP on pre-assembled (A, M) and write the leading sigma.

Counterpart of the reference's ``.examples/single_eigenvalue.py``:
load matrices previously exported by ``python -m lsafw_tpu.cli
assemble`` (``A.mtx``/``M.mtx``), solve for the eigenpair closest to a
shift-invert target, export the eigenvector and write sigma to disk.
The reference needs its complex PETSc build for this step; here
complex is a data layout, same process.

Usage:
    python examples/single_eigenvalue.py --matdir out/ \
        --target 0.018 0.738 [--out sigma.txt]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--matdir", type=Path, required=True,
                    help="directory containing A.mtx and M.mtx")
    ap.add_argument("--target", nargs=2, type=float, default=(0.018, 0.738),
                    metavar=("RE", "IM"))
    ap.add_argument("--out", type=Path, default=Path("sigma.txt"))
    ap.add_argument("--nev", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    from lsafw_tpu.io import export_eigenvector, import_matrix
    from lsafw_tpu.solver.eigen import (
        EigenSolver,
        EigensolverConfig,
        STType,
        eigen_residuals,
    )
    from lsafw_tpu.utils.logging import setup_logging

    setup_logging(verbose=True)
    A = import_matrix(args.matdir / "A.mtx")
    M = import_matrix(args.matdir / "M.mtx")
    target = complex(args.target[0], args.target[1])

    es = EigenSolver(
        A, M, EigensolverConfig(num_eig=args.nev, atol=1e-9, ncv=40))
    es.set_st_type(STType.SINVERT)
    es.set_target(target)
    pairs = es.solve()
    resid = eigen_residuals(A, M, pairs)
    sigma, vec = min(
        ((p[0], p[1]) for p in pairs), key=lambda p: abs(p[0] - target))
    print(f"sigma = {sigma.real:+.6f}{sigma.imag:+.6f}j  "
          f"(residual {float(np.max(resid)):.2e})")

    args.out.write_text(f"{sigma.real:+.12e}{sigma.imag:+.12e}j\n")
    export_eigenvector(np.asarray(vec), args.out.with_suffix(".vec.npz"))
    print(f"wrote {args.out} and {args.out.with_suffix('.vec.npz')}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
