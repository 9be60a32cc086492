"""NAFEMS FV52 refinement study (VERDICT r3 item 9: tighten the 3% gate).

Consistent ladder (n, nz) = (8,2), (12,3), (16,4) of P2 tetrahedra with
Richardson extrapolation per mode.  Finding (see doc/validation.md):
modes 2-7 converge to <=1% of the NAFEMS targets; mode 1 converges to
~44.2 Hz, 3.6% BELOW the published 45.897 Hz.  The NAFEMS value stems
from thick-PLATE (Mindlin) theory; full 3D elasticity with u_z pinned
over the entire side faces is measurably softer in the fundamental
mode, and the reference's own Q1 32x32x6 hex setup
(/root/reference/Elasticity/.example.py:56-60) lands near the plate
value partly through Q1 shear-locking stiffness cancelling the 3D
softening.  P2 tets do not lock, so the converged 3D answer shows the
modeling difference honestly.

Run:  timeout 5400 python scripts/dev_nafems_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# this image preimports jax with the TPU client before env vars can
# steer it: pin the CPU device explicitly so the study never contends
# for the chip's HBM (conftest.py does the same for the test suite)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests", "benchmark"))
from test_elasticity import NAFEMS_FREQS, build_plate, solve_modes  # noqa: E402

from lsafw_tpu.models.elasticity import ElasticityEigenAssembler  # noqa: E402
from lsafw_tpu.utils.logging import setup_logging  # noqa: E402

setup_logging(verbose=False)

E, NU, RHO = 200e9, 0.3, 8000.0
LADDER = [(8, 2), (12, 3), (16, 4)]

rows = []
for n, nz in LADDER:
    t0 = time.time()
    mesh, space, bcs = build_plate(n, nz)
    asm = ElasticityEigenAssembler(
        space, young_modulus=E, poisson_ratio=NU, density=RHO, bcs=bcs)
    modes, K, M = solve_modes(asm, num=12)
    freqs = [m.fn for m in modes[:7]]
    rel = [abs(f - r) / r for f, r in zip(freqs, NAFEMS_FREQS)]
    rows.append(dict(n=n, nz=nz, ndofs=space.num_dofs, t=time.time() - t0,
                     freqs=freqs, rel=rel))
    print(f"n={n} nz={nz} ndofs={space.num_dofs} t={rows[-1]['t']:.0f}s "
          f"freqs={[f'{f:.3f}' for f in freqs]} "
          f"rel={[f'{r:.4f}' for r in rel]}", flush=True)

# Richardson per mode: f(h) = f_inf + c h^p with h ~ 1/n, fitted on the
# three ladder points
finf = []
for k in range(7):
    f = np.array([r["freqs"][k] for r in rows])
    h = np.array([1.0 / n for n, _ in LADDER])
    # solve for p from the two difference ratios, then extrapolate
    r01, r12 = f[0] - f[1], f[1] - f[2]
    if abs(r12) < 1e-12 or r01 * r12 <= 0:
        finf.append(float(f[-1]))
        continue
    # ratio (h0^p - h1^p)/(h1^p - h2^p) = r01/r12; bisect p in (0.5, 4)
    target = r01 / r12

    def ratio(p):
        return (h[0] ** p - h[1] ** p) / (h[1] ** p - h[2] ** p)

    lo, hi = 0.5, 4.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if (ratio(mid) - target) * (ratio(lo) - target) <= 0:
            hi = mid
        else:
            lo = mid
    p = 0.5 * (lo + hi)
    c = r12 / (h[1] ** p - h[2] ** p)
    finf.append(float(f[2] - c * h[2] ** p))

rel_inf = [abs(f - r) / r for f, r in zip(finf, NAFEMS_FREQS)]
print("Richardson f_inf:", [f"{f:.3f}" for f in finf], flush=True)
print("rel vs NAFEMS:   ", [f"{r:.4f}" for r in rel_inf], flush=True)

out = dict(ladder=rows, f_inf=finf, rel_inf=rel_inf,
           nafems=list(NAFEMS_FREQS))
path = os.path.join(os.path.dirname(__file__), "data", "nafems_study.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path}", flush=True)
