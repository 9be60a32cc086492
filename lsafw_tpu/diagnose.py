"""Runtime diagnosis: versions, devices, dtype support.

Counterpart of the reference's ``diagnose_build.py`` (PETSc/SLEPc/
dolfinx versions, real-vs-complex scalar type, arch): here the build
variants to report are the JAX platform, device kinds, x64 support and
whether the device exposes complex dtypes (this framework's complex
layer never needs them, but it is useful to know).
"""

from __future__ import annotations

import sys


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy
    import scipy

    import lsafw_tpu

    print(f"python        : {sys.version.split()[0]}")
    print(f"lsafw_tpu     : {lsafw_tpu.__version__}")
    print(f"jax           : {jax.__version__}")
    print(f"numpy         : {numpy.__version__}")
    print(f"scipy         : {scipy.__version__}")
    print(f"default device: {jax.devices()[0].device_kind} ({jax.default_backend()})")
    print(f"devices       : {[d.device_kind for d in jax.devices()]}")
    try:
        cpus = jax.devices("cpu")
        print(f"cpu devices   : {len(cpus)}")
    except RuntimeError:
        print("cpu devices   : unavailable")
    x = jnp.ones(2, dtype=jnp.float64)
    print(f"float64       : {'ok' if (x + x).dtype == jnp.float64 else 'DOWNCAST'}")
    for dt in ("complex64", "complex128"):
        try:
            z = jnp.ones(2, dtype=dt) * (1 + 1j)
            float(jnp.abs(z).sum())
            print(f"{dt:<14}: ok (native)")
        except Exception:
            print(f"{dt:<14}: unsupported on device -> (re, im) pair layer in use")
    return 0


if __name__ == "__main__":
    sys.exit(main())
