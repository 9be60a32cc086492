"""Sharded stencil matvec over the virtual 8-device mesh.

The stencil formulation is the multi-chip-friendly operator: class
grids shard along axis 0 and the static shifted slices lower to XLA
halo exchanges (collective-permutes) — the ICI-riding analog of the
reference's ghost updates (``Solver/nonlinear2.py:96-107``).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lsafw_tpu.fem.assembly import AssemblyContext
from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.meshing.mesh import rectangle_mesh
from lsafw_tpu.models.navier_stokes import linearized_ns_elements
from lsafw_tpu.ops.sparse import assemble_csr_data
from lsafw_tpu.ops.stencil import build_stencil_operator


def test_sharded_stencil_matches_single_device():
    mesh2 = rectangle_mesh((0.0, 0.0), (1.0, 1.0), 16, 16)
    spaces = define_spaces(mesh2)
    ctx = AssemblyContext.build(spaces)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(spaces.num_dofs) * 0.1)
    data = np.asarray(assemble_csr_data(ctx.pattern_dev, linearized_ns_elements(ctx, w, 25.0)))
    op = build_stencil_operator(ctx.pattern, data, spaces)

    x = jnp.asarray(rng.standard_normal(op.structure.packed_size))
    grids = op.split_grids(x)
    y_ref = [np.asarray(g) for g in op.matvec_grids(grids)]

    devices = jax.devices("cpu")[:8]
    dmesh = Mesh(np.asarray(devices), ("dof",))
    # shard each class grid on axis 0 (pad rows so 8 divides; GSPMD needs
    # divisible shardings on this jax version)
    shardings = []
    grids_pad = []
    pads = []
    for g in grids:
        nx = g.shape[0]
        padn = (-nx) % 8
        grids_pad.append(jnp.pad(g, ((0, padn), (0, 0))))
        pads.append(padn)
        shardings.append(NamedSharding(dmesh, P("dof", None)))
    # rebuild an operator whose structure matches padded grids? Not
    # needed: matvec_grids slices with static shapes per class, so we
    # shard the ORIGINAL grids when divisible; for this 16x16 mesh all
    # class grids have 16 or 17 rows -> use replicated fallback for the
    # indivisible ones (GSPMD still partitions the elementwise work).
    placed = []
    for g in grids:
        if g.shape[0] % 8 == 0:
            placed.append(jax.device_put(g, NamedSharding(dmesh, P("dof", None))))
        else:
            placed.append(jax.device_put(g, NamedSharding(dmesh, P())))

    with dmesh:
        out = jax.jit(lambda op, gs: op.matvec_grids(gs))(op, tuple(placed))
    for a, b in zip(out, y_ref):
        assert np.allclose(np.asarray(a), b, atol=1e-12)
