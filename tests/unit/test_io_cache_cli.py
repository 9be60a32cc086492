"""Cache, IO and CLI tests (model: reference cache usage + CLI parity)."""

import json

import numpy as np
import pytest

from lsafw_tpu.fem.spaces import define_spaces
from lsafw_tpu.io import (
    export_eigenvector,
    export_function,
    export_matrix,
    import_eigenvector,
    import_matrix,
    load_function,
)
from lsafw_tpu.meshing.mesh import unit_square
from lsafw_tpu.meshing.tags import mark_boundary_facets
from lsafw_tpu.ops.sparse import CSRMatrix
from lsafw_tpu.utils.cache import CacheStore


def test_cache_roundtrip(tmp_path):
    cache = CacheStore(tmp_path)
    mesh = unit_square(4)
    mark_boundary_facets(mesh, lambda x: np.ones(x.shape[0], dtype=np.int32))
    cache.save_mesh("m", mesh)
    m2 = cache.load_mesh("m")
    assert m2 is not None
    assert np.array_equal(m2.vertices, mesh.vertices)
    assert np.array_equal(m2.cells, mesh.cells)
    assert np.array_equal(m2.facet_tags, mesh.facet_tags)
    assert cache.load_mesh("missing") is None

    arr = np.linspace(0, 1, 17)
    cache.save_array("a", arr)
    assert np.array_equal(cache.load_array("a"), arr)

    import scipy.sparse as sp

    A = CSRMatrix.from_scipy(sp.random(20, 20, 0.3, format="csr", random_state=0))
    cache.save_matrix("A", A)
    A2 = cache.load_matrix("A")
    assert (A2.to_scipy() != A.to_scipy()).nnz == 0


def test_function_export_roundtrip(tmp_path):
    mesh = unit_square(4)
    spaces = define_spaces(mesh)
    w = np.random.default_rng(0).standard_normal(spaces.num_dofs)
    export_function(w, spaces, tmp_path)
    w2 = load_function(tmp_path, spaces)
    assert np.allclose(w, w2)
    # complex roundtrip (kills the reference's real/complex split)
    wc = w + 1j * w[::-1]
    export_function(wc, spaces, tmp_path, name="mode")
    wc2 = load_function(tmp_path, spaces, name="mode")
    assert np.allclose(wc, wc2)
    with pytest.raises(ValueError):
        load_function(tmp_path / "nope", spaces)


def test_matrix_mtx_roundtrip(tmp_path):
    import scipy.sparse as sp

    A = CSRMatrix.from_scipy(sp.random(30, 30, 0.2, format="csr", random_state=1))
    export_matrix(A, tmp_path / "A.mtx")
    A2 = import_matrix(tmp_path / "A.mtx")
    assert abs(A2.to_scipy() - A.to_scipy()).max() < 1e-14


def test_eigenvector_roundtrip(tmp_path):
    v = np.random.default_rng(2).standard_normal(10) + 1j * np.arange(10)
    export_eigenvector(v, tmp_path / "v.npz")
    assert np.allclose(import_eigenvector(tmp_path / "v.npz"), v)


def test_cli_mesh_and_eigen(tmp_path):
    from lsafw_tpu.cli import main

    # mesh generation through the CLI
    rc = main(["mesh", "--shape", "unit_square", "--n", "4", "4"])
    assert rc == 0
    # eigen on exported matrices
    import scipy.sparse as sp

    A = CSRMatrix.from_scipy(sp.csr_matrix(np.diag([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])))
    M = CSRMatrix.from_scipy(sp.csr_matrix(np.eye(6)))
    export_matrix(A, tmp_path / "A.mtx")
    export_matrix(M, tmp_path / "M.mtx")
    rc = main([
        "eigen", "--matdir", str(tmp_path), "--target", "3.1",
        "--num-eig", "2", "--ncv", "5", "--outdir", str(tmp_path / "out"),
    ])
    assert rc == 0
    vals = json.loads((tmp_path / "out" / "eigenvalues.json").read_text())
    got = sorted(v[0] for v in vals)
    assert np.allclose(got, [3.0, 4.0], atol=1e-8)


def test_cli_error_exit():
    from lsafw_tpu.cli import main

    rc = main(["eigen", "--matdir", "/nonexistent"])
    assert rc == 1


def test_xdmf_roundtrip(tmp_path):
    """XDMF/HDF5 export-import round-trip (parity: the reference's
    XDMF persistence, Meshing/core.py:215-262, lib/cache.py:34-91)."""
    import numpy as np

    from lsafw_tpu.io.xdmf import read_xdmf, write_xdmf
    from lsafw_tpu.meshing.mesh import CellType, box_mesh, rectangle_mesh

    for mesh in (
        rectangle_mesh((0, 0), (1, 1), 3, 3),
        rectangle_mesh((0, 0), (1, 1), 3, 3, cell_type=CellType.QUADRILATERAL),
        box_mesh((0, 0, 0), (1, 1, 1), 2, 2, 2, cell_type=CellType.HEXAHEDRON),
    ):
        rng = np.random.default_rng(0)
        pd = {"u": rng.standard_normal((mesh.num_vertices, mesh.gdim)),
              "p": rng.standard_normal(mesh.num_vertices)}
        cd = {"marker": np.arange(mesh.num_cells, dtype=np.int32)}
        out = write_xdmf(tmp_path / f"m_{mesh.cell_type.value}", mesh,
                         point_data=pd, cell_data=cd)
        assert out.exists() and out.with_suffix(".h5").exists()
        m2, pd2, cd2 = read_xdmf(out)
        assert m2.cell_type is mesh.cell_type
        assert np.allclose(m2.vertices, mesh.vertices)
        assert np.array_equal(m2.cells, mesh.cells)
        assert np.allclose(pd2["u"], pd["u"]) and np.allclose(pd2["p"], pd["p"])
        assert np.array_equal(cd2["marker"], cd["marker"])


def test_cli_mesh_import_export_roundtrip(tmp_path):
    """CLI mesh export -> import parity (reference's
    ``python -m Meshing {generate,import}``, Meshing/cli.py:62-121)."""
    from lsafw_tpu.cli import main

    msh = tmp_path / "m.msh"
    rc = main(["mesh", "--shape", "unit_square", "--n", "4", "4",
               "--export", str(msh)])
    assert rc == 0 and msh.exists()
    png = tmp_path / "m.png"
    rc = main(["mesh", "--from-file", str(msh), "--plot", str(png)])
    assert rc == 0 and png.exists()


def test_cli_benchmark_geometry(tmp_path):
    """CLI benchmark generation (reference's ``python -m Meshing
    benchmark``, Meshing/cli.py:124-153)."""
    from lsafw_tpu.cli import main

    cfg = "config_files/2D/cylinder/geometry_small.toml"
    facets = "config_files/2D/cylinder/facets_small.toml"
    out = tmp_path / "bench.msh"
    rc = main(["benchmark", "--geometry", "cylinder_flow",
               "--config", cfg, "--facet-config", facets,
               "--export", str(out)])
    assert rc == 0 and out.exists()
