"""CLI baseflow/assemble/sensitivity subcommands end-to-end on a tiny case."""

import numpy as np
import pytest

from lsafw_tpu.cli import main


@pytest.fixture(scope="module")
def configs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    (d / "facets.toml").write_text(
        """
[[FaceTag]]
marker = 1
when = { axis = "x", equals = 0.0 }
[[FaceTag]]
marker = 2
when = { axis = "x", equals = 1.0 }
[[FaceTag]]
marker = 3
otherwise = true
"""
    )
    (d / "bcs.toml").write_text(
        """
[[BC]]
marker = 1
type = "dirichlet_velocity"
value = [1.0, 0.0]
[[BC]]
marker = 3
type = "dirichlet_velocity"
value = [0.0, 0.0]
[[BC]]
marker = 2
type = "dirichlet_pressure"
value = 0.0
"""
    )
    (d / "bcs_pert.toml").write_text(
        """
[[BC]]
marker = 1
type = "dirichlet_velocity"
value = [0.0, 0.0]
[[BC]]
marker = 3
type = "dirichlet_velocity"
value = [0.0, 0.0]
"""
    )
    return d


def _case_args(configs):
    return [
        "--shape", "unit_square", "--n", "6", "6",
        "--facet-config", str(configs / "facets.toml"),
        "--bc-config", str(configs / "bcs.toml"),
    ]


def test_cli_baseflow(configs, tmp_path):
    rc = main([
        "baseflow", *_case_args(configs),
        "--re", "20", "--steps", "2", "--ramp", "--tol", "1e-8",
        "--outdir", str(tmp_path), "--key", "bf",
    ])
    assert rc == 0
    assert (tmp_path / "bf_npz.npz").exists()


def test_cli_assemble_then_eigen(configs, tmp_path):
    rc = main([
        "assemble", *_case_args(configs),
        "--perturbation-bc-config", str(configs / "bcs_pert.toml"),
        "--re", "20", "--outdir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "A.mtx").exists() and (tmp_path / "M.mtx").exists()
    rc = main([
        "eigen", "--matdir", str(tmp_path), "--target=-0.5+0.5j",
        "--num-eig", "2", "--ncv", "20", "--outdir", str(tmp_path / "modes"),
    ])
    assert rc == 0
    assert (tmp_path / "modes" / "eigenvalues.json").exists()


def test_cli_sensitivity(configs):
    rc = main([
        "sensitivity", *_case_args(configs),
        "--re", "20", "--target=-0.5+0.5j", "--tol", "1e-8",
    ])
    assert rc == 0


def test_cli_resolvent(configs, tmp_path):
    import json

    rc = main([
        "resolvent", *_case_args(configs),
        "--perturbation-bc-config", str(configs / "bcs_pert.toml"),
        "--re", "20", "--omega", "0.8", "--k", "2",
        "--outdir", str(tmp_path),
    ])
    assert rc == 0
    rows = json.loads((tmp_path / "resolvent_gains.json").read_text())
    assert len(rows) == 1 and len(rows[0]["gains"]) == 2
    assert rows[0]["gains"][0] >= rows[0]["gains"][1] > 0


def test_cli_transient(configs, tmp_path):
    import json

    rc = main([
        "transient", *_case_args(configs),
        "--perturbation-bc-config", str(configs / "bcs_pert.toml"),
        "--re", "20", "--horizons", "1.0", "2.0", "--n-steps", "8",
        "--outdir", str(tmp_path),
    ])
    assert rc == 0
    rows = json.loads((tmp_path / "transient_gains.json").read_text())
    assert len(rows) == 2 and all(r["gains"][0] > 0 for r in rows)


def test_cli_scm(configs, tmp_path):
    """SCM on a stable case: returns A = 0 immediately and converged."""
    import json

    rc = main([
        "scm", *_case_args(configs),
        "--perturbation-bc-config", str(configs / "bcs_pert.toml"),
        "--re", "20", "--outdir", str(tmp_path),
    ])
    assert rc == 0
    d = json.loads((tmp_path / "scm.json").read_text())
    assert d["converged"] and d["amplitude"] == 0.0
