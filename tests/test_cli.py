"""CLI smoke tests (the reference's CLI is broken; ours must work)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from .conftest import H2_JW_DICT, _REPO_ROOT


@pytest.fixture
def h2_json(tmp_path):
    path = tmp_path / "h2.json"
    with open(path, "w") as f:
        json.dump({k: [v.real, v.imag] for k, v in H2_JW_DICT.items()}, f)
    return str(path)


def _run_cli(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["SYMMER_TPU_X64"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "symmer_tpu.command_line", *args],
        capture_output=True, text=True, env=env, timeout=300,
    )


def test_cli_taper(h2_json, tmp_path):
    out = _run_cli(
        ["taper", "-H", h2_json, "--taper-reference", "1,1,0,0",
         "-o", str(tmp_path), "--exact-energies"]
    )
    assert out.returncode == 0, out.stderr
    files = [f for f in os.listdir(tmp_path) if f.startswith("taper_")]
    assert len(files) == 1
    with open(tmp_path / files[0]) as f:
        result = json.load(f)
    assert result["n_qubits_after"] == 1
    assert abs(result["gs_energy_before"] - result["gs_energy_after"]) < 1e-10


def test_cli_reduce_stdout(h2_json):
    out = _run_cli(["reduce", "-H", h2_json, "--taper-reference", "1,1,0,0",
                    "--n-qubits", "1"])
    assert out.returncode == 0, out.stderr
    result = json.loads(out.stdout)
    assert result["n_qubits_after"] == 1


def test_cli_missing_args(h2_json):
    out = _run_cli(["taper"])
    assert out.returncode != 0


def test_cli_vqe(h2_json):
    """End-to-end taper + ADAPT-VQE (device backend) from the CLI."""
    out = _run_cli([
        "vqe", "-H", h2_json, "--taper-reference", "1,1,0,0",
        "--exact-energies", "--max-cycles", "4",
    ])
    assert out.returncode == 0, out.stderr
    result = json.loads(out.stdout)
    assert result["n_qubits_after_taper"] == 1
    assert abs(result["vqe_error"]) < 1e-6
    assert result["n_excitations"] >= 1


def test_cli_vqe_random_pool(h2_json):
    out = _run_cli([
        "vqe", "-H", h2_json, "--taper-reference", "1,1,0,0",
        "--pool", "random", "--pool-size", "6", "--max-cycles", "3",
    ])
    assert out.returncode == 0, out.stderr
    result = json.loads(out.stdout)
    assert "vqe_energy" in result


def test_reference_cli_compat_names(tmp_path):
    import argparse

    from symmer_tpu.command_line import (
        check_path_to_dir,
        check_path_to_file,
        cli,
        command_interface,
    )

    assert command_interface is cli
    f = tmp_path / "x.json"
    f.write_text("{}")
    assert check_path_to_dir(str(tmp_path)) == str(tmp_path)
    assert check_path_to_file(str(f)) == str(f)
    with pytest.raises(argparse.ArgumentTypeError):
        check_path_to_dir(str(f))
    with pytest.raises(argparse.ArgumentTypeError):
        check_path_to_file(str(tmp_path))
