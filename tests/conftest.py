"""Test configuration.

Tests run on the CPU backend with 8 virtual XLA devices (so the device-kernel
and mesh-sharding paths are exercised without TPU hardware) and float64
enabled (1e-10 energy-parity oracles).

The execution environment may pre-register an eager TPU platform via a
sitecustomize hook (PYTHONPATH), which locks the JAX backend before conftest
runs; in that case we re-exec pytest once with a clean environment.
"""
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Force the CPU backend with 8 virtual devices, even if a sitecustomize hook
# (PYTHONPATH) has already registered an eager TPU platform plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop any backend the sitecustomize hook may have pre-registered
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:  # pragma: no cover
    pass
jax.config.update("jax_enable_x64", True)

import json  # noqa: E402
import warnings  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

warnings.filterwarnings("ignore")

REFERENCE_HAM_DIR = "/root/reference/tests/hamiltonian_data"
# vendored fixtures (tests/data/hamiltonians) make the suite self-contained
# when the reference checkout is not mounted (e.g. CI runners)
VENDORED_HAM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "hamiltonians"
)

# Inline H2 STO-3G JW Hamiltonian fixture with published reference energies
# (numeric constants as in symmer tests/test_projection/test_qubit_tapering.py:8-50)
H2_JW_DICT = {
    "IIII": (-0.05933866442819677 + 0j),
    "IIIZ": (-0.23676939575319134 + 0j),
    "IIZI": (-0.23676939575319134 + 0j),
    "IIZZ": (0.17571274411978302 + 0j),
    "IZII": (0.17579122569046912 + 0j),
    "IZIZ": (0.12223870791335416 + 0j),
    "IZZI": (0.16715312911492025 + 0j),
    "ZIII": (0.17579122569046912 + 0j),
    "ZIIZ": (0.16715312911492025 + 0j),
    "ZIZI": (0.12223870791335416 + 0j),
    "ZZII": (0.17002500620877006 + 0j),
    "XXYY": (-0.044914421201566114 + 0j),
    "XYYX": (0.044914421201566114 + 0j),
    "YXXY": (0.044914421201566114 + 0j),
    "YYXX": (-0.044914421201566114 + 0j),
}
H2_HF_ENERGY = -1.117505831043514
H2_CCSD_ENERGY = -1.1368383583027837
H2_FCI_ENERGY = -1.1368382276023516
H2_HF_ARRAY = [1, 1, 0, 0]


def load_reference_hamiltonian(name: str):
    """Load a molecular Hamiltonian JSON fixture (mounted reference checkout
    preferred, vendored tests/data copy otherwise)."""
    for base in (REFERENCE_HAM_DIR, VENDORED_HAM_DIR):
        path = os.path.join(base, name)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
    pytest.skip(f"hamiltonian data not available: {name}")


@pytest.fixture
def h2_fixture():
    return dict(
        H_dict=H2_JW_DICT,
        hf_energy=H2_HF_ENERGY,
        ccsd_energy=H2_CCSD_ENERGY,
        fci_energy=H2_FCI_ENERGY,
        hf_array=np.array(H2_HF_ARRAY),
    )


@pytest.fixture(scope="session")
def be_fixture():
    data = load_reference_hamiltonian("Be_STO-3G_SINGLET_JW.json")
    return data


# dense Pauli oracle shared across tests
PAULI_MATS = {
    "I": np.eye(2, dtype=complex),
    "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "Z": np.array([[1, 0], [0, -1]], dtype=complex),
}


def dense_pauli(s: str) -> np.ndarray:
    m = np.array([[1]], dtype=complex)
    for ch in s:
        m = np.kron(m, PAULI_MATS[ch])
    return m


def dense_op(op) -> np.ndarray:
    return sum(c * dense_pauli(s) for s, c in op.to_dictionary.items())


@pytest.fixture
def dense_oracle():
    return dense_pauli, dense_op
