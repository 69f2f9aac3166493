"""QubitSubspaceManager tests (modeled on symmer test_qubit_subspace_manager.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QubitSubspaceManager
from symmer_tpu.utils import exact_gs_energy


@pytest.fixture(scope="module")
def be(request):
    from ..conftest import load_reference_hamiltonian

    return load_reference_hamiltonian("Be_STO-3G_SINGLET_JW.json")


def test_qubit_counts_and_error_decay(be):
    H = PauliwordOp.from_dictionary(be["hamiltonian"])
    fci = be["data"]["calculated_properties"]["FCI"]["energy"]
    QSM = QubitSubspaceManager(H, ref_state=be["data"]["hf_array"])
    errs = []
    for n in [2, 3, 4, 5]:
        H_red = QSM.get_reduced_hamiltonian(n)
        assert H_red.n_qubits == n
        errs.append(abs(exact_gs_energy(H_red.to_sparse_matrix)[0] - fci))
    assert all(e1 >= e2 - 1e-10 for e1, e2 in zip(errs, errs[1:]))
    assert errs[-1] < 1e-10  # full tapering is exact


def test_partial_tapering(be):
    H = PauliwordOp.from_dictionary(be["hamiltonian"])
    QSM = QubitSubspaceManager(H, ref_state=be["data"]["hf_array"])
    H_red = QSM.get_reduced_hamiltonian(7)
    assert H_red.n_qubits == 7


def test_over_requesting_returns_full(be):
    H = PauliwordOp.from_dictionary(be["hamiltonian"])
    QSM = QubitSubspaceManager(H, ref_state=be["data"]["hf_array"])
    with pytest.warns(UserWarning):
        H_red = QSM.get_reduced_hamiltonian(H.n_qubits + 1)
    assert H_red.n_qubits == H.n_qubits


def test_auto_reference_state(be):
    H = PauliwordOp.from_dictionary(be["hamiltonian"])
    fci = be["data"]["calculated_properties"]["FCI"]["energy"]
    with pytest.warns(UserWarning):
        QSM = QubitSubspaceManager(H)  # exact diag reference (<=12 qubits)
    H_red = QSM.get_reduced_hamiltonian(3)
    assert abs(exact_gs_energy(H_red.to_sparse_matrix)[0] - fci) < 0.05


def test_project_auxiliary_operator(be):
    H = PauliwordOp.from_dictionary(be["hamiltonian"])
    CC = PauliwordOp.from_dictionary(be["data"]["auxiliary_operators"]["UCCSD_operator"])
    QSM = QubitSubspaceManager(H, ref_state=be["data"]["hf_array"])
    QSM.get_reduced_hamiltonian(3)
    CC_red = QSM.project_auxiliary_operator(CC)
    assert CC_red.n_qubits == 3
