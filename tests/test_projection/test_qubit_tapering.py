"""Qubit tapering tests (modeled on symmer tests/test_projection/test_qubit_tapering.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState, QubitTapering
from symmer_tpu.operators import IndependentOp
from symmer_tpu.utils import exact_gs_energy


@pytest.fixture
def h2(h2_fixture):
    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    return H, h2_fixture


def test_init(h2):
    H, fx = h2
    QT = QubitTapering(H)
    assert QT.operator == H
    assert QT.n_taper == 3


def test_symmetry_generators_h2(h2):
    H, fx = h2
    QT = QubitTapering(H)
    G1 = QT.symmetry_generators
    G2 = IndependentOp.from_list(["ZIZI", "IZIZ", "IIZZ"])
    assert np.all(G1.generator_reconstruction(G2)[1])
    assert np.all(G2.generator_reconstruction(G1)[1])


def test_taper_h2_hamiltonian_exact_fci(h2):
    H, fx = h2
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=fx["hf_array"])
    assert H_taper.n_qubits == 1
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fx["fci_energy"]) < 1e-10


def test_taper_via_sector(h2):
    H, fx = h2
    QT = QubitTapering(H)
    QT.stabilizers.update_sector(fx["hf_array"])
    sector = QT.stabilizers.coeff_vec.copy()
    H_taper = QT.taper_it(sector=sector)
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fx["fci_energy"]) < 1e-10


def test_tapered_ref_state_energy(h2):
    H, fx = h2
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=fx["hf_array"])
    hf_full = H.expval(QuantumState(fx["hf_array"].reshape(1, -1), [1]))
    hf_tapered = H_taper.expval(QT.tapered_ref_state.normalize)
    assert abs(hf_full - fx["hf_energy"]) < 1e-10
    assert abs(hf_tapered - fx["hf_energy"]) < 1e-10


def test_taper_aux_operator_consistency(h2):
    """CCSD ansatz tapered consistently reproduces the CCSD energy."""
    from symmer_tpu.evolution import trotter

    H, fx = h2
    CC_dict = {
        "XXXX": (-0.006725473252131252 + 0j), "XXXY": 0.006725473252131252j,
        "XXYX": 0.006725473252131252j, "XXYY": (0.006725473252131252 + 0j),
        "XYXX": -0.006725473252131252j, "XYXY": (-0.006725473252131252 + 0j),
        "XYYX": (-0.006725473252131252 + 0j), "XYYY": 0.006725473252131252j,
        "YXXX": -0.006725473252131252j, "YXXY": (-0.006725473252131252 + 0j),
        "YXYX": (-0.006725473252131252 + 0j), "YXYY": 0.006725473252131252j,
        "YYXX": (0.006725473252131252 + 0j), "YYXY": -0.006725473252131252j,
        "YYYX": -0.006725473252131252j, "YYYY": (-0.006725473252131252 + 0j),
    }
    CC_op = PauliwordOp.from_dictionary(CC_dict)
    hf_state = QuantumState(fx["hf_array"].reshape(1, -1), [1])
    ccsd_state = (trotter(CC_op, trotnum=20) * hf_state).normalize
    e_ccsd_full = H.expval(ccsd_state)
    assert abs(e_ccsd_full - fx["ccsd_energy"]) < 1e-6

    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=fx["hf_array"])
    CC_taper = QT.taper_it(aux_operator=CC_op)
    ccsd_taper = (
        trotter(CC_taper, trotnum=20) * QT.tapered_ref_state.normalize
    ).normalize
    e_ccsd_tap = H_taper.expval(ccsd_taper)
    assert abs(e_ccsd_tap - fx["ccsd_energy"]) < 1e-6


def test_taper_be_sto3g(be_fixture):
    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    fci = be_fixture["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=be_fixture["data"]["hf_array"])
    assert H_taper.n_qubits == 5
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fci) < 1e-10


def test_project_state(h2):
    H, fx = h2
    QT = QubitTapering(H)
    QT.taper_it(ref_state=fx["hf_array"])
    psi = QT.project_state(QuantumState(fx["hf_array"].reshape(1, -1), [1]))
    assert psi.n_qubits == 1
    assert np.isclose(np.linalg.norm(psi._amps), 1)


def test_taper_no_symmetries_returns_unchanged():
    """Regression (review finding): a Hamiltonian with no Z2 symmetries must
    project to itself (reference behavior), not crash on the empty
    stabilizer set."""
    H = PauliwordOp.from_dictionary(
        {"XI": 1.0, "ZI": 0.5, "IX": 0.3, "IZ": 0.2, "YY": 0.1}
    )
    QT = QubitTapering(H)
    assert QT.symmetry_generators.n_terms == 0
    out = QT.taper_it()
    assert out == H.cleanup()


def test_taper_device_resident_matches_host(h2):
    """The device-resident flagship flow (aux_operator=DeviceOperator) must
    reproduce the host taper exactly: full-width planes with zeroed
    stabilized columns on device, column deletion at download."""
    H, fx = h2
    ref = fx["hf_array"]
    qt_host = QubitTapering(H)
    t_host = qt_host.taper_it(ref_state=ref)

    qt_dev = QubitTapering(H)
    t_dev = qt_dev.taper_it(ref_state=ref, aux_operator=H.to_device())
    from symmer_tpu.operators.device_op import DeviceOperator

    assert isinstance(t_dev, DeviceOperator)
    down = t_dev.to_host()
    assert down.n_qubits == t_host.n_qubits
    assert down == t_host
