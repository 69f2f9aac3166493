"""Cross-molecule energy-parity integration tests.

Taper each molecular Hamiltonian (from the mounted reference test data) and
check the reduced spectrum still contains the published FCI ground-state
energy to 1e-8 -- the flagship exactness property of tapering, across
chemistry instances of increasing size.
"""
import json
import os

import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QubitSubspaceManager, QubitTapering
from symmer_tpu.utils import exact_gs_energy

HAM_DIR = "/root/reference/tests/hamiltonian_data"

MOLECULES = [
    # (file, n_qubits, expected tapered qubits)
    ("H3+_STO-3G_SINGLET_JW.json", 6, None),
    ("LiH_STO-3G_SINGLET_JW.json", 12, None),
    ("HF_STO-3G_SINGLET_JW.json", 12, None),
    ("H2O_STO-3G_SINGLET_JW.json", 14, None),
    ("BeH2_STO-3G_SINGLET_JW.json", 14, None),
]


def _load(name):
    from ..conftest import load_reference_hamiltonian

    return load_reference_hamiltonian(name)


@pytest.mark.parametrize("name,nq,_", MOLECULES)
def test_tapering_preserves_fci(name, nq, _):
    data = _load(name)
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    assert H.n_qubits == nq
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    hf_array = data["data"]["hf_array"]

    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(hf_array))
    assert H_taper.n_qubits < H.n_qubits
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fci) < 1e-8, f"{name}: {gs} vs {fci}"


# exact energies frozen from the host-float64 path (generated once: LiH/Be
# round 3, HF/H2O/BeH2 round 5); regressions in cleanup/rotation/projection
# numerics surface at the BASELINE.md 1e-10 bar instead of the looser
# published-FCI 1e-8 proxy (reference style: hardcoded constants
# test_qubit_tapering.py:48-50; multi-config CS constants
# test_contextual_subspace.py:37-60)
LIH_TAPERED_GS_EXACT = -7.8827622309719985
BE_CSVQE_3Q_GS_EXACT = -14.389536593826167
CSVQE_3Q_GS_EXACT = {
    "Be_STO-3G_SINGLET_JW.json": BE_CSVQE_3Q_GS_EXACT,
    "HF_STO-3G_SINGLET_JW.json": -98.57548286236913,
    "H2O_STO-3G_SINGLET_JW.json": -74.96895047987964,
    "BeH2_STO-3G_SINGLET_JW.json": -15.567765366038305,
}


def test_lih_tapered_energy_pinned_1e10():
    data = _load("LiH_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - LIH_TAPERED_GS_EXACT) < 1e-10


@pytest.mark.parametrize("name,pinned", sorted(CSVQE_3Q_GS_EXACT.items()))
def test_cs_vqe_energy_pinned_1e10(name, pinned):
    """Full CS-VQE flagship flow (taper -> noncontextual solve -> stabilizer
    selection -> subspace projection) pinned at 1e-10 across four chemistry
    systems -- any numerical drift in ANY stage of the pipeline lands here."""
    from symmer_tpu import ContextualSubspace

    data = _load(name)
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    qt = QubitTapering(H)
    H_taper = qt.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    cs = ContextualSubspace(H_taper, noncontextual_strategy="SingleSweep_magnitude")
    cs.update_stabilizers(3, strategy="aux_preserving")
    H_cs = cs.project_onto_subspace()
    assert H_cs.n_qubits == 3
    gs = exact_gs_energy(H_cs.to_sparse_matrix)[0]
    assert abs(gs - pinned) < 1e-10


@pytest.mark.parametrize("name", ["LiH_STO-3G_SINGLET_JW.json"])
def test_contextual_subspace_error_decay(name):
    data = _load(name)
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QSM = QubitSubspaceManager(H, ref_state=np.asarray(data["data"]["hf_array"]))
    full_taper = QSM._hamiltonian.n_qubits
    errs = []
    for n in [3, full_taper]:
        H_red = QSM.get_reduced_hamiltonian(n)
        errs.append(abs(exact_gs_energy(H_red.to_sparse_matrix)[0] - fci))
    assert errs[-1] < 1e-8           # full tapering exact
    assert errs[0] < 0.05            # 3-qubit CS close to FCI


@pytest.mark.slow
def test_beh2_contextual_subspace_error_decay():
    """BeH2 STO-3G (14 qubits): CS-VQE energy-vs-qubits sweep
    (BASELINE.md lists H2/LiH/BeH2/N2 as the reference CS-VQE configs)."""
    data = _load("BeH2_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QSM = QubitSubspaceManager(H, ref_state=np.asarray(data["data"]["hf_array"]))
    full = QSM._hamiltonian.n_qubits
    errs = []
    for n in [3, 5, full]:
        H_red = QSM.get_reduced_hamiltonian(n)
        errs.append(abs(exact_gs_energy(H_red.to_sparse_matrix)[0] - fci))
    assert errs[-1] < 1e-8           # full tapering exact
    assert errs[0] < 0.1             # small CS close
    assert errs[1] <= errs[0] + 1e-6  # monotone improvement with more qubits


@pytest.mark.slow
def test_h2o_dmrg_auto_reference():
    """14-qubit H2O: auto-reference via the native DMRG (> 12-qubit path)."""
    data = _load("H2O_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    with pytest.warns(UserWarning):
        QSM = QubitSubspaceManager(H)  # no reference given -> DMRG
    H_red = QSM.get_reduced_hamiltonian(4)
    err = abs(exact_gs_energy(H_red.to_sparse_matrix)[0] - fci)
    assert err < 0.1


def test_tapering_bravyi_kitaev_encoding():
    """Tapering is encoding-agnostic: Be under the BK mapping."""
    data = _load("Be_STO-3G_SINGLET_BK.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fci) < 1e-8


@pytest.mark.slow
def test_n2_tapering_and_contextual_subspace():
    """N2 STO-3G (20 qubits, 2,239 terms): BASELINE.md north-star config."""
    data = _load("N2_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fci) < 1e-8
    # contextual subspace on the tapered operator
    from symmer_tpu import ContextualSubspace

    CS = ContextualSubspace(
        H_taper,
        noncontextual_strategy="SingleSweep_magnitude",
        reference_state=QT.tapered_ref_state.normalize,
    )
    CC = PauliwordOp.from_dictionary(
        data["data"]["auxiliary_operators"]["UCCSD_operator"]
    )
    CC_taper = QT.taper_it(aux_operator=CC)
    CS.update_stabilizers(8, aux_operator=CC_taper, strategy="aux_preserving")
    H_cs = CS.project_onto_subspace()
    assert H_cs.n_qubits == 8
    err = abs(exact_gs_energy(H_cs.to_sparse_matrix)[0] - fci)
    assert err < 0.05


@pytest.mark.slow
def test_ch2_triplet_tapering():
    """CH2 STO-3G triplet (14 qubits): non-singlet spin sector tapering.

    The stored hf_array does NOT share the FCI ground state's Z2 sector for
    this open-shell system (it selects (+1,+1,+1,+1) while the ground state
    lives in (-1,+1,-1,+1)), so the HF-reference convention cannot recover
    FCI here -- a property of the data, not the method.  The exactness
    statement is that the minimum over all sectors recovers FCI.
    """
    import itertools

    data = _load("CH2_STO-3G_TRIPLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    n = QT.symmetry_generators.n_terms
    best = np.inf
    for sector in itertools.product([1, -1], repeat=n):
        H_red = QT.taper_it(sector=np.array(sector))
        best = min(best, exact_gs_energy(H_red.to_sparse_matrix)[0])
    assert abs(best - fci) < 1e-8


@pytest.mark.slow
def test_mgh2_tapering():
    """MgH2 STO-3G (22 qubits, 3,558 terms): largest reference data set."""
    data = _load("MgH2_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    assert H_taper.n_qubits <= 18
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fci) < 1e-8


@pytest.mark.slow
def test_n2_tapering_preserves_fci():
    """N2 STO-3G (20 qubits, the last of BASELINE.md's H2/LiH/BeH2/N2 CS-VQE
    configs): tapering to 15 qubits preserves the FCI ground energy to the
    1e-10 bar (measured 1.2e-11; exact diag of the tapered operator ~4 min)."""
    data = _load("N2_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    assert H.n_qubits == 20
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    assert H_taper.n_qubits == 15
    gs = exact_gs_energy(H_taper.to_sparse_matrix)[0]
    assert abs(gs - fci) < 1e-10


@pytest.mark.slow
def test_n2_contextual_subspace_flow():
    """N2 CS-VQE flow: projections at 3/5 qubits run end to end and the
    error vs FCI does not increase with subspace size.  (N2 is strongly
    correlated: the noncontextual approximation carries ~0.2 Ha here --
    a property of the method, matching the reference's behaviour for
    SingleSweep extraction, not an implementation artifact.)"""
    from symmer_tpu import ContextualSubspace

    data = _load("N2_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    qt = QubitTapering(H)
    H_taper = qt.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    cs = ContextualSubspace(H_taper, noncontextual_strategy="SingleSweep_magnitude")
    errs = []
    for n in (3, 5):
        cs.update_stabilizers(n, strategy="aux_preserving")
        H_cs = cs.project_onto_subspace()
        assert H_cs.n_qubits == n
        errs.append(abs(exact_gs_energy(H_cs.to_sparse_matrix)[0] - fci))
    assert errs[1] <= errs[0] + 1e-6
    assert errs[0] < 0.3


@pytest.mark.slow
def test_h2o_lanczos_auto_reference(monkeypatch):
    """14-qubit H2O with the device-Lanczos auto-reference band forced on
    (the production route when an accelerator is attached): the reference
    state is the EXACT ground state, so the reduced-Hamiltonian error can
    only improve on the DMRG-reference run above."""
    from symmer_tpu.projection.qubit_subspace_manager import (
        QubitSubspaceManager as QSMcls,
    )

    monkeypatch.setattr(QSMcls, "_device_lanczos_ok", staticmethod(lambda: True))
    data = _load("H2O_STO-3G_SINGLET_JW.json")
    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    with pytest.warns(UserWarning):
        QSM = QSMcls(H)
    H_red = QSM.get_reduced_hamiltonian(4)
    err = abs(exact_gs_energy(H_red.to_sparse_matrix)[0] - fci)
    assert err < 0.1
