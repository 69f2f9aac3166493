"""Contextual subspace tests (modeled on symmer test_contextual_subspace.py)."""
import numpy as np
import pytest

from symmer_tpu import ContextualSubspace, PauliwordOp, QubitTapering
from symmer_tpu.operators import IndependentOp
from symmer_tpu.utils import exact_gs_energy


@pytest.fixture(scope="module")
def be_tapered():
    from ..conftest import load_reference_hamiltonian

    H_data = load_reference_hamiltonian("Be_STO-3G_SINGLET_JW.json")
    H_op = PauliwordOp.from_dictionary(H_data["hamiltonian"])
    CC_op = PauliwordOp.from_dictionary(
        H_data["data"]["auxiliary_operators"]["UCCSD_operator"]
    )
    QT = QubitTapering(H_op)
    H_taper = QT.taper_it(ref_state=H_data["data"]["hf_array"])
    CC_taper = QT.taper_it(aux_operator=CC_op)
    return dict(
        H_taper=H_taper,
        CC_taper=CC_taper,
        QT=QT,
        hf_energy=H_data["data"]["calculated_properties"]["HF"]["energy"],
        fci_energy=H_data["data"]["calculated_properties"]["FCI"]["energy"],
    )


def test_noncontextual_operator(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"], noncontextual_strategy="SingleSweep_magnitude"
    )
    assert CS.noncontextual_operator.is_noncontextual
    assert not CS.contextual_operator.is_noncontextual


def test_noncontextual_ground_state_is_hf(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"], noncontextual_strategy="SingleSweep_magnitude"
    )
    assert np.isclose(CS.noncontextual_operator.energy, be_tapered["hf_energy"])


def test_manual_stabilizers(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"], noncontextual_strategy="SingleSweep_magnitude"
    )
    G = IndependentOp.from_list(["ZIZZZ", "IZZZZ"])
    CS.manual_stabilizers(G)
    H_cs = CS.project_onto_subspace()
    assert CS.n_qubits_in_subspace == 3
    assert H_cs.n_qubits == 3
    assert abs(exact_gs_energy(H_cs.to_sparse_matrix)[0] - be_tapered["fci_energy"]) < 0.0005


def test_update_stabilizers_aux_preserving(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"], noncontextual_strategy="SingleSweep_magnitude"
    )
    CS.update_stabilizers(3, aux_operator=be_tapered["CC_taper"], strategy="aux_preserving")
    H_cs = CS.project_onto_subspace()
    assert H_cs.n_qubits == 3
    assert abs(exact_gs_energy(H_cs.to_sparse_matrix)[0] - be_tapered["fci_energy"]) < 0.0005


def test_update_stabilizers_random(be_tapered):
    np.random.seed(0)
    CS = ContextualSubspace(
        be_tapered["H_taper"], noncontextual_strategy="SingleSweep_magnitude"
    )
    CS.update_stabilizers(3, strategy="random")
    H_cs = CS.project_onto_subspace()
    assert CS.n_qubits_in_subspace == 3
    assert H_cs.n_qubits == 3


def test_update_stabilizers_unrecognised_strategy(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"], noncontextual_strategy="SingleSweep_magnitude"
    )
    with pytest.raises(ValueError):
        CS.update_stabilizers(3, strategy="symmer")


def test_stabilize_first_strategy(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"],
        noncontextual_strategy="StabilizeFirst",
        reference_state=be_tapered["QT"].tapered_ref_state.normalize,
    )
    CS.update_stabilizers(3, aux_operator=be_tapered["CC_taper"], strategy="aux_preserving")
    H_cs = CS.project_onto_subspace()
    assert H_cs.n_qubits == 3
    assert abs(exact_gs_energy(H_cs.to_sparse_matrix)[0] - be_tapered["fci_energy"]) < 0.005


def test_project_state(be_tapered):
    CS = ContextualSubspace(
        be_tapered["H_taper"],
        noncontextual_strategy="SingleSweep_magnitude",
        reference_state=be_tapered["QT"].tapered_ref_state.normalize,
    )
    CS.update_stabilizers(3, aux_operator=be_tapered["CC_taper"], strategy="aux_preserving")
    H_cs = CS.project_onto_subspace()
    psi_cs = CS.project_state()
    e = H_cs.expval(psi_cs.normalize)
    # projected reference state should approximate the HF energy
    assert abs(e - be_tapered["hf_energy"]) < 0.01


def test_hamiltonian_noncontextual_error(h2_fixture):
    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    with pytest.raises(ValueError):
        # H2 is noncontextual: the contextual subspace is empty
        ContextualSubspace(H, noncontextual_strategy="SingleSweep_magnitude")


@pytest.mark.parametrize("seed", [1, 4, 9, 12, 17])
def test_up_enforced_projection_preserves_noncontextual_energy(seed):
    """Invariant: projecting the noncontextual component into a subspace
    consistent with its own ground sector preserves its ground energy exactly,
    including when unitary partitioning is enforced (regression guard for the
    clique-sign sector bug found on N2)."""
    from symmer_tpu.operators import NoncontextualOp
    from symmer_tpu.utils import exact_gs_energy

    np.random.seed(seed)
    nc0 = NoncontextualOp.random(4, n_cliques=int(np.random.choice([2, 3])),
                                 n_commuting_terms=4)
    H = PauliwordOp.from_planes(nc0.x_pack, nc0.z_pack, nc0.coeff_vec, nc0.n_qubits)
    pert = PauliwordOp.random(4, 5).multiply_by_constant(0.05)
    pert = (pert + pert.dagger).multiply_by_constant(0.5)
    H_full = (H + pert).cleanup()
    try:
        CS = ContextualSubspace(H_full, noncontextual_strategy="SingleSweep_CurrentOrder")
    except ValueError:
        pytest.skip("perturbed operator turned out noncontextual")
    nc = CS.noncontextual_operator
    if nc.n_cliques == 0:
        pytest.skip("no cliques in this instance")
    for n in [1, 2]:
        try:
            CS.update_stabilizers(n, strategy="aux_preserving", use_X_only=True)
        except (AssertionError, ValueError):
            # stabilizer set spans multiple cliques / outside the generator
            # span -- legitimate rejections (the reference raises the same)
            continue
        Hnc = PauliwordOp.from_planes(nc.x_pack, nc.z_pack, nc.coeff_vec, nc.n_qubits)
        Hnc_proj = CS.project_onto_subspace(Hnc)
        if isinstance(Hnc_proj, float):
            continue
        e = exact_gs_energy(Hnc_proj.to_sparse_matrix)[0]
        assert e >= nc.energy - 1e-8
        assert abs(e - nc.energy) < 1e-6, (seed, n, CS.perform_unitary_partitioning)
