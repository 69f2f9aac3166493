"""Projection-utility tests (modeled on symmer tests/test_projection/test_utils.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.operators import IndependentOp
from symmer_tpu.projection.utils import (
    ObservableBiasing,
    StabilizerIdentification,
    basis_score,
    get_noncon_generators_from_commuting_stabilizers,
    lp_norm,
    norm,
    update_eigenvalues,
)


def test_norms():
    v = np.array([3.0, 4.0])
    assert np.isclose(norm(v), 5)
    assert np.isclose(lp_norm(v, 2), 5)
    assert np.isclose(lp_norm(v, 1), 7)


def test_basis_score_bounds():
    H = PauliwordOp.random(4, 10).cleanup()
    S = IndependentOp.from_list(["ZIII", "IZII"])
    score = basis_score(H, S)
    assert 0 <= score <= 1 + 1e-10


def test_update_eigenvalues():
    generators = IndependentOp.from_list(["ZZII", "IIZZ"], [-1, 1])
    stabilizers = IndependentOp.from_list(["ZZZZ"])
    update_eigenvalues(generators, stabilizers)
    # ZZZZ = (ZZII)(IIZZ): eigenvalue = (-1)*(+1) = -1
    assert stabilizers.coeff_vec[0] == -1


def test_update_eigenvalues_failure():
    generators = IndependentOp.from_list(["ZZII"])
    stabilizers = IndependentOp.from_list(["XXXX"])
    with pytest.raises(ValueError):
        update_eigenvalues(generators, stabilizers)


def test_stabilizer_identification_subspace_dimension(be_fixture):
    CC = PauliwordOp.from_dictionary(
        be_fixture["data"]["auxiliary_operators"]["UCCSD_operator"]
    )
    SI = StabilizerIdentification(CC, use_X_only=True)
    for n_sim in [4, 5]:
        S = SI.symmetry_generators_by_subspace_dimension(n_sim)
        assert CC.n_qubits - S.n_terms == n_sim
    # unreachable dimensions collapse the search region (reference behaviour)
    with pytest.raises(AssertionError):
        SI.symmetry_generators_by_subspace_dimension(8)


def test_observable_biasing_curve():
    H = PauliwordOp.random(6, 12).cleanup()
    OB = ObservableBiasing(H, HOMO_LUMO_gap=2.5)
    curve = OB.HOMO_LUMO_bias_curve()
    assert curve.shape == (6,)
    assert np.all(curve >= 0)
    biased = OB.HOMO_LUMO_biased_operator()
    assert biased.n_terms == H.n_terms


def test_noncon_generators_from_commuting_stabilizers():
    np.random.seed(0)
    stab = IndependentOp.from_list(["ZIII", "IZII"])
    H = PauliwordOp.random(4, 12).cleanup()
    out = get_noncon_generators_from_commuting_stabilizers(stab, H)
    assert out.is_noncontextual
    # contains an anticommuting augmentation
    assert not np.all(out.commutes_termwise(out))


def test_one_qubit_noncontextual_gs():
    from symmer_tpu.projection.utils import one_qubit_noncontextual_gs

    op = PauliwordOp.from_dictionary({"Z": 0.7, "X": -0.4, "I": 0.1})
    energy, psi = one_qubit_noncontextual_gs(op)
    evals = np.linalg.eigvalsh(op.to_dense_matrix())
    assert np.isclose(energy, evals[0])
    assert np.isclose(float(np.real(op.expval(psi))), evals[0])
    with pytest.raises(AssertionError):
        one_qubit_noncontextual_gs(PauliwordOp.from_list(["ZZ"]))


def test_build_basis_weighting_operator_recallable():
    H = PauliwordOp.random(5, 14).cleanup()
    SI = StabilizerIdentification(H, use_X_only=True)
    # X-only weighting zeroes every Z plane and takes |coeff|
    assert not SI.weighting_operator.z_pack.any()
    assert np.all(SI.weighting_operator.coeff_vec.real >= 0)
    before = SI.basis_weighting.n_terms
    SI.build_basis_weighting_operator()  # idempotent re-derivation
    assert SI.basis_weighting.n_terms == before
