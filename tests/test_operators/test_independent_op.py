"""IndependentOp tests (modeled on symmer tests/test_operators/test_independent_op.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.operators import IndependentOp


def test_coefficients_must_be_pm1():
    with pytest.raises(ValueError):
        IndependentOp.from_list(["XI", "IZ"], [1, 2])


def test_dependent_set_rejected():
    with pytest.raises(ValueError):
        IndependentOp.from_list(["ZI", "IZ", "ZZ"])


def test_independent_set_accepted():
    op = IndependentOp.from_list(["ZI", "IZ"])
    assert op.n_terms == 2
    assert np.array_equal(op.coeff_vec, [1, 1])


def test_symmetry_generators_commute_with_operator(h2_fixture):
    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    S = IndependentOp.symmetry_generators(H)
    assert S.n_terms == 3
    assert np.all(S.commutes_termwise(H))


def test_symmetry_generators_h2_span(h2_fixture):
    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    G1 = IndependentOp.symmetry_generators(H)
    G2 = IndependentOp.from_list(["ZIZI", "IZIZ", "IIZZ"])
    assert np.all(G1.generator_reconstruction(G2)[1])
    assert np.all(G2.generator_reconstruction(G1)[1])


def test_no_symmetries_warns():
    # the full 2-qubit Pauli group has no common-commuting kernel
    full = PauliwordOp.from_list(["XI", "YI", "ZI", "IX", "IY", "IZ"])
    with pytest.warns(UserWarning):
        S = IndependentOp.symmetry_generators(full)
    assert S.n_terms == 0


def test_rotations_map_onto_single_qubit_paulis():
    S = IndependentOp.from_list(["ZZII", "IZZI", "IIZZ"])
    rotated = S.rotate_onto_single_qubit_paulis()
    weights = np.sum(rotated.symp_matrix, axis=1)
    assert np.all(weights == 1)
    # target_sqp defaults to Z
    assert not np.any(rotated.X_block)


def test_rotations_unitary_consistency(dense_oracle):
    import scipy.linalg

    dense_pauli, dense_op = dense_oracle
    S = IndependentOp.from_list(["ZZI", "IZZ"])
    rotated = S.rotate_onto_single_qubit_paulis()
    U = np.eye(8)
    for P, ang in S.stabilizer_rotations:
        t = np.pi / 2 if ang is None else ang
        U = scipy.linalg.expm(1j * t / 2 * dense_op(P)) @ U
    for i in range(S.n_terms):
        got = U @ dense_op(S[i]) @ U.conj().T
        assert np.allclose(got, dense_op(rotated[i]), atol=1e-12)


def test_update_sector():
    S = IndependentOp.from_list(["ZI", "IZ"])
    S.update_sector(np.array([0, 1]))
    assert np.array_equal(S.coeff_vec, [1, -1])
    S.update_sector(np.array([1, 0]))
    assert np.array_equal(S.coeff_vec, [-1, 1])


def test_update_sector_superposition_warns():
    S = IndependentOp.from_list(["XI"])
    # |00> has <X> = 0: ambiguous assignment
    with pytest.warns(UserWarning):
        S.update_sector(np.array([0, 0]))
    assert S.coeff_vec[0] == 0


def test_update_sector_quantum_state():
    S = IndependentOp.from_list(["ZZ"])
    psi = QuantumState(np.array([[0, 1]]), [1])
    S.update_sector(psi)
    assert S.coeff_vec[0] == -1
