"""Edge-case behaviour: empty operators, zero coefficients, single qubits."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState


def test_empty_operator_algebra():
    e = PauliwordOp.empty(3)
    a = PauliwordOp.random(3, 4)
    assert (e + a) == a
    assert np.allclose((e * a).coeff_vec, 0)


def test_cleanup_to_nothing():
    op = PauliwordOp.from_list(["XY", "XY"], [1, -1])
    clean = op.cleanup()
    assert clean.n_terms == 0 or np.allclose(clean.coeff_vec, 0)


def test_zero_coeff_preserved_without_threshold():
    from symmer_tpu.kernels import np_core

    op = PauliwordOp.from_list(["XY", "XY"], [1, -1])
    x, z, c = np_core.cleanup(op.x_pack, op.z_pack, op.coeff_vec, None)
    assert x.shape[0] == 1 and c[0] == 0  # merged but not dropped


def test_single_qubit_roundtrip():
    op = PauliwordOp.from_dictionary({"X": 1, "Y": 1j, "Z": -1, "I": 0.5})
    assert op.to_dictionary == {"X": 1, "Y": 1j, "Z": -1, "I": 0.5}
    assert np.allclose(
        op.to_sparse_matrix.toarray(),
        np.array([[0, 1], [1, 0]]) + 1j * np.array([[0, -1j], [1j, 0]])
        - np.diag([1, -1]) + 0.5 * np.eye(2),
    )


def test_negative_indexing_and_slices():
    op = PauliwordOp.random(3, 5)
    assert op[-1] == op[4]
    assert op[1:3].n_terms == 2
    assert op[[0, 2, 4]].n_terms == 3


def test_coefficient_dtype_preserved():
    op = PauliwordOp.from_list(["XX"], [np.float32(0.5)])
    assert op.coeff_vec.dtype == np.complex128  # canonical host dtype


def test_state_zero_amplitudes():
    psi = QuantumState(np.array([[0, 1], [1, 0]]), [1, 0])
    clean = psi.cleanup()
    assert clean.n_terms == 1


def test_large_qubit_string_io():
    n = 100_000
    rng = np.random.default_rng(0)
    s = "".join(rng.choice(list("IXYZ"), n))
    op = PauliwordOp.from_list([s], [2.0])
    assert list(op.to_dictionary.keys())[0] == s
    sq = (op * op).cleanup()
    assert not np.any(sq.symp_matrix)  # P^2 = I
    assert np.isclose(sq.coeff_vec[0], 4.0)
