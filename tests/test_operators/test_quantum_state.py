"""QuantumState tests (modeled on the QuantumState sections of symmer test_base.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState

from ..conftest import dense_op

rng = np.random.default_rng(11)


def test_init_and_views():
    sm = np.array([[0, 1, 1], [1, 0, 0]])
    psi = QuantumState(sm, [0.6, 0.8])
    assert psi.n_terms == 2 and psi.n_qubits == 3
    assert np.array_equal(psi.state_matrix, sm)
    assert psi.vec_type == "ket"


def test_rejects_non_binary():
    with pytest.raises(AssertionError):
        QuantumState(np.array([[0, 2]]), [1])


def test_uniform_superposition_default():
    psi = QuantumState(np.array([[0, 0], [1, 1]]))
    assert np.allclose(psi._amps, 1 / np.sqrt(2))


def test_from_to_array_roundtrip():
    psi = QuantumState.haar_random(3)
    vec = psi.to_sparse_matrix.toarray()
    again = QuantumState.from_array(vec)
    assert again == psi


def test_from_dictionary_roundtrip():
    d = {"011": 0.5, "110": 0.5j, "000": -np.sqrt(0.5)}
    psi = QuantumState.from_dictionary(d)
    assert psi.to_dictionary == d


def test_add_sub_scalar():
    a = QuantumState.random(3, 4)
    b = QuantumState.random(3, 4)
    va = a.to_sparse_matrix.toarray()
    vb = b.to_sparse_matrix.toarray()
    assert np.allclose((a + b).to_sparse_matrix.toarray(), va + vb)
    assert np.allclose((a - b).to_sparse_matrix.toarray(), va - vb)
    assert np.allclose((a * 2j).to_sparse_matrix.toarray(), 2j * va)


def test_scalar_dunders():
    # scalar*state, -state, state/scalar (beyond the reference surface)
    a = QuantumState.random(3, 4)
    va = a.to_sparse_matrix.toarray()
    assert np.allclose(((2 - 1j) * a).to_sparse_matrix.toarray(), (2 - 1j) * va)
    assert np.allclose((-a).to_sparse_matrix.toarray(), -va)
    assert np.allclose((a / 4).to_sparse_matrix.toarray(), va / 4)
    with pytest.raises(TypeError):
        a / QuantumState.random(3, 2)


def test_inner_product():
    a = QuantumState.haar_random(3)
    b = QuantumState.haar_random(3)
    va = a.to_sparse_matrix.toarray()
    vb = b.to_sparse_matrix.toarray()
    assert np.isclose(a.dagger * b, (va.conj().T @ vb)[0, 0])
    assert np.isclose(a.dagger * a, 1)


def test_op_acting_on_ket_and_bra():
    psi = QuantumState.haar_random(3)
    op = PauliwordOp.random(3, 5)
    v = psi.to_sparse_matrix.toarray()
    assert np.allclose((op * psi).to_sparse_matrix.toarray(), dense_op(op) @ v)
    assert np.allclose(
        (psi.dagger * op).to_sparse_matrix.toarray(), v.conj().T @ dense_op(op)
    )


def test_bra_ket_type_guards():
    psi = QuantumState.haar_random(2)
    with pytest.raises(AssertionError):
        psi * psi  # ket * ket
    with pytest.raises(AssertionError):
        psi.dagger * psi.dagger  # bra * bra


def test_normalize_and_counts():
    psi = QuantumState(np.array([[0, 0], [1, 1]]), [3, 4])
    assert np.isclose(np.linalg.norm(psi.normalize._amps), 1)
    counts = QuantumState(np.array([[0, 0], [1, 1]]), [30, 70])
    assert np.allclose(abs(counts.normalize_counts._amps) ** 2, [0.3, 0.7])


def test_cleanup_merges_duplicates():
    psi = QuantumState(np.array([[0, 1], [0, 1], [1, 0]]), [0.5, 0.5, 1e-18])
    clean = psi.cleanup()
    assert clean.n_terms == 1
    assert clean.to_dictionary == {"01": (1 + 0j)}


def test_sectors_present():
    from symmer_tpu.operators import IndependentOp

    psi = QuantumState(np.array([1, 1, 0, 0]))
    symm = IndependentOp.from_list(["ZIII", "IZII", "IIZI"])
    assert np.allclose(psi.sectors_present(symm), [-1, -1, 1])


def test_partial_trace_and_rdm():
    psi = QuantumState.haar_random(3)
    rho = psi.get_rdm([0])
    assert rho.shape == (2, 2)
    assert np.isclose(np.trace(rho), 1)
    # pure product test: |0>|+>
    prod = QuantumState.from_array(
        np.kron([1, 0], [1 / np.sqrt(2), 1 / np.sqrt(2)]).reshape(-1, 1)
    )
    rho0 = prod.get_rdm([0])
    assert np.allclose(rho0, [[1, 0], [0, 0]])


def test_sample_state():
    np.random.seed(0)
    psi = QuantumState(np.array([[0], [1]]), [np.sqrt(0.25), np.sqrt(0.75)])
    sampled = psi.sample_state(10000)
    counts = sampled._amps.real
    assert abs(counts[0] / 10000 - 0.25) < 0.05


def test_measure_in_computational_basis():
    psi = QuantumState.haar_random(2)
    P = PauliwordOp.from_list(["XY"])
    psi_new, Z_new = psi.measure_state_in_computational_basis(P)
    assert set("".join(Z_new.to_dictionary.keys())).issubset({"I", "Z"})
    assert np.isclose(P.expval(psi), Z_new.expval(psi_new), atol=1e-10)


def test_state_op_encoding():
    # reference encoding: |0> -> Z, |1> -> X (base.py:1564-1619)
    psi = QuantumState(np.array([[0, 1]]), [1])
    sop = psi.state_op
    assert list(sop.to_dictionary.keys()) == ["ZX"]
