"""Gate library + exponentiation tests (modeled on symmer test_evolution_gate_library.py)."""
import numpy as np
import pytest
import scipy.linalg

from symmer_tpu import PauliwordOp
from symmer_tpu.evolution import exponentiate_single_Pop, trotter, truncated_exponential
from symmer_tpu.evolution.gate_library import CX, CY, CZ, RX, RY, RZ, U1, Had, I, S, X, Y, Z

from ..conftest import dense_op, dense_pauli


def _phase_free_equal(U, V):
    nz = np.argmax(np.abs(V))
    ph = U.flatten()[nz] / V.flatten()[nz]
    return np.allclose(U, ph * V, atol=1e-10)


def test_single_qubit_gates():
    assert np.allclose(dense_op(I(1)), np.eye(2))
    assert np.allclose(dense_op(X(1, 0)), dense_pauli("X"))
    assert np.allclose(dense_op(Y(1, 0)), dense_pauli("Y"))
    assert np.allclose(dense_op(Z(1, 0)), dense_pauli("Z"))
    assert np.allclose(dense_op(Had(1, 0)), np.array([[1, 1], [1, -1]]) / np.sqrt(2))


def test_s_gate():
    assert _phase_free_equal(dense_op(S(1, 0)), np.diag([1, 1j]))


def test_controlled_gates():
    cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
    cz = np.diag([1, 1, 1, -1])
    cy = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, -1j], [0, 0, 1j, 0]])
    assert _phase_free_equal(dense_op(CX(2, 0, 1)), cx)
    assert _phase_free_equal(dense_op(CZ(2, 0, 1)), cz)
    assert _phase_free_equal(dense_op(CY(2, 0, 1)), cy)


@pytest.mark.parametrize("angle", [0.3, -1.2, np.pi / 2])
def test_rotation_gates(angle):
    for G, P in [(RX, "X"), (RY, "Y"), (RZ, "Z")]:
        # our convention: R(t) = e^{i t/2 P}
        expect = scipy.linalg.expm(1j * angle / 2 * dense_pauli(P))
        assert np.allclose(dense_op(G(1, 0, angle)), expect)


def test_u1_gate():
    angle = 0.7
    assert _phase_free_equal(dense_op(U1(1, 0, angle)), np.diag([1, np.exp(-1j * angle)]))


def test_exponentiate_single_pop():
    P = PauliwordOp.from_list(["XZY"], [0.3j])
    assert np.allclose(
        dense_op(exponentiate_single_Pop(P)), scipy.linalg.expm(0.3j * dense_pauli("XZY"))
    )


def test_trotter_exact_on_commuting():
    op = PauliwordOp.from_dictionary({"ZZI": 0.3, "IZZ": -0.2, "ZIZ": 0.1})
    assert np.allclose(
        dense_op(trotter(op.multiply_by_constant(1j))),
        scipy.linalg.expm(1j * dense_op(op)),
    )


def test_trotter_converges_on_noncommuting():
    op = PauliwordOp.from_dictionary({"XX": 0.3, "ZI": -0.4})
    exact = scipy.linalg.expm(1j * dense_op(op))
    err_1 = np.abs(dense_op(trotter(op.multiply_by_constant(1j), 1)) - exact).max()
    err_8 = np.abs(dense_op(trotter(op.multiply_by_constant(1j), 8)) - exact).max()
    assert err_8 < err_1 / 4


def test_truncated_exponential():
    op = PauliwordOp.from_dictionary({"XX": 0.2j, "ZI": -0.1j})
    exact = scipy.linalg.expm(dense_op(op))
    approx = dense_op(truncated_exponential(op, truncate_at=14))
    assert np.allclose(approx, exact, atol=1e-10)
