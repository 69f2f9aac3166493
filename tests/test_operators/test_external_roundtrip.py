"""openfermion / qiskit conversion round-trips (reference
tests/test_operators/test_base.py:432-509).

The execution image does not ship openfermion or qiskit, so minimal protocol
stubs implementing exactly the surface the converters touch
(``QubitOperator.terms``, ``SparsePauliOp.to_list``) are vendored here and
installed as importable modules; when the real libraries are present they are
used instead (the stubs mirror their public behaviour for these calls).
"""
import sys
import types

import numpy as np
import pytest

from symmer_tpu import PauliwordOp


# ---------------------------------------------------------------------------
# minimal stand-ins for the external types
# ---------------------------------------------------------------------------

class _FakeQubitOperator:
    """openfermion.QubitOperator: terms = {((idx, letter), ...): coeff}."""

    def __init__(self, term=None, coefficient=1.0):
        self.terms = {}
        if term is None:
            return
        if isinstance(term, str):
            key = []
            for tok in term.split():
                letter, idx = tok[0], int(tok[1:])
                assert letter in "XYZ"
                key.append((idx, letter))
            key = tuple(sorted(key))
        else:
            key = tuple(term)
        self.terms[key] = complex(coefficient)

    def __iadd__(self, other):
        for k, v in other.terms.items():
            self.terms[k] = self.terms.get(k, 0) + v
        return self

    def __add__(self, other):
        out = _FakeQubitOperator()
        out.terms = dict(self.terms)
        out += other
        return out


class _FakeSparsePauliOp:
    """qiskit.quantum_info.SparsePauliOp: (paulis, coeffs) + to_list()."""

    def __init__(self, paulis, coeffs=None):
        self.paulis = list(paulis)
        self.coeffs = [complex(c) for c in (coeffs or [1.0] * len(self.paulis))]

    def to_list(self):
        return list(zip(self.paulis, self.coeffs))


@pytest.fixture()
def external_libs(monkeypatch):
    """Real openfermion/qiskit if importable, else the vendored stubs."""
    try:
        import openfermion  # noqa: F401

        QubitOperator = openfermion.QubitOperator
    except ImportError:
        of_mod = types.ModuleType("openfermion")
        of_mod.QubitOperator = _FakeQubitOperator
        monkeypatch.setitem(sys.modules, "openfermion", of_mod)
        QubitOperator = _FakeQubitOperator
    try:
        from qiskit.quantum_info import SparsePauliOp  # noqa: F401
    except ImportError:
        qk_mod = types.ModuleType("qiskit")
        qi_mod = types.ModuleType("qiskit.quantum_info")
        qi_mod.SparsePauliOp = _FakeSparsePauliOp
        qk_mod.quantum_info = qi_mod
        monkeypatch.setitem(sys.modules, "qiskit", qk_mod)
        monkeypatch.setitem(sys.modules, "qiskit.quantum_info", qi_mod)
        SparsePauliOp = _FakeSparsePauliOp
    return QubitOperator, SparsePauliOp


H_DICT = {
    "IIII": -0.09706626816762845,
    "IIIZ": -0.22343153690813597,
    "IIZI": -0.22343153690813597,
    "IIZZ": 0.17441287612261608,
    "IZII": 0.17141282644776884,
    "IZIZ": 0.12062523483390426,
    "IZZI": 0.16592785033770355,
    "ZIII": 0.17141282644776884,
    "ZIIZ": 0.16592785033770355,
    "ZIZI": 0.12062523483390426,
    "ZZII": 0.16868898170361213,
    "XXYY": -0.0453026155037993,
    "XYYX": 0.0453026155037993,
    "YXXY": 0.0453026155037993,
    "YYXX": -0.0453026155037993,
}


def test_openfermion_roundtrip(external_libs):
    QubitOperator, _ = external_libs
    op = PauliwordOp.from_dictionary(H_DICT)
    of = op.to_openfermion
    # spot-check the openfermion term structure
    assert np.isclose(of.terms[()], H_DICT["IIII"])
    assert np.isclose(of.terms[((3, "Z"),)], H_DICT["IIIZ"])
    assert np.isclose(
        of.terms[((0, "X"), (1, "X"), (2, "Y"), (3, "Y"))], H_DICT["XXYY"]
    )
    back = PauliwordOp.from_openfermion(of, n_qubits=4)
    assert back == op


def test_openfermion_import_infers_qubit_count(external_libs):
    QubitOperator, _ = external_libs
    of = QubitOperator("X0 Z2", 0.5) + QubitOperator("Y1", -2.0)
    op = PauliwordOp.from_openfermion(of)
    assert op.n_qubits == 3
    assert op.to_dictionary == {"XIZ": 0.5, "IYI": -2.0}


def test_qiskit_roundtrip(external_libs):
    _, SparsePauliOp = external_libs
    op = PauliwordOp.from_dictionary(H_DICT)
    qk = op.to_qiskit
    as_dict = dict(qk.to_list())
    assert set(as_dict) == set(H_DICT)
    assert all(np.isclose(as_dict[k], H_DICT[k]) for k in H_DICT)
    back = PauliwordOp.from_qiskit(qk)
    assert back == op


def test_qiskit_openfermion_cross(external_libs):
    """of -> PauliwordOp -> qiskit -> PauliwordOp agrees."""
    QubitOperator, _ = external_libs
    of = QubitOperator("X0 X1", 1j) + QubitOperator("Z0", 2.0) + QubitOperator("", -0.5)
    op = PauliwordOp.from_openfermion(of, n_qubits=2)
    assert PauliwordOp.from_qiskit(op.to_qiskit) == op
    assert op.to_dictionary == {"XX": 1j, "ZI": 2.0, "II": -0.5}


# ---------------------------------------------------------------------------
# genuine-library twins: activate automatically the moment the real packages
# appear in the environment (reference exercises the real APIs,
# tests/test_operators/test_base.py:432-509); skipped cleanly otherwise
# ---------------------------------------------------------------------------

def test_real_qiskit_roundtrip_and_matrix():
    qk = pytest.importorskip("qiskit")
    from qiskit.quantum_info import SparsePauliOp  # noqa: F401

    op = PauliwordOp.from_dictionary(H_DICT)
    sp = op.to_qiskit
    assert isinstance(sp, SparsePauliOp)
    # real-API surface the stubs don't model: simplify + dense matrix;
    # the reference convention keeps qubit 0 leftmost in both directions, so
    # the round trip must be the identity
    back = PauliwordOp.from_qiskit(sp.simplify())
    assert back == op
    dense = sp.to_matrix()
    assert np.allclose(np.trace(dense).real / 16, H_DICT["IIII"])


def test_real_openfermion_roundtrip_and_count_qubits():
    of_mod = pytest.importorskip("openfermion")

    op = PauliwordOp.from_dictionary(H_DICT)
    of = op.to_openfermion
    assert isinstance(of, of_mod.QubitOperator)
    assert of_mod.count_qubits(of) == 4
    back = PauliwordOp.from_openfermion(of, n_qubits=4)
    assert back == op
