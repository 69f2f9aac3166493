"""Clifford-simulator tests: random circuits vs dense statevector evolution.

(modeled on symmer tests/test_evolution/test_circuit_symmerlator.py, with the
dense oracle replacing qiskit's Statevector)
"""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.evolution import CircuitSymmerlator, qasm_to_PauliwordOp
from symmer_tpu.evolution.gate_library import CX, CZ, Had, S, X, Y, Z, RZ, RX, RY

from ..conftest import dense_op

rng = np.random.default_rng(5)

GATES_1Q = ["x", "y", "z", "h", "s", "sdg", "sx", "sy", "sz"]
GATES_2Q = ["cx", "cy", "cz", "swap"]
GATES_ROT = ["rx", "ry", "rz"]


def _dense_gate(name, n, qubits, angle=None):
    import scipy.linalg

    from ..conftest import dense_pauli

    def emb(m1q, q):
        out = np.array([[1]], dtype=complex)
        for k in range(n):
            out = np.kron(out, m1q if k == q else np.eye(2))
        return out

    H2 = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    mats = {
        "x": np.array([[0, 1], [1, 0]]),
        "y": np.array([[0, -1j], [1j, 0]]),
        "z": np.diag([1, -1]),
        "h": H2,
        "s": np.diag([1, 1j]),
        "sdg": np.diag([1, -1j]),
        # sqrt gates follow the qiskit convention (e.g. SX = e^{-i pi/4 X} up
        # to global phase), matching the reference simulator's rotation signs
        "sx": scipy.linalg.expm(-1j * np.pi / 4 * np.array([[0, 1], [1, 0]])),
        "sy": scipy.linalg.expm(-1j * np.pi / 4 * np.array([[0, -1j], [1j, 0]])),
        "sz": scipy.linalg.expm(-1j * np.pi / 4 * np.diag([1, -1])),
    }
    if name in mats:
        return emb(mats[name], qubits[0])
    if name in GATES_ROT:
        # native rotation convention: R_P(t) = e^{+i t/2 P}; qiskit rotations
        # negate the angle on import (reference from_qiskit angle_factor=-1)
        P = {"rx": "X", "ry": "Y", "rz": "Z"}[name]
        m = scipy.linalg.expm(1j * angle / 2 * dense_pauli(P))
        return emb(m, qubits[0])
    c, t = qubits
    dim = 2**n
    out = np.zeros((dim, dim), dtype=complex)
    if name == "swap":
        for b in range(dim):
            bits = [(b >> (n - 1 - k)) & 1 for k in range(n)]
            bits[c], bits[t] = bits[t], bits[c]
            b2 = sum(bit << (n - 1 - k) for k, bit in enumerate(bits))
            out[b2, b] = 1
        return out
    targ = {"cx": np.array([[0, 1], [1, 0]]), "cy": np.array([[0, -1j], [1j, 0]]),
            "cz": np.diag([1, -1])}[name]
    for b in range(dim):
        cb = (b >> (n - 1 - c)) & 1
        tb = (b >> (n - 1 - t)) & 1
        if cb == 0:
            out[b, b] += 1
        else:
            for tb2 in (0, 1):
                b2 = b ^ ((tb ^ tb2) << (n - 1 - t))
                out[b2, b] += targ[tb2, tb]
    return out


@pytest.mark.parametrize("seed", list(range(12)))
def test_random_clifford_circuit_expectation(seed):
    """<0|U^dag O U|0> from the Heisenberg simulator vs dense evolution."""
    rng = np.random.default_rng(seed)
    n = 4
    sim = CircuitSymmerlator(n)
    U = np.eye(2**n, dtype=complex)
    for _ in range(30):
        if rng.random() < 0.7:
            g = rng.choice(GATES_1Q)
            q = int(rng.integers(n))
            getattr(sim, {"x": "X", "y": "Y", "z": "Z", "h": "H", "s": "S",
                          "sdg": "Sdag", "sx": "sqrtX", "sy": "sqrtY",
                          "sz": "sqrtZ"}[g])(q)
            U = _dense_gate(g, n, [q]) @ U
        else:
            g = rng.choice(GATES_2Q)
            q1, q2 = rng.choice(n, 2, replace=False)
            {"cx": sim.CX, "cy": sim.CY, "cz": sim.CZ, "swap": sim.SWAP}[g](int(q1), int(q2))
            U = _dense_gate(g, n, [int(q1), int(q2)]) @ U
    obs = PauliwordOp.random(n, 8)
    obs = (obs + obs.dagger).multiply_by_constant(0.5)
    val = sim.evaluate(obs)
    v0 = np.zeros(2**n)
    v0[0] = 1
    expect = v0 @ U.conj().T @ dense_op(obs) @ U @ v0
    assert np.isclose(complex(val).real, expect.real, atol=1e-8)


def test_rotation_gates_against_dense():
    n = 2
    sim = CircuitSymmerlator(n)
    sim.RX(0, 0.3)
    sim.RZ(1, -0.7)
    sim.CX(0, 1)
    U = _dense_gate("cx", n, [0, 1]) @ _dense_gate("rz", n, [1], -0.7) @ _dense_gate("rx", n, [0], 0.3)
    obs = PauliwordOp.random(n, 5)
    obs = (obs + obs.dagger).multiply_by_constant(0.5)
    val = sim.evaluate(obs)
    v0 = np.zeros(4); v0[0] = 1
    expect = v0 @ U.conj().T @ dense_op(obs) @ U @ v0
    assert np.isclose(complex(val).real, expect.real, atol=1e-8)


def test_from_qasm():
    qasm = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[3];\n'
        "h q[0];\ncx q[0],q[1];\ns q[2];\ncz q[1],q[2];\nx q[2];\n"
    )
    sim = CircuitSymmerlator.from_qasm(qasm)
    obs = PauliwordOp.random(3, 6)
    obs = (obs + obs.dagger).multiply_by_constant(0.5)
    val = sim.evaluate(obs)
    U = np.eye(8, dtype=complex)
    for g, qs in [("h", [0]), ("cx", [0, 1]), ("s", [2]), ("cz", [1, 2]), ("x", [2])]:
        U = _dense_gate(g, 3, qs) @ U
    v0 = np.zeros(8); v0[0] = 1
    expect = v0 @ U.conj().T @ dense_op(obs) @ U @ v0
    assert np.isclose(complex(val).real, expect.real, atol=1e-8)


def test_qasm_to_pauliwordop_matches_gate_product():
    qasm = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[2];\n'
        "h q[0];\ncx q[0],q[1];\nrz(0.5) q[1];\n"
    )
    decomp = qasm_to_PauliwordOp(qasm)
    U = _dense_gate("rz", 2, [1], 0.5) @ _dense_gate("cx", 2, [0, 1]) @ _dense_gate("h", 2, [0])
    D = dense_op(decomp)
    nz = np.argmax(np.abs(U))
    ph = D.flatten()[nz] / U.flatten()[nz]
    assert np.isclose(abs(ph), 1, atol=1e-10)
    assert np.allclose(D, ph * U, atol=1e-10)


def test_t_and_toffoli_supported():
    # the reference raises NotImplementedError for these; we implement them
    sim = CircuitSymmerlator(3)
    sim.T(0)
    sim.Toffoli(0, 1, 2)
    assert len(sim.sequence) > 0


def test_t_gate_vs_dense():
    """T/Tdag (non-Clifford) -- the reference raises NotImplementedError."""
    Tm = np.diag([1, np.exp(1j * np.pi / 4)])
    H2m = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    for q in [0, 1]:
        for seed in range(3):
            rng2 = np.random.default_rng(seed)
            sim = CircuitSymmerlator(2)
            sim.H(q); sim.T(q); sim.H(q); sim.Tdag(q)
            U = np.eye(4, dtype=complex)
            for m in [H2m, Tm, H2m, Tm.conj().T]:
                full = np.array([[1]], dtype=complex)
                for k in range(2):
                    full = np.kron(full, m if k == q else np.eye(2))
                U = full @ U
            obs = PauliwordOp.random(2, 6)
            obs = (obs + obs.dagger).multiply_by_constant(0.5)
            val = complex(sim.evaluate(obs)).real
            v0 = np.zeros(4); v0[0] = 1
            expect = (v0 @ U.conj().T @ dense_op(obs) @ U @ v0).real
            assert np.isclose(val, expect, atol=1e-8), (q, seed)


def test_toffoli_vs_dense():
    ccx = np.eye(8); ccx[6, 6] = 0; ccx[7, 7] = 0; ccx[6, 7] = 1; ccx[7, 6] = 1
    x0 = _dense_gate("x", 3, [0]); x1 = _dense_gate("x", 3, [1])
    for prep, U0 in [((0,), x0), ((0, 1), x1 @ x0), ((), np.eye(8))]:
        sim = CircuitSymmerlator(3)
        for q in prep:
            sim.X(q)
        sim.Toffoli(0, 1, 2)
        U = ccx @ U0
        obs = PauliwordOp.random(3, 8)
        obs = (obs + obs.dagger).multiply_by_constant(0.5)
        val = complex(sim.evaluate(obs)).real
        v0 = np.zeros(8); v0[0] = 1
        expect = (v0 @ U.conj().T @ dense_op(obs) @ U @ v0).real
        assert np.isclose(val, expect, atol=1e-8), prep


def test_qasm_export_round_trip():
    """Regression (review finding): the module must parse its own export
    back to the same unitary — PauliwordOp_to_QASM emits standard QASM
    angle conventions, so the parser needs negate_angles=True; the export's
    'sdg' (Y basis change) must also be parseable at all."""
    from symmer_tpu.evolution import PauliwordOp_to_QASM

    op = PauliwordOp.from_dictionary({"ZX": 0.3, "YI": 0.2})
    qasm = PauliwordOp_to_QASM(op)
    back = qasm_to_PauliwordOp(qasm, negate_angles=True)
    # expected unitary: per-term exponentials applied in the operator's term
    # order (circuit step 0 acts first -> rightmost matrix factor)
    import scipy.linalg

    from ..conftest import dense_pauli

    U = np.eye(4, dtype=complex)
    for pstr, coeff in op.to_dictionary.items():
        U = scipy.linalg.expm(1j * coeff.real * dense_pauli(pstr)) @ U
    D = dense_op(back)
    nz = np.argmax(np.abs(U))
    ph = D.flatten()[nz] / U.flatten()[nz]
    assert np.isclose(abs(ph), 1, atol=1e-10)
    assert np.allclose(D, ph * U, atol=1e-10)


def test_qasm_symbolic_angles_parse():
    qasm = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[1];\n'
        "rz(pi/4) q[0];\nrz(3*pi/2) q[0];\nrz(-pi) q[0];\n"
    )
    out = qasm_to_PauliwordOp(qasm)
    want = np.pi / 4 + 3 * np.pi / 2 - np.pi
    U = scipy_expm_z(want)
    D = dense_op(out)
    nz = np.argmax(np.abs(U))
    ph = D.flatten()[nz] / U.flatten()[nz]
    assert np.allclose(D, ph * U, atol=1e-10)


def scipy_expm_z(theta):
    import scipy.linalg

    from ..conftest import dense_pauli

    return scipy.linalg.expm(1j * theta / 2 * dense_pauli("Z"))


def test_qasm_angle_eval_rejects_code_execution():
    """Angle expressions are restricted arithmetic: attribute traversal and
    any non-arithmetic construct must raise, not execute (a builtins-stripped
    eval is NOT a sandbox)."""
    from symmer_tpu.evolution._parse import safe_angle_eval

    assert np.isclose(safe_angle_eval("3*pi/2"), 3 * np.pi / 2)
    assert np.isclose(safe_angle_eval("-pi"), -np.pi)
    assert np.isclose(safe_angle_eval(" 0.5 + 2**-3 "), 0.5 + 2**-3)
    for evil in (
        "().__class__.__base__.__subclasses__()",
        "__import__('os').system('true')",
        "pi.__class__",
        "[1][0]",
        "'x'*3",
        "lambda: 1",
        "nope",
    ):
        with pytest.raises(ValueError):
            safe_angle_eval(evil)
    qasm = (
        'OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[1];\n'
        "rz(().__class__) q[0];\n"
    )
    with pytest.raises(ValueError):
        CircuitSymmerlator.from_qasm(qasm)
    with pytest.raises(ValueError):
        qasm_to_PauliwordOp(qasm)


def test_qasm_angle_eval_overflow_is_value_error():
    """Huge exponents evaluate in the float domain and surface as ValueError
    (no bigint construction -- an untrusted file cannot hang the parser)."""
    from symmer_tpu.evolution._parse import safe_angle_eval

    with pytest.raises(ValueError):
        safe_angle_eval("9**9**9**9")
    with pytest.raises(ValueError):
        safe_angle_eval("1/0")
