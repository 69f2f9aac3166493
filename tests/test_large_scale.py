"""Large-operator end-to-end flows through the device kernel path.

The headline scaling regime (SURVEY §5.7): hundreds of qubits, thousands of
terms. Sizes here are CI-moderate; bench.py exercises the full 1,000-qubit x
100k-term regime on TPU.
"""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.config import config
from symmer_tpu.operators import IndependentOp


@pytest.fixture
def device_backend():
    old = config.backend
    config.backend = "device"
    yield
    config.backend = old


def _op_with_symmetries(n_qubits, n_terms, n_clifford, seed=0):
    """Random diagonal operator scrambled by random Cliffords -- guarantees
    at least n_qubits - rank Z2 symmetries survive."""
    rng = np.random.default_rng(seed)
    np.random.seed(seed)
    op = PauliwordOp.random(n_qubits, n_terms, diagonal=True, complex_coeffs=False)
    op.coeff_vec = rng.normal(size=op.n_terms).astype(complex)
    rotations = []
    for _ in range(n_clifford):
        P = PauliwordOp.random(n_qubits, 1)
        P.coeff_vec = np.array([1])
        rotations.append((P, None))
    return op.perform_rotations(rotations).cleanup(), rotations


def test_large_clifford_rotations_roundtrip(device_backend):
    """Applying Cliffords then their inverses restores the operator (device scan)."""
    np.random.seed(1)
    op = PauliwordOp.random(128, 512).cleanup()
    rotations = []
    for _ in range(32):
        P = PauliwordOp.random(128, 1)
        P.coeff_vec = np.array([1])
        rotations.append((P, np.pi / 2))
    forward = op.perform_rotations(rotations)
    inverse = [(P, -np.pi / 2) for P, _ in rotations[::-1]]
    assert forward.perform_rotations(inverse) == op


def test_large_square_matches_host(device_backend):
    np.random.seed(2)
    op = PauliwordOp.random(96, 256).cleanup()
    dev = op * op
    config.backend = "host"
    host = op * op
    config.backend = "device"
    assert dev == host


def test_large_symmetry_taper_flow():
    """Symmetry discovery + tapering on a 64-qubit, 1k-term scrambled operator."""
    from symmer_tpu import QubitTapering

    H, _ = _op_with_symmetries(64, 800, n_clifford=12, seed=3)
    assert H.n_qubits == 64
    S = IndependentOp.symmetry_generators(H, commuting_override=True)
    assert S.n_terms > 0
    assert np.all(S.commutes_termwise(H))
    QT = QubitTapering(H)
    sector = np.ones(QT.n_taper, dtype=int)
    H_taper = QT.taper_it(sector=sector)
    assert H_taper.n_qubits == 64 - QT.n_taper
    # tapering preserves hermiticity and term budget
    assert H_taper.n_terms <= H.n_terms
    assert np.allclose(H_taper.coeff_vec.imag, 0, atol=1e-10)


def test_wide_operator_algebra():
    """10,000-qubit operators: packed planes keep this trivial."""
    rng = np.random.default_rng(4)
    n = 10_000
    s1 = "".join(rng.choice(list("IXYZ"), n))
    s2 = "".join(rng.choice(list("IXYZ"), n))
    a = PauliwordOp.from_list([s1], [1.5])
    b = PauliwordOp.from_list([s2], [-0.5j])
    prod = a * b
    assert prod.n_terms == 1
    # (ab)(ab)^dag has unit Pauli content: P P^dag = |c|^2 I
    identity = (prod * prod.dagger).cleanup()
    assert pytest.approx(abs(identity.coeff_vec[0])) == abs(1.5 * 0.5) ** 2
    assert not np.any(identity.symp_matrix)


@pytest.mark.slow
def test_symmetry_discovery_100k_terms():
    """Symmetry search at the headline scale: 1,000 qubits x 100,000 terms."""
    from symmer_tpu.kernels import pack

    rng = np.random.default_rng(0)
    n_qubits, n_terms = 1000, 100_000
    W = pack.n_words_for(n_qubits)
    z = rng.integers(0, 2**64, (n_terms, W), dtype=np.uint64) & pack.qubit_mask(n_qubits)
    H = PauliwordOp.from_planes(
        np.zeros_like(z), z, rng.normal(size=n_terms), n_qubits
    ).cleanup()
    S = IndependentOp.symmetry_generators(H, commuting_override=True)
    assert S.n_terms == n_qubits  # diagonal operator: full Z2 symmetry group
    assert np.all(S.commutes_termwise(H[:1000]))


@pytest.mark.slow
def test_full_taper_flow_256q_20k_terms():
    """End-to-end taper at scale: 256 qubits, 20k terms, partial symmetry."""
    from symmer_tpu import QubitTapering
    from symmer_tpu.kernels import pack

    rng = np.random.default_rng(0)
    n_qubits, n_terms = 256, 20_000
    W = pack.n_words_for(n_qubits)
    z = rng.integers(0, 2**64, (n_terms, W), dtype=np.uint64) & pack.qubit_mask(n_qubits)
    H = PauliwordOp.from_planes(np.zeros_like(z), z, rng.normal(size=n_terms), n_qubits)
    # off-diagonal terms supported on the first 128 qubits only: the single-Z
    # operators on the last 128 qubits remain symmetries
    half_mask = np.zeros(W, dtype=np.uint64)
    half_mask[:2] = ~np.uint64(0)  # qubits 0..127
    x_half = rng.integers(0, 2**64, (100, W), dtype=np.uint64) & half_mask
    z_half = rng.integers(0, 2**64, (100, W), dtype=np.uint64) & pack.qubit_mask(n_qubits)
    H = (
        H + PauliwordOp.from_planes(x_half, z_half, rng.normal(size=100), n_qubits)
    ).cleanup()

    QT = QubitTapering(H)
    assert QT.n_taper >= 128
    H_taper = QT.taper_it(sector=np.ones(QT.n_taper, dtype=int))
    assert H_taper.n_qubits == n_qubits - QT.n_taper
    assert H_taper.n_terms <= H.n_terms
    assert np.allclose(H_taper.coeff_vec.imag, 0, atol=1e-10)
