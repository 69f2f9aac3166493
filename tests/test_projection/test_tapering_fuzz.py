"""Property-based tapering fuzz (cf. reference tests/test_qubit_tapering.py,
which only exercises fixed molecules).

Property: for a random Hamiltonian H built to commute with a random set of
Z2 symmetries, the spectrum of the tapered operator in EVERY sector is a
subset of the spectrum of H (each sector projection is a restriction of H to
a stabilizer eigenspace, so its eigenvalues must appear among H's).  The
union over all sectors must recover the full ground-state energy.
"""
import itertools

import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QubitTapering


@pytest.mark.parametrize("seed", range(8))
def test_taper_spectrum_containment(seed):
    rng = np.random.default_rng(seed)
    n_qubits = int(rng.integers(4, 7))
    n_syms = int(rng.integers(1, 3))
    # build random symmetric H
    while True:
        z_syms = rng.integers(0, 2, (n_syms, n_qubits)).astype(bool)
        if (
            np.linalg.matrix_rank(z_syms.astype(np.uint8)) == n_syms
            and z_syms.any(axis=1).all()
        ):
            break
    terms = []
    attempts = 0
    while len(terms) < 12 and attempts < 2000:
        attempts += 1
        x = rng.integers(0, 2, n_qubits).astype(bool)
        z = rng.integers(0, 2, n_qubits).astype(bool)
        if all((x & s).sum() % 2 == 0 for s in z_syms):
            terms.append(np.concatenate([x, z]))
    symp = np.unique(np.array(terms, dtype=bool), axis=0)
    coeffs = rng.normal(size=symp.shape[0])
    H = PauliwordOp(symp, coeffs)
    H = (H + H.dagger) * 0.5
    H = H[np.abs(H.coeff_vec) > 1e-12]

    full_eigs = np.linalg.eigvalsh(H.to_sparse_matrix.toarray())

    QT = QubitTapering(H)
    n_found = QT.symmetry_generators.n_terms
    assert n_found >= n_syms  # must find at least the planted symmetries

    gs_energies = []
    for sector in itertools.product([1, -1], repeat=n_found):
        QT.symmetry_generators.coeff_vec = np.array(sector, dtype=complex)
        H_red = QT.taper_it(sector=np.array(sector))
        assert H_red.n_qubits == H.n_qubits - n_found
        red_eigs = np.linalg.eigvalsh(H_red.to_sparse_matrix.toarray())
        # every sector eigenvalue appears in the full spectrum
        for e in red_eigs:
            assert np.min(np.abs(full_eigs - e)) < 1e-8, (
                f"sector {sector} eigenvalue {e} not in full spectrum"
            )
        gs_energies.append(red_eigs[0])

    # union over sectors recovers the true ground state
    assert abs(min(gs_energies) - full_eigs[0]) < 1e-8


@pytest.mark.parametrize("seed", range(4))
def test_taper_state_consistency(seed):
    """Projecting the tapered ground state back gives the same energy."""
    rng = np.random.default_rng(100 + seed)
    n_qubits = 5
    z_sym = np.zeros(n_qubits, dtype=bool)
    z_sym[rng.choice(n_qubits, 2, replace=False)] = True
    terms = []
    attempts = 0
    while len(terms) < 10 and attempts < 2000:
        attempts += 1
        x = rng.integers(0, 2, n_qubits).astype(bool)
        z = rng.integers(0, 2, n_qubits).astype(bool)
        if (x & z_sym).sum() % 2 == 0:
            terms.append(np.concatenate([x, z]))
    symp = np.unique(np.array(terms, dtype=bool), axis=0)
    H = PauliwordOp(symp, rng.normal(size=symp.shape[0]))
    H = (H + H.dagger) * 0.5
    H = H[np.abs(H.coeff_vec) > 1e-12]

    full_eigs = np.linalg.eigvalsh(H.to_sparse_matrix.toarray())
    QT = QubitTapering(H)
    n_found = QT.symmetry_generators.n_terms

    best = np.inf
    for sector in itertools.product([1, -1], repeat=n_found):
        H_red = QT.taper_it(sector=np.array(sector))
        red_eigs = np.linalg.eigvalsh(H_red.to_sparse_matrix.toarray())
        best = min(best, red_eigs[0])
    assert abs(best - full_eigs[0]) < 1e-8
