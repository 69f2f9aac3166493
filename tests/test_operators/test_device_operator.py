"""Device-resident operator pipeline (DeviceOperator) tests."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.operators import DeviceOperator


def test_roundtrip_identity():
    op = PauliwordOp.random(30, 100).cleanup()
    back = op.to_device().to_host()
    assert back == op


def test_multiply_cleanup_pipeline_matches_host():
    np.random.seed(2)
    A = PauliwordOp.random(24, 60)
    B = PauliwordOp.random(24, 40)
    host = (A * B).cleanup()
    dev = (A.to_device() * B.to_device()).cleanup().to_host()
    assert dev == host


def test_rotations_pipeline_matches_host():
    np.random.seed(3)
    op = PauliwordOp.random(20, 80)
    r1 = PauliwordOp.random(20, 1); r1.coeff_vec[:] = 1
    r2 = PauliwordOp.random(20, 1); r2.coeff_vec[:] = 1
    rots = [(r1, 0.7), (r2, None)]
    host = op.perform_rotations(rots)
    dev = op.to_device().perform_rotations(rots).to_host()
    assert dev == host


def test_chained_pipeline_single_upload():
    np.random.seed(4)
    H = PauliwordOp.random(16, 50)
    r = PauliwordOp.random(16, 1); r.coeff_vec[:] = 1
    host = (H * H).cleanup().perform_rotations([(r, 0.3)])
    Hd = H.to_device()
    dev = (Hd * Hd).cleanup().perform_rotations([(r, 0.3)]).to_host()
    assert dev == host


def test_expval_iz_matches_host():
    np.random.seed(5)
    op = PauliwordOp.random(12, 40)
    diag = ~np.any(op.X_block, axis=1)
    want = complex(np.sum(op.coeff_vec[diag]))
    got = op.to_device().expval_iz()
    assert abs(got - want) < 1e-10 * max(abs(want), 1.0)


def test_n_terms_and_repr():
    op = PauliwordOp.random(10, 33).cleanup()
    d = op.to_device()
    assert d.n_terms == op.n_terms
    assert "DeviceOperator" in repr(d)


def test_fully_cancelled_cleanup_reports_empty():
    """A fully-cancelled DeviceOperator must report 0 terms (code-review r3:
    the survivor clamp made it report a phantom zero row)."""
    op = PauliwordOp.from_list(["XZ", "XZ"], [1, -1])
    d = op.to_device().cleanup()
    assert d.n_terms == 0
    host = d.to_host()
    assert host == op.cleanup()


def test_sectors_present_large_support_state():
    """Vectorised termwise expvals on a wide-support state (code-review r3:
    the dict loop was O(M B) interpreted iterations)."""
    from symmer_tpu import QuantumState

    rng = np.random.default_rng(0)
    nq, B = 12, 300
    psi = QuantumState.random(nq, B).normalize
    sym = PauliwordOp.from_list(
        ["Z" * nq, "Z" + "I" * (nq - 1), "I" * (nq - 1) + "Z"]
    )
    got = psi.sectors_present(sym)
    want = [sym[i].expval(psi) for i in range(3)]
    assert np.allclose(got, want, atol=1e-10)


def test_device_expval_matches_host():
    from symmer_tpu import QuantumState

    rng = np.random.default_rng(1)
    nq, B, T = 14, 32, 120
    psi = QuantumState.random(nq, B).normalize
    s = psi._s_pack
    hop = rng.integers(0, len(s), (T // 2, 2))
    x = np.vstack([
        np.zeros((T - T // 2, s.shape[1]), np.uint64),
        s[hop[:, 0]] ^ s[hop[:, 1]],
    ])
    z = PauliwordOp.random(nq, T, density=0.3).z_pack
    op = PauliwordOp.from_planes(
        x, z, rng.normal(size=T) + 1j * rng.normal(size=T), nq
    )
    got = op.to_device().expval(psi)
    want = op.expval(psi)
    assert abs(got - want) < 1e-9 * max(abs(want), 1.0)


# -- pending-projection (_free_mask) semantics --------------------------------
# A resident taper (taper_it(aux_operator=H.to_device())) returns FULL-width
# planes with stabilized columns zeroed + a pending column reduction; these
# tests pin the guard rails around mixing that state with reduced-qubit
# objects (code-review r5 findings).

def _planted_taper(n_qubits=12, n_terms=400, n_sym=2, seed=0):
    from symmer_tpu import QubitTapering

    rng = np.random.default_rng(seed)
    block = n_qubits // n_sym
    xb = rng.integers(0, 2, (n_terms, n_qubits)).astype(bool)
    zb = rng.integers(0, 2, (n_terms, n_qubits)).astype(bool)
    for k in range(n_sym):
        parity = xb[:, k * block : (k + 1) * block].sum(axis=1) & 1
        xb[parity == 1, k * block] ^= True
    H = PauliwordOp(np.hstack([xb, zb]), rng.normal(size=n_terms)).cleanup()
    ref = np.zeros(n_qubits, dtype=int)
    qt_h = QubitTapering(H)
    t_host = qt_h.taper_it(ref_state=ref)
    qt_d = QubitTapering(H)
    t_dev = qt_d.taper_it(ref_state=ref, aux_operator=H.to_device())
    return H, t_host, t_dev, qt_d


def _single_x(n_qubits, qubit):
    s = ["I"] * n_qubits
    s[qubit] = "X"
    op = PauliwordOp.from_list(["".join(s)])
    op.coeff_vec[:] = 1
    return op


def test_resident_rotation_after_projection_keeps_reduction():
    """perform_rotations must carry the pending column reduction through
    (r5 review: the mask was dropped, to_host returned full width)."""
    H, t_host, t_dev, qt = _planted_taper()
    free = list(qt.free_qubit_indices)
    q_full = free[2]
    r_full = _single_x(H.n_qubits, q_full)
    r_red = _single_x(t_host.n_qubits, 2)  # same qubit in reduced indexing
    want = t_host.perform_rotations([(r_red, 0.4)])
    got = t_dev.perform_rotations([(r_full, 0.4)]).to_host()
    assert got.n_qubits == t_host.n_qubits
    assert got == want


def test_resident_rotation_on_stabilized_qubit_rejected():
    H, _, t_dev, qt = _planted_taper()
    stab_q = int(np.setdiff1d(
        np.arange(H.n_qubits), qt.free_qubit_indices
    )[0])
    with pytest.raises(ValueError, match="stabilized"):
        t_dev.perform_rotations([(_single_x(H.n_qubits, stab_q), 0.4)])


def test_resident_second_projection_rejected():
    """A once-projected resident operator must not silently enter a second
    projection (full-width planes vs reduced-index stabilizers)."""
    from symmer_tpu import QubitTapering

    H, t_host, t_dev, _ = _planted_taper()
    # same-width stabilizers, already-projected operand: pending guard
    qt_fresh = QubitTapering(H)
    with pytest.raises(ValueError, match="pending projection"):
        qt_fresh.taper_it(
            sector=np.ones(qt_fresh.n_taper, dtype=int), aux_operator=t_dev
        )
    # direct kernel entry has the same guard
    with pytest.raises(ValueError, match="pending projection"):
        t_dev.clifford_rotate_project(
            [], qt_fresh.symmetry_generators.rotate_onto_single_qubit_paulis(),
            np.ones(H.n_qubits, dtype=bool),
        )


def test_resident_expval_width_mismatch_rejected():
    from symmer_tpu import QuantumState

    _, t_host, t_dev, _ = _planted_taper()
    psi_red = QuantumState(np.zeros(t_host.n_qubits, dtype=int))
    with pytest.raises(ValueError, match="full-width"):
        t_dev.expval(psi_red)


def test_resident_multiply_mixed_masks_rejected():
    H, _, t_dev, _ = _planted_taper()
    with pytest.raises(ValueError, match="free-qubit masks differ"):
        t_dev.multiply(H.to_device())


def test_resident_multiply_same_mask_matches_host():
    _, t_host, t_dev, _ = _planted_taper()
    want = (t_host * t_host).cleanup()
    got = t_dev.multiply(t_dev).to_host()
    assert got == want
