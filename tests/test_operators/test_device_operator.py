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
