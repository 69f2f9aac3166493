"""Native C++ host-kernel parity (ctypes gf2core) vs the numpy branches."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.kernels import np_core

try:
    from symmer_tpu.native import gf2core
except Exception:  # pragma: no cover
    gf2core = None

pytestmark = pytest.mark.skipif(gf2core is None, reason="native build unavailable")

rng = np.random.default_rng(3)


def _numpy_mul_pairs(x1, z1, c1, x2, z2, c2):
    """The pure-numpy all-pairs branch (np_core.multiply below its native
    routing threshold), inlined so the native path is compared against it
    at ANY size."""
    m1, m2 = x1.shape[0], x2.shape[0]
    W = x1.shape[1]
    xo = (x1[:, None, :] ^ x2[None, :, :]).reshape(-1, W)
    zo = (z1[:, None, :] ^ z2[None, :, :]).reshape(-1, W)
    y_in = np_core.y_count(x1, z1)[:, None] + np_core.y_count(x2, z2)[None, :]
    y_out = (
        np.bitwise_count(xo.reshape(m1, m2, W) & zo.reshape(m1, m2, W))
        .sum(axis=2).astype(np.int64)
    )
    x1z2 = (
        np.bitwise_count(x1[:, None, :] & z2[None, :, :])
        .sum(axis=2).astype(np.int64)
    )
    phase = (1 - 2 * (x1z2 & 1)) * np_core._I4[(3 * y_in + y_out) % 4]
    return xo, zo, (phase * np.outer(c1, c2)).reshape(-1)


@pytest.mark.parametrize("m1,m2,W", [(7, 5, 1), (33, 17, 3), (64, 64, 16)])
def test_mul_pairs_matches_numpy(m1, m2, W):
    x1 = rng.integers(0, 1 << 63, (m1, W), dtype=np.uint64)
    z1 = rng.integers(0, 1 << 63, (m1, W), dtype=np.uint64)
    x2 = rng.integers(0, 1 << 63, (m2, W), dtype=np.uint64)
    z2 = rng.integers(0, 1 << 63, (m2, W), dtype=np.uint64)
    c1 = rng.normal(size=m1) + 1j * rng.normal(size=m1)
    c2 = rng.normal(size=m2) + 1j * rng.normal(size=m2)
    xa, za, ca = gf2core.mul_pairs(x1, z1, c1, x2, z2, c2)
    xb, zb, cb = _numpy_mul_pairs(x1, z1, c1, x2, z2, c2)
    assert np.array_equal(xa, xb) and np.array_equal(za, zb)
    # numpy's vectorized complex multiply is FMA-contracted on most CPUs;
    # the native kernel (built -ffp-contract=off) matches the exact scalar
    # product, so allow one ulp against the numpy branch...
    assert np.allclose(ca, cb, rtol=5e-16, atol=0)
    # ...and require EXACT equality with the scalar formula spot-checked
    for k in (0, (m1 * m2) // 2, m1 * m2 - 1):
        i, j = divmod(k, m2)
        xo = x1[i] ^ x2[j]
        zo = z1[i] ^ z2[j]
        y = (
            3 * (int(np.bitwise_count(x1[i] & z1[i]).sum())
                 + int(np.bitwise_count(x2[j] & z2[j]).sum()))
            + int(np.bitwise_count(xo & zo).sum())
        ) % 4
        sign = -1 if int(np.bitwise_count(x1[i] & z2[j]).sum()) & 1 else 1
        exact = sign * (1j ** y) * (complex(c1[i]) * complex(c2[j]))
        assert ca[k] == exact


def test_multiply_routing_agrees_with_public_product():
    """PauliwordOp.__mul__ through the host path (which routes to the native
    kernel above the threshold) must match the dense oracle."""
    from symmer_tpu.config import config

    np.random.seed(8)
    A = PauliwordOp.random(5, 40)
    B = PauliwordOp.random(5, 30)
    old = config.backend
    try:
        config.backend = "host"
        C = A * B  # 1200 pairs -> native path
    finally:
        config.backend = old
    from ..conftest import dense_op

    assert np.allclose(dense_op(C), dense_op(A) @ dense_op(B), atol=1e-12)


def test_cleanup_rows_matches_two_step():
    """Fused unique+accumulate must equal unique_rows + np.add.at exactly
    (same first-occurrence order, same accumulation order)."""
    n, W = 5000, 4
    base = rng.integers(0, 1 << 63, (n // 4, W), dtype=np.uint64)
    rows = base[rng.integers(0, n // 4, n)]
    c = rng.normal(size=n) + 1j * rng.normal(size=n)
    uniq, csum = gf2core.cleanup_rows(rows, c)
    first, inv = gf2core.unique_rows(rows)
    cref = np.zeros(len(first), complex)
    np.add.at(cref, inv, c)
    assert np.array_equal(uniq, rows[first])
    assert np.array_equal(csum, cref)


def test_host_cleanup_public_path():
    """PauliwordOp.cleanup through the host backend (fused native kernel)
    equals the dense-matrix oracle."""
    from symmer_tpu.config import config

    np.random.seed(5)
    A = PauliwordOp.random(4, 30)
    dup = A.append(A.multiply_by_constant(-0.25))
    old = config.backend
    try:
        config.backend = "host"
        out = dup.cleanup()
    finally:
        config.backend = old
    from ..conftest import dense_op

    assert np.allclose(dense_op(out), dense_op(A) * 0.75, atol=1e-12)


def test_fused_nonclifford_rotate_matches_dense():
    """rotate_single_cleanup (native single pass) vs the dense oracle:
    R O R^dag with R = e^{i t/2 Q}."""
    import scipy.linalg

    from symmer_tpu.kernels import np_core
    from ..conftest import dense_op, dense_pauli

    np.random.seed(9)
    O = PauliwordOp.random(5, 70).cleanup()  # >= 64 terms -> native path
    Q = PauliwordOp.random(5, 1)
    Q.coeff_vec[:] = 1
    t = 0.41
    xo, zo, co = np_core.rotate_single_cleanup(
        O.x_pack, O.z_pack, O.coeff_vec, Q.x_pack[0], Q.z_pack[0], t, 1e-14
    )
    got = dense_op(PauliwordOp.from_planes(xo, zo, co, 5))
    qd = dense_op(Q)
    R = scipy.linalg.expm(1j * t / 2 * qd)
    want = R @ dense_op(O) @ R.conj().T
    assert np.allclose(got, want, atol=1e-10)


def test_fused_product_cleanup_matches_dense():
    """multiply_cleanup_host (fused native product+dedup) vs dense oracle."""
    from symmer_tpu.kernels import np_core
    from ..conftest import dense_op

    np.random.seed(10)
    A = PauliwordOp.random(5, 40).cleanup()
    B = PauliwordOp.random(5, 30).cleanup()
    xo, zo, co = np_core.multiply_cleanup_host(
        A.x_pack, A.z_pack, A.coeff_vec, B.x_pack, B.z_pack, B.coeff_vec,
        1e-14,
    )
    got = dense_op(PauliwordOp.from_planes(xo, zo, co, 5))
    assert np.allclose(got, dense_op(A) @ dense_op(B), atol=1e-11)
