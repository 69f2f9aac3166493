"""Device state-kernel parity vs the host one-sparse implementation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.kernels import jx_state, pack, state_core

rng = np.random.default_rng(2)


def _planes(op):
    return (
        jnp.asarray(pack.to_u32(op.x_pack)), jnp.asarray(pack.to_u32(op.z_pack)),
        jnp.asarray(op.coeff_vec.real), jnp.asarray(op.coeff_vec.imag),
    )


def _state(psi):
    return (
        jnp.asarray(pack.to_u32(psi._s_pack)),
        jnp.asarray(psi._amps.real), jnp.asarray(psi._amps.imag),
    )


def test_apply_to_ket_parity():
    np.random.seed(0)
    op = PauliwordOp.random(40, 9).cleanup()
    psi = QuantumState.random(40, 7)
    bits_h, amps_h = state_core.apply_to_ket(
        op.x_pack, op.z_pack, op.coeff_vec, psi._s_pack, psi._amps
    )
    bits_h, amps_h = state_core.cleanup_state(bits_h, amps_h)
    x, z, cr, ci = _planes(op)
    s, ar, ai = _state(psi)
    bits_d, br, bi = jx_state.apply_to_ket(x, z, cr, ci, s, ar, ai)
    bits_d, br, bi, n = jx_state.cleanup_state(bits_d, br, bi, bits_d.shape[0])
    n = int(n)
    d_dev = dict(
        zip(
            [r.tobytes() for r in pack.from_u32(np.asarray(bits_d)[:n])],
            np.asarray(br)[:n] + 1j * np.asarray(bi)[:n],
        )
    )
    d_host = dict(zip([r.tobytes() for r in bits_h], amps_h))
    assert set(d_dev) == set(d_host)
    assert all(abs(d_dev[k] - d_host[k]) < 1e-10 for k in d_host)


def test_device_expval_matches_host():
    np.random.seed(1)
    op = PauliwordOp.random(30, 12).cleanup()
    op = (op + op.dagger).multiply_by_constant(0.5)
    psi = QuantumState.random(30, 9)
    host = op.expval(psi)
    x, z, cr, ci = _planes(op)
    s, ar, ai = _state(psi)
    re, im = jax.jit(jx_state.expval)(x, z, cr, ci, s, ar, ai, s.shape[0])
    assert np.isclose(float(re), host, atol=1e-10)
    assert abs(float(im)) < 1e-10


@pytest.mark.parametrize("seed", range(20))
def test_device_expval_fuzz_small_basis(seed):
    """Many tiny-basis cases: with B ~ 4 the lookup window spans most of the
    table, the regime where a clip-based window double-counted matches at the
    last sorted position (regression for the one-hot roll fix)."""
    rng = np.random.default_rng(seed)
    nq = int(rng.integers(2, 6))
    op = PauliwordOp.random(nq, int(rng.integers(2, 9)), density=0.8).cleanup()
    psi = QuantumState.random(nq, int(rng.integers(1, 5)))
    host = complex(psi.dagger * (op * psi))
    x, z, cr, ci = _planes(op)
    s, ar, ai = _state(psi)
    re, im = jax.jit(jx_state.expval)(x, z, cr, ci, s, ar, ai, s.shape[0])
    assert abs(complex(float(re), float(im)) - host) < 1e-10


def test_inner_product_sorted():
    np.random.seed(2)
    a = QuantumState.random(25, 8)
    b = QuantumState.random(25, 8)
    host = a.dagger * b
    sa, aar, aai = _state(a)
    sb, bar, bai = _state(b)
    re, im = jax.jit(jx_state.inner_product_sorted)(
        sa, aar, -aai, sa.shape[0], sb, bar, bai, sb.shape[0]
    )
    assert np.isclose(float(re) + 1j * float(im), host, atol=1e-12)


def test_apply_state_host_device_parity():
    """op * |psi> through both dispatch paths gives identical states."""
    from symmer_tpu.config import config

    np.random.seed(3)
    op = PauliwordOp.random(20, 40).cleanup()
    psi = QuantumState.random(20, 12)
    saved = config.device_threshold
    try:
        config.device_threshold = 10**18
        host = op * psi
        config.device_threshold = 0
        dev = op * psi
    finally:
        config.device_threshold = saved
    hd = {r.tobytes(): a for r, a in zip(host._s_pack, host._amps)}
    dd = {r.tobytes(): a for r, a in zip(dev._s_pack, dev._amps)}
    assert hd.keys() == dd.keys()
    assert all(abs(hd[k] - dd[k]) < 1e-10 for k in hd)


def test_apply_to_bra_parity():
    np.random.seed(6)
    op = PauliwordOp.random(40, 9).cleanup()
    psi = QuantumState.random(40, 7)
    bits_h, amps_h = state_core.apply_to_bra(
        psi._s_pack, psi._amps, op.x_pack, op.z_pack, op.coeff_vec
    )
    bits_h, amps_h = state_core.cleanup_state(bits_h, amps_h)
    x, z, cr, ci = _planes(op)
    s, ar, ai = _state(psi)
    bits_d, br, bi = jx_state.apply_to_bra(s, ar, ai, x, z, cr, ci)
    bits_d, br, bi, n = jx_state.cleanup_state(bits_d, br, bi, bits_d.shape[0])
    n = int(n)
    d_dev = dict(
        zip(
            (r.tobytes() for r in pack.from_u32(np.asarray(bits_d)[:n])),
            np.asarray(br)[:n] + 1j * np.asarray(bi)[:n],
        )
    )
    d_host = dict(zip((r.tobytes() for r in bits_h), amps_h))
    assert set(d_dev) == set(d_host)
    assert all(abs(d_dev[k] - d_host[k]) < 1e-10 for k in d_host)


def test_bra_dispatch_device_path():
    """bra * PauliwordOp and bra * ket through the PUBLIC API, device backend."""
    from symmer_tpu.config import config

    np.random.seed(7)
    op = PauliwordOp.random(12, 15).cleanup()
    ket = QuantumState.random(12, 9)
    bra = ket.dagger
    host_bra_op = bra * op
    host_ip = bra * ket
    old = config.backend
    try:
        config.backend = "device"
        dev_bra_op = bra * op
        dev_ip = bra * ket
    finally:
        config.backend = old
    assert dev_bra_op == host_bra_op
    assert abs(dev_ip - host_ip) < 1e-10

    # consistency: (<psi|O)|psi> == <psi|(O|psi>) == expval for Hermitian-ish
    assert abs((bra * op) * ket - bra * (op * ket)) < 1e-10


def test_inner_product_device_handles_duplicate_rows():
    """The device inner product dedups internally -- states with repeated
    basis rows must match the host dict-accumulation result."""
    from symmer_tpu.config import config

    np.random.seed(8)
    base = QuantumState.random(10, 4)
    idx = np.array([0, 1, 1, 2, 3, 0, 2])
    dup = QuantumState.from_planes(
        base._s_pack[idx], np.random.randn(7) + 1j * np.random.randn(7), 10, "ket"
    )
    bra = QuantumState.random(10, 5).dagger
    host = bra * dup
    old = config.backend
    try:
        config.backend = "device"
        dev = bra * dup
    finally:
        config.backend = old
    assert abs(dev - host) < 1e-10


def test_termwise_expval_duplicate_basis_rows():
    """A state carrying duplicate basis rows (non-canonical but constructible
    via from_planes) must produce the same per-term expectations as its
    cleaned-up form -- the sorted join dedups internally."""
    np.random.seed(3)
    op = PauliwordOp.random(6, 8).cleanup()
    psi = QuantumState.random(6, 5)
    s2 = np.vstack([psi._s_pack, psi._s_pack[[1, 3]]])
    a2 = np.concatenate([psi._amps, [0.25 - 0.1j, -0.5j]])
    dup = QuantumState.from_planes(s2, a2, 6)
    canon = dup.cleanup()
    got = state_core.termwise_expval(op.x_pack, op.z_pack, dup._s_pack, dup._amps)
    want = state_core.termwise_expval(
        op.x_pack, op.z_pack, canon._s_pack, canon._amps
    )
    assert np.allclose(got, want, atol=1e-12)
    # dense oracle: <psi|P_t|psi> for every term
    v = dup.to_dense_matrix.reshape(-1)
    for t, p in enumerate(op):
        from ..conftest import dense_op

        pd = dense_op(p.multiply_by_constant(1 / p.coeff_vec[0]))
        assert np.isclose(got[t], v.conj() @ pd @ v, atol=1e-12)
