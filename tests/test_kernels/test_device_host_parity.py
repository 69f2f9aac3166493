"""Cross-validation of the XLA device kernels against the packed-numpy host
kernels (identical semantics by construction; both validated against the dense
oracle in test_operators)."""
import numpy as np
import pytest

import jax.numpy as jnp

from symmer_tpu.kernels import jx_core, np_core, pack

rng = np.random.default_rng(1)
N_QUBITS = 70  # spans multiple packed words


def rand_planes(T, n=N_QUBITS):
    strs = ["".join(rng.choice(list("IXYZ"), n)) for _ in range(T)]
    x, z, _ = pack.strings_to_planes(strs)
    c = rng.normal(size=T) + 1j * rng.normal(size=T)
    return x, z, c


def to_dicts(x64, z64, c):
    return dict(zip(pack.rows_to_bytes(x64, z64), c))


def test_u32_view_roundtrip():
    x, z, _ = rand_planes(5)
    assert np.array_equal(pack.from_u32(pack.to_u32(x)), x)


def _split(c):
    return jnp.asarray(c.real), jnp.asarray(c.imag)


def _join(cr, ci):
    return np.asarray(cr) + 1j * np.asarray(ci)


def test_mul_pairs_parity():
    x1, z1, c1 = rand_planes(13)
    x2, z2, c2 = rand_planes(9)
    hx, hz, hc = np_core.multiply(x1, z1, c1, x2, z2, c2)
    dx, dz, dcr, dci = jx_core.mul_pairs(
        jnp.asarray(pack.to_u32(x1)), jnp.asarray(pack.to_u32(z1)), *_split(c1),
        jnp.asarray(pack.to_u32(x2)), jnp.asarray(pack.to_u32(z2)), *_split(c2),
    )
    assert np.array_equal(pack.to_u32(hx), np.asarray(dx))
    assert np.allclose(hc, _join(dcr, dci))


def test_anticommutes_parity():
    x1, z1, _ = rand_planes(8)
    x2, z2, _ = rand_planes(6)
    h = np_core.anticommutes(x1, z1, x2, z2)
    d = jx_core.anticommutes(
        jnp.asarray(pack.to_u32(x1)), jnp.asarray(pack.to_u32(z1)),
        jnp.asarray(pack.to_u32(x2)), jnp.asarray(pack.to_u32(z2)),
    )
    assert np.array_equal(h, np.asarray(d))


def test_cleanup_parity_with_padding():
    x, z, c = rand_planes(11)
    # duplicate rows + pad to a 32-row bucket with garbage beyond n_valid
    xd = np.vstack([x, x[:4]])
    zd = np.vstack([z, z[:4]])
    cd = np.concatenate([c, rng.normal(size=4) + 0j])
    hx, hz, hc = np_core.cleanup(xd, zd, cd, 1e-15)
    T, W2 = 32, xd.shape[1] * 2
    jx_ = np.zeros((T, W2), np.uint32)
    jz_ = np.zeros((T, W2), np.uint32)
    jcr = np.zeros(T)
    jci = np.zeros(T)
    jx_[: len(cd)] = pack.to_u32(xd)
    jz_[: len(cd)] = pack.to_u32(zd)
    jcr[: len(cd)] = cd.real
    jci[: len(cd)] = cd.imag
    ox, oz, ocr, oci, n_out = jx_core.cleanup_sorted(
        jnp.asarray(jx_), jnp.asarray(jz_), jnp.asarray(jcr), jnp.asarray(jci),
        jnp.asarray(len(cd)), jnp.asarray(1e-15),
    )
    n_out = int(n_out)
    assert n_out == hx.shape[0]
    d_dev = to_dicts(
        pack.from_u32(np.asarray(ox)[:n_out]), pack.from_u32(np.asarray(oz)[:n_out]),
        _join(ocr, oci)[:n_out],
    )
    d_host = to_dicts(hx, hz, hc)
    assert set(d_dev) == set(d_host)
    assert all(abs(d_dev[k] - d_host[k]) < 1e-12 for k in d_host)


def test_clifford_scan_parity():
    x, z, c = rand_planes(10)
    rots = [
        ("".join(rng.choice(list("IXYZ"), N_QUBITS)), int(rng.integers(0, 4)))
        for _ in range(15)
    ]
    hx, hz, hc = x, z, c
    for s, m in rots:
        xr, zr, _ = pack.strings_to_planes([s])
        (hx, hz, hc), needs = np_core.rotate_single(hx, hz, hc, xr[0], zr[0], m * np.pi / 2)
        assert not needs
    rx = np.vstack([pack.to_u32(pack.strings_to_planes([s])[0]) for s, _ in rots])
    rz = np.vstack([pack.to_u32(pack.strings_to_planes([s])[1]) for s, _ in rots])
    rm = np.array([m for _, m in rots], np.int32)
    sx, sz, scr, sci = jx_core.clifford_scan(
        jnp.asarray(pack.to_u32(x)), jnp.asarray(pack.to_u32(z)), *_split(c),
        jnp.asarray(rx), jnp.asarray(rz), jnp.asarray(rm),
    )
    d_dev = to_dicts(pack.from_u32(np.asarray(sx)), pack.from_u32(np.asarray(sz)), _join(scr, sci))
    d_host = to_dicts(hx, hz, hc)
    assert set(d_dev) == set(d_host)
    assert all(abs(d_dev[k] - d_host[k]) < 1e-10 for k in d_host)


def test_nonclifford_rotation_parity():
    x, z, c = rand_planes(12)
    s = "".join(rng.choice(list("IXYZ"), N_QUBITS))
    xr, zr, _ = pack.strings_to_planes([s])
    angle = 0.731
    (hx, hz, hc), _ = np_core.rotate_single(x, z, c, xr[0], zr[0], angle)
    hx, hz, hc = np_core.cleanup(hx, hz, hc, 1e-15)
    ox, oz, ocr, oci = jx_core.rotate_nonclifford(
        jnp.asarray(pack.to_u32(x)), jnp.asarray(pack.to_u32(z)), *_split(c),
        jnp.asarray(pack.to_u32(xr))[0], jnp.asarray(pack.to_u32(zr))[0], angle,
    )
    ox, oz, ocr, oci, n = jx_core.cleanup_sorted(
        ox, oz, ocr, oci, jnp.asarray(ox.shape[0]), jnp.asarray(1e-15)
    )
    n = int(n)
    d_dev = to_dicts(
        pack.from_u32(np.asarray(ox)[:n]), pack.from_u32(np.asarray(oz)[:n]),
        _join(ocr, oci)[:n],
    )
    d_host = to_dicts(hx, hz, hc)
    assert set(d_dev) == set(d_host)
    assert all(abs(d_dev[k] - d_host[k]) < 1e-10 for k in d_host)


def test_dispatch_device_path_end_to_end():
    """Force device backend through the public operator API."""
    from symmer_tpu import PauliwordOp
    from symmer_tpu.config import config

    np.random.seed(0)
    a = PauliwordOp.random(6, 20).cleanup()
    b = PauliwordOp.random(6, 15).cleanup()
    host_prod = a * b
    old = config.backend
    try:
        config.backend = "device"
        dev_prod = a * b
        dev_adj = a.commutes_termwise(b)
        rots = [(PauliwordOp.from_list(["XYZIII"]), None),
                (PauliwordOp.from_list(["IIZZXX"]), 0.4)]
        dev_rot = a.perform_rotations(rots)
    finally:
        config.backend = old
    assert dev_prod == host_prod
    assert np.array_equal(dev_adj, a.commutes_termwise(b))
    assert dev_rot == a.perform_rotations(rots)


def test_dispatch_long_mixed_rotation_sequence():
    """Device-resident perform_rotations across many Clifford runs and
    non-Clifford rotations (the planes stay on device between segments;
    re-bucketing after each non-Clifford step must preserve semantics)."""
    from symmer_tpu import PauliwordOp
    from symmer_tpu.config import config

    np.random.seed(3)
    a = PauliwordOp.random(7, 25).cleanup()
    rots = []
    for k in range(24):
        p = PauliwordOp.random(7, 1)
        p.coeff_vec[:] = 1
        if k % 4 == 0:
            angle = 0.1 + 0.05 * k  # non-Clifford
        elif k % 4 == 1:
            angle = None            # Clifford pi/2
        else:
            angle = np.pi / 2 * ((k % 3) + 1)  # Clifford multiples
        rots.append((p, angle))
    host_out = a.perform_rotations(rots)
    old = config.backend
    try:
        config.backend = "device"
        dev_out = a.perform_rotations(rots)
    finally:
        config.backend = old
    assert dev_out == host_out


def test_device_rref_matches_host():
    from symmer_tpu.kernels.gf2 import rref_packed
    from symmer_tpu.kernels.jx_gf2 import rref_packed_device

    for (R, bits) in [(12, 40), (30, 200), (64, 64)]:
        m = rng.integers(0, 2, (R, bits)).astype(bool)
        packed = pack.pack_bits(m, bits)
        host = rref_packed(packed)
        dev = pack.from_u32(np.asarray(rref_packed_device(jnp.asarray(pack.to_u32(packed)))))
        assert np.array_equal(host, dev[:, : packed.shape[1]]), (R, bits)


def test_device_noncontextual_check_matches_host():
    """Device-resident is_noncontextual (adjacency never downloaded) vs the
    host C++ dedup oracle, above and below the noncontextual boundary."""
    from symmer_tpu.config import config
    from symmer_tpu.kernels import dispatch
    from symmer_tpu.operators import NoncontextualOp, PauliwordOp
    from symmer_tpu.operators.utils import check_adjmat_noncontextual

    np.random.seed(11)
    nc = NoncontextualOp.random(12, n_cliques=3, n_commuting_terms=512)
    # pad the noncontextual op with duplicates of its own terms (duplicate
    # rows share commutation character, so noncontextuality is preserved)
    idx = np.random.randint(0, nc.n_terms, 1400)
    big_nc = PauliwordOp.from_planes(
        nc.x_pack[idx], nc.z_pack[idx], np.ones(1400, complex), nc.n_qubits
    )
    contextual = PauliwordOp.random(12, 1300, density=0.5).cleanup()
    old = config.backend
    try:
        config.backend = "device"
        for op, label in ((big_nc, "noncontextual"), (contextual, "contextual")):
            dev = dispatch.is_noncontextual(op.x_pack, op.z_pack)
            assert dev is not None, "device path not taken"
            host = check_adjmat_noncontextual(
                np.asarray(op.commutes_termwise(op))
            )
            assert dev == host, label
    finally:
        config.backend = old


def test_select_columns_matches_boolean_slice():
    from symmer_tpu.kernels import pack

    rng = np.random.default_rng(3)
    for nq, T in [(5, 7), (64, 20), (100, 50), (130, 33)]:
        p = rng.integers(0, 2**63, (T, pack.n_words_for(nq)), dtype=np.uint64)
        # zero the bits beyond nq (invariant of real planes)
        bits = pack.unpack_bits(p, nq)
        p = pack.pack_bits(bits, nq)
        keep = rng.random(nq) < 0.6
        got = pack.select_columns(p, keep)
        want = pack.pack_bits(bits[:, keep], int(keep.sum()))
        assert got.shape == want.shape
        assert np.array_equal(got, want), (nq, T)
        # edge: keep nothing / keep all
        assert np.array_equal(
            pack.select_columns(p, np.ones(nq, bool)), p
        )
        assert pack.select_columns(p, np.zeros(nq, bool)).shape == (T, 1)


def test_select_columns_numpy_fallback_matches_native(monkeypatch):
    """The byte-LUT numpy branch (hosts without a C++ toolchain) must agree
    bit-for-bit with the native PEXT kernel."""
    import symmer_tpu.native as native
    from symmer_tpu.kernels import pack

    rng = np.random.default_rng(5)
    cases = []
    for nq, T in [(9, 12), (64, 30), (100, 64), (200, 17), (513, 5)]:
        p = pack.pack_bits(rng.random((T, nq)) < 0.5, nq)
        keep = rng.random(nq) < rng.random()
        cases.append((p, keep, pack.select_columns(p, keep)))

    monkeypatch.setattr(native, "gf2core", None)
    for p, keep, want in cases:
        assert np.array_equal(pack.select_columns(p, keep), want)


def test_exact_cleanup_keys_wired_and_matches():
    """Regression (review finding): config.exact_cleanup_keys was a dead
    knob — no dispatch path passed exact=True.  With plain (non-df)
    precision the explicit device cleanup must now honour it and match the
    hashed path / host exactly."""
    from symmer_tpu.config import config
    from symmer_tpu.kernels import dispatch

    x, z, c = rand_planes(40)
    xx = np.concatenate([x, x])
    zz = np.concatenate([z, z])
    cc = np.concatenate([c, c])
    want = np_core.cleanup(xx, zz, cc, 1e-15)
    old_prec, old_exact, old_backend = (
        config.device_precision, config.exact_cleanup_keys, config.backend
    )
    try:
        config.device_precision = "f32"
        config.exact_cleanup_keys = True
        config.backend = "device"
        got = dispatch.cleanup(xx, zz, cc, 1e-15)
    finally:
        config.device_precision = old_prec
        config.exact_cleanup_keys = old_exact
        config.backend = old_backend
    assert to_dicts(*want) .keys() == to_dicts(*got).keys()
    wd, gd = to_dicts(*want), to_dicts(*got)
    assert all(abs(wd[k] - gd[k]) < 1e-5 for k in wd)


def test_multiply_none_threshold_keeps_exact_zeros():
    """Regression (review finding): zero_threshold=None must mean
    dedup-only on BOTH backends — exactly-cancelled terms keep their
    coefficient-0 row, as the host path always did."""
    from symmer_tpu.config import config
    from symmer_tpu.kernels import dispatch

    x, z, c = rand_planes(6)
    xx = np.concatenate([x, x])
    zz = np.concatenate([z, z])
    cc = np.concatenate([c, -c])  # every pair cancels exactly
    want = np_core.cleanup(xx, zz, cc, None)
    old_backend = config.backend
    try:
        config.backend = "device"
        got = dispatch.cleanup(xx, zz, cc, None)
        gx, gz, gc = dispatch.multiply_cleanup(
            x, z, c, x[:1], z[:1], np.array([0.0 + 0j]), None
        )
    finally:
        config.backend = old_backend
    assert got[0].shape[0] == want[0].shape[0]  # zeros kept
    assert np.allclose(np.abs(got[2]), 0.0, atol=1e-12)
    # product against a zero-coefficient term: rows survive with coeff 0
    assert gx.shape[0] == x.shape[0]
    assert np.allclose(np.abs(gc), 0.0, atol=1e-12)


def test_clifford_angle_tolerance():
    """Regression (review finding): accumulated-f64 exact multiples must
    classify as Clifford (batching + fused projection); genuinely different
    angles (float32 pi/2 is 4e-8 off) must not."""
    from symmer_tpu.kernels.dispatch import is_clifford_angle

    assert is_clifford_angle(250 * np.pi / 2) == 250
    assert is_clifford_angle(-7 * np.pi / 2 + 1e-13) == -7
    assert is_clifford_angle(np.float32(np.pi / 2)) is None
    assert is_clifford_angle(np.pi / 3) is None
    assert is_clifford_angle(None) == 1
