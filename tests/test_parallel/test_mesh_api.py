"""Mesh-sharded execution reachable from the PUBLIC operator API.

``with symmer_tpu.use_mesh():`` must route cleanup / multiply / rotation
sequences through the term-sharded kernels (term axis never gathered on
device) and give results identical (f64, exact term sets) to the
single-device path -- VERDICT r1 item 1.
"""
import numpy as np
import pytest

import symmer_tpu
from symmer_tpu import PauliwordOp
from symmer_tpu.config import config
from symmer_tpu.profiling import kernel_stats


@pytest.fixture(autouse=True)
def _low_mesh_threshold():
    old_th, old_backend = config.mesh_threshold, config.backend
    config.mesh_threshold = 64
    yield
    config.mesh_threshold = old_th
    config.backend = old_backend


def _dup_heavy_op(nq, T, seed):
    rng = np.random.default_rng(seed)
    base = PauliwordOp.random(nq, max(T // 4, 1), density=0.5)
    idx = rng.integers(0, base.n_terms, T)
    return PauliwordOp.from_planes(
        base.x_pack[idx], base.z_pack[idx],
        rng.normal(size=T) + 1j * rng.normal(size=T), nq,
    )


def test_mesh_cleanup_matches_single_device():
    op = _dup_heavy_op(70, 4096, 0)
    single = op.cleanup()
    kernel_stats.reset()
    with symmer_tpu.use_mesh():
        sharded = op.cleanup()
    assert kernel_stats.mesh_calls["cleanup"] == 1
    assert sharded == single
    # exact coefficient equality at f64 (same partial sums per term)
    d1, d2 = single.to_dictionary, sharded.to_dictionary
    assert set(d1) == set(d2)
    assert max(abs(d1[k] - d2[k]) for k in d1) < 1e-12


def test_mesh_multiply_matches_single_device():
    a = _dup_heavy_op(70, 512, 1)
    b = PauliwordOp.random(70, 24, density=0.5)
    single = a * b
    kernel_stats.reset()
    with symmer_tpu.use_mesh():
        sharded = a * b
    assert kernel_stats.mesh_calls["multiply"] == 1
    assert sharded == single


def test_mesh_square_large_operator():
    """(H * H).cleanup() for a 2^9-term operator -> 2^18 product terms,
    executed sharded, matching the single-device result exactly (f64)."""
    H = PauliwordOp.random(100, 512, density=0.4)
    single = (H * H).cleanup()
    kernel_stats.reset()
    with symmer_tpu.use_mesh():
        sharded = (H * H).cleanup()
    assert kernel_stats.mesh_calls["multiply"] >= 1
    d1, d2 = single.to_dictionary, sharded.to_dictionary
    assert set(d1) == set(d2)
    scale = max(abs(v) for v in d1.values())
    assert max(abs(d1[k] - d2[k]) for k in d1) < 1e-12 * scale


def test_mesh_rotations_match_single_device():
    np.random.seed(5)
    op = _dup_heavy_op(70, 512, 2)
    rots = []
    for k in range(9):
        p = PauliwordOp.random(70, 1)
        p.coeff_vec[:] = 1
        rots.append((p, None if k % 3 else 0.15 + 0.1 * k))
    single = op.perform_rotations(rots)
    kernel_stats.reset()
    with symmer_tpu.use_mesh():
        sharded = op.perform_rotations(rots)
    assert kernel_stats.mesh_calls["perform_rotations"] == 1
    assert sharded == single


def test_mesh_threshold_gates_routing():
    op = _dup_heavy_op(10, 32, 3)  # below the (lowered) mesh threshold
    kernel_stats.reset()
    with symmer_tpu.use_mesh():
        op.cleanup()
    assert kernel_stats.mesh_calls["cleanup"] == 0


def test_use_mesh_restores_config():
    assert config.mesh is None
    with symmer_tpu.use_mesh() as mesh:
        assert config.mesh is mesh
    assert config.mesh is None


def test_mesh_sharded_expval_matches_single_device():
    """Term-axis sharded <psi|O|psi> (one psum) == single-device expval."""
    import numpy as np

    import symmer_tpu
    from symmer_tpu import PauliwordOp, QuantumState
    from symmer_tpu.config import config
    from symmer_tpu.profiling import kernel_stats

    rng = np.random.default_rng(4)
    nq, B, T = 40, 48, 4000
    psi = QuantumState.random(nq, B)
    s = psi._s_pack
    hop = rng.integers(0, len(s), (T // 2, 2))
    x = np.vstack([
        np.zeros((T - T // 2, s.shape[1]), np.uint64),
        s[hop[:, 0]] ^ s[hop[:, 1]],
    ])
    z = PauliwordOp.random(nq, T, density=0.3).z_pack
    coeffs = rng.normal(size=T) + 1j * rng.normal(size=T)
    op = PauliwordOp.from_planes(x, z, coeffs, nq)

    single = op.expval(psi)
    old = config.mesh_threshold
    config.mesh_threshold = 1024
    try:
        kernel_stats.reset()
        with symmer_tpu.use_mesh():
            shard = op.expval(psi)
    finally:
        config.mesh_threshold = old
    assert kernel_stats.mesh_calls["expval"] >= 1, "sharded expval not taken"
    assert abs(shard - single) < 1e-10 * max(abs(single), 1.0)


def test_mesh_fused_taper_projection_parity():
    """Full taper flow under use_mesh routes through the term-sharded fused
    projection (distributed_clifford_project) and matches the single-device
    result exactly (VERDICT r2 item 2)."""
    from symmer_tpu import QubitTapering

    rng = np.random.default_rng(9)
    nq, T, n_sym = 32, 2000, 2
    block = nq // n_sym
    xb = rng.integers(0, 2, (T, nq)).astype(bool)
    zb = rng.integers(0, 2, (T, nq)).astype(bool)
    for k in range(n_sym):
        parity = xb[:, k * block : (k + 1) * block].sum(axis=1) & 1
        xb[parity == 1, k * block] ^= True
    coeffs = (rng.integers(-8, 9, T) + 1j * rng.integers(-8, 9, T)).astype(complex)
    H = PauliwordOp(np.hstack([xb, zb]), coeffs).cleanup()
    ref = np.zeros(nq, dtype=int)

    config.backend = "device"
    single = QubitTapering(H).taper_it(ref_state=ref)
    kernel_stats.reset()
    with symmer_tpu.use_mesh():
        shard = QubitTapering(H).taper_it(ref_state=ref)
    config.backend = "auto"
    assert kernel_stats.mesh_calls["clifford_rotate_project"] >= 1, (
        "sharded fused projection not taken"
    )
    assert shard == single, "sharded fused projection != single-device"
