"""Distributed (never-gathered) cleanup vs the single-chip reference kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmer_tpu.kernels import jx_core
from symmer_tpu.parallel.distributed import distributed_cleanup
from symmer_tpu.parallel.mesh import get_mesh


def _random_planes(rng, T, W, dup_factor=4, n_valid=None):
    base = rng.integers(0, 2**32, (max(T // dup_factor, 1), 2 * W)).astype(np.uint32)
    rows = base[rng.integers(0, base.shape[0], T)]
    x, z = rows[:, :W], rows[:, W:]
    cr = rng.normal(size=T)
    ci = rng.normal(size=T)
    return x, z, cr, ci


def _canonical(x, z, cr, ci, n):
    """Set of (row-bytes -> coeff) for comparison."""
    x, z, cr, ci = (np.asarray(a) for a in (x, z, cr, ci))
    out = {}
    for i in range(int(n)):
        key = (x[i].tobytes(), z[i].tobytes())
        assert key not in out, "duplicate row survived cleanup"
        out[key] = complex(cr[i], ci[i])
    return out


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("zero_threshold", [None, 1e-10])
def test_distributed_matches_single_device(seed, zero_threshold):
    rng = np.random.default_rng(seed)
    n_dev = len(jax.devices())
    assert n_dev == 8  # conftest forces 8 virtual CPU devices
    T, W = 512, 3
    x, z, cr, ci = _random_planes(rng, T, W)
    # make some exact cancellations so the threshold path is exercised
    x[1], z[1], cr[1], ci[1] = x[0], z[0], -cr[0], -ci[0]

    mesh = get_mesh()
    n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
    xo, zo, cro, cio, n_out, ovf = distributed_cleanup(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        n_local, mesh, zero_threshold=zero_threshold,
    )
    assert not np.asarray(ovf).any()

    # reference: single-device cleanup of the same rows
    zt = None if zero_threshold is None else jnp.asarray(zero_threshold)
    rx, rz, rcr, rci, rn = jx_core.cleanup_sorted(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        jnp.int32(T), zt,
    )
    expected = _canonical(rx, rz, rcr, rci, rn)

    # collect all shards of the distributed result
    xo, zo, cro, cio = (np.asarray(a) for a in (xo, zo, cro, cio))
    n_out = np.asarray(n_out)
    C = xo.shape[0] // n_dev
    got = {}
    for d in range(n_dev):
        sl = slice(d * C, d * C + int(n_out[d]))
        part = _canonical(xo[sl], zo[sl], cro[sl], cio[sl], int(n_out[d]))
        assert not (set(part) & set(got)), "same term on two shards"
        got.update(part)

    assert set(got) == set(expected)
    for key, val in expected.items():
        assert abs(got[key] - val) < 1e-12


def test_ragged_shard_counts():
    """Shards with different valid counts (including an empty one)."""
    rng = np.random.default_rng(7)
    n_dev = len(jax.devices())
    T, W = 256, 2
    x, z, cr, ci = _random_planes(rng, T, W, dup_factor=8)
    mesh = get_mesh()
    T_local = T // n_dev
    n_local = rng.integers(0, T_local + 1, n_dev).astype(np.int32)
    n_local[2] = 0

    xo, zo, cro, cio, n_out, ovf = distributed_cleanup(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        n_local, mesh,
    )
    assert not np.asarray(ovf).any()

    # reference over only the valid prefix of each shard
    keep = np.zeros(T, dtype=bool)
    for d in range(n_dev):
        keep[d * T_local : d * T_local + n_local[d]] = True
    idx = np.where(keep)[0]
    rx, rz, rcr, rci, rn = jx_core.cleanup_sorted(
        jnp.asarray(np.ascontiguousarray(x[idx])),
        jnp.asarray(np.ascontiguousarray(z[idx])),
        jnp.asarray(cr[idx]), jnp.asarray(ci[idx]),
        jnp.int32(len(idx)), None,
    )
    expected = _canonical(rx, rz, rcr, rci, rn)

    xo, zo, cro, cio = (np.asarray(a) for a in (xo, zo, cro, cio))
    n_out = np.asarray(n_out)
    C = xo.shape[0] // n_dev
    got = {}
    for d in range(n_dev):
        sl = slice(d * C, d * C + int(n_out[d]))
        got.update(_canonical(xo[sl], zo[sl], cro[sl], cio[sl], int(n_out[d])))

    assert set(got) == set(expected)
    for key, val in expected.items():
        assert abs(got[key] - val) < 1e-12


def test_overflow_detected():
    """Adversarial routing must flag overflow, never drop rows silently.

    Duplicates can no longer overflow (they merge locally before routing),
    so the adversarial case is many DISTINCT rows whose hash bits all
    address the same shard -- selected here by evaluating the actual
    routing hash."""
    n_dev = len(jax.devices())
    T, W = 128, 2
    rng = np.random.default_rng(0)
    pool_x = rng.integers(0, 2**32, (40 * T, W)).astype(np.uint32)
    pool_z = rng.integers(0, 2**32, (40 * T, W)).astype(np.uint32)
    h1, _ = jx_core.row_hashes(jnp.asarray(pool_x), jnp.asarray(pool_z))
    target = np.where((np.asarray(h1) % n_dev) == 0)[0][:T]
    assert len(target) == T
    x, z = pool_x[target], pool_z[target]
    cr, ci = np.ones(T), np.zeros(T)
    mesh = get_mesh()
    n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
    # all 128 distinct rows route to shard 0 of capacity 16 -> must flag
    *_, n_out, ovf = distributed_cleanup(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        n_local, mesh, capacity_factor=1,
    )
    assert np.asarray(ovf).any()


@pytest.mark.parametrize("capacity_factor", [2, 3, 4])
def test_capacity_factor_sweep_skewed(capacity_factor):
    """Skewed duplication (one hot term dominating) across capacities."""
    rng = np.random.default_rng(11)
    n_dev = len(jax.devices())
    T, W = 256, 2
    x, z, cr, ci = _random_planes(rng, T, W, dup_factor=2)
    # half of all rows are ONE term -> they all route to a single shard
    hot = rng.integers(0, 2**32, (1, 2 * W)).astype(np.uint32)
    sel = rng.choice(T, T // 2, replace=False)
    x[sel], z[sel] = hot[:, :W], hot[:, W:]
    mesh = get_mesh()
    n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
    xo, zo, cro, cio, n_out, ovf = distributed_cleanup(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        n_local, mesh, capacity_factor=capacity_factor,
    )
    if np.asarray(ovf).any():
        pytest.skip(f"routing overflow at capacity_factor={capacity_factor}")
    rx, rz, rcr, rci, rn = jx_core.cleanup_sorted(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        jnp.int32(T), None,
    )
    expected = _canonical(rx, rz, rcr, rci, rn)
    xo, zo, cro, cio = (np.asarray(a) for a in (xo, zo, cro, cio))
    n_out = np.asarray(n_out)
    C = xo.shape[0] // n_dev
    got = {}
    for d in range(n_dev):
        sl = slice(d * C, d * C + int(n_out[d]))
        got.update(_canonical(xo[sl], zo[sl], cro[sl], cio[sl], int(n_out[d])))
    assert set(got) == set(expected)
    for key, val in expected.items():
        assert abs(got[key] - val) < 1e-12
