"""Device-cleanup fuzz: hash-signature fast path vs exact path vs host oracle.

Adversarial mixes: heavy duplication, exact cancellations straddling the zero
threshold, ragged validity counts, single-row and empty inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmer_tpu.kernels import jx_core


def _collect(out):
    x, z, cr, ci, n = (np.asarray(a) for a in out)
    n = int(n)
    d = {}
    for i in range(n):
        key = (x[i].tobytes(), z[i].tobytes())
        assert key not in d, "duplicate row in cleanup output"
        d[key] = complex(cr[i], ci[i])
    # all rows past n_out must be zeroed
    assert not x[n:].any() and not z[n:].any()
    assert not cr[n:].any() and not ci[n:].any()
    return d


def _host_oracle(x, z, cr, ci, n_valid, thr):
    d = {}
    for i in range(n_valid):
        key = (x[i].tobytes(), z[i].tobytes())
        d[key] = d.get(key, 0) + complex(cr[i], ci[i])
    if thr is not None:
        d = {k: v for k, v in d.items() if abs(v) > thr}
    return d


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("thr", [None, 1e-10])
def test_cleanup_fast_vs_exact_vs_oracle(seed, thr):
    rng = np.random.default_rng(seed)
    T = int(rng.integers(1, 200))
    W = int(rng.integers(1, 5))
    n_valid = int(rng.integers(0, T + 1))
    # few distinct rows -> heavy duplication
    n_distinct = max(1, T // int(rng.integers(2, 8)))
    base = rng.integers(0, 2**32, (n_distinct, 2 * W)).astype(np.uint32)
    rows = base[rng.integers(0, n_distinct, T)]
    x, z = rows[:, :W].copy(), rows[:, W:].copy()
    cr = rng.normal(size=T)
    ci = rng.normal(size=T)
    # plant exact cancellations: pairs of equal rows with opposite coeffs
    for _ in range(min(3, n_valid // 2)):
        i, j = rng.integers(0, max(n_valid, 1), 2)
        x[j], z[j] = x[i], z[i]
        cr[j], ci[j] = -cr[i], -ci[i]

    args = (jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
            jnp.int32(n_valid))
    t = None if thr is None else jnp.asarray(thr)
    fast = _collect(jx_core.cleanup_sorted(*args, t))
    exact = _collect(jx_core.cleanup_sorted(*args, t, exact=True))
    oracle = _host_oracle(x, z, cr, ci, n_valid, thr)
    if thr is None:
        # without a threshold exact zeros are kept by all implementations
        assert set(fast) == set(exact) == set(oracle)
    else:
        assert set(fast) == set(exact) == set(oracle)
    for k, v in oracle.items():
        assert abs(fast[k] - v) < 1e-9
        assert abs(exact[k] - v) < 1e-9


def test_cleanup_empty_and_single():
    W = 2
    x = jnp.zeros((4, W), jnp.uint32)
    z = jnp.zeros((4, W), jnp.uint32)
    cr = jnp.ones(4)
    ci = jnp.zeros(4)
    # empty
    out = jx_core.cleanup_sorted(x, z, cr, ci, jnp.int32(0), jnp.asarray(1e-10))
    assert int(out[4]) == 0
    # single valid row
    out = jx_core.cleanup_sorted(x, z, cr, ci, jnp.int32(1), jnp.asarray(1e-10))
    assert int(out[4]) == 1
    assert float(out[2][0]) == 1.0
    # all four identical rows merge
    out = jx_core.cleanup_sorted(x, z, cr, ci, jnp.int32(4), jnp.asarray(1e-10))
    assert int(out[4]) == 1
    assert float(out[2][0]) == 4.0


def test_f32_relative_threshold_floor():
    """Float32 coefficients: cancellation residue (~eps32 * |c|) sits above
    the f64-style absolute threshold; the rel_floor policy must drop it
    (config.f32_threshold_rel_floor; VERDICT r1 'f32 zero-threshold').
    """
    # two copies of the same term that cancel, plus one surviving term
    x = jnp.asarray(np.array([[3, 1], [3, 1], [5, 0]], dtype=np.uint32))
    z = jnp.asarray(np.array([[0, 2], [0, 2], [1, 1]], dtype=np.uint32))
    big = np.float32(1e4)
    cr = jnp.asarray(np.array([big, -(big * (1 + np.float32(3e-7))), 1.0], np.float32))
    ci = jnp.zeros(3, jnp.float32)
    th = jnp.asarray(1e-15, jnp.float32)

    # without the floor the ~3e-3 residue (3e-7 relative of 1e4) survives
    *_, n_no_floor = jx_core.cleanup_sorted(x, z, cr, ci, 3, th)
    assert int(n_no_floor) == 2

    # with the floor (2e-6 * max|c| = 2e-2) it is dropped
    fl = jnp.asarray(2e-6, jnp.float32)
    out = jx_core.cleanup_sorted(x, z, cr, ci, 3, th, rel_floor=fl)
    d = _collect(out)
    assert len(d) == 1
    (key,) = d
    assert key == (
        np.array([5, 0], np.uint32).tobytes(), np.array([1, 1], np.uint32).tobytes()
    )

    # the floor must NOT eat genuinely small terms above rel_floor * max|c|
    cr2 = jnp.asarray(np.array([big, -big / 2, 1.0], np.float32))
    out2 = jx_core.cleanup_sorted(x, z, cr2, ci, 3, th, rel_floor=fl)
    assert len(_collect(out2)) == 2


@pytest.mark.parametrize("seed", range(4))
def test_ride_lanes_vs_gather_fallback(seed, monkeypatch):
    """Plane-lane payload riding vs the representative-row gather fallback.

    Operators wider than ``_RIDE_MAX_WORDS`` take the gather path (the lane
    tuple would explode trace time); forcing the threshold to 0 must leave
    every output of ``cleanup_sorted`` and ``rotate_nonclifford_cleanup``
    bit-identical to the riding fast path.
    """
    rng = np.random.default_rng(100 + seed)
    T, W = 64, 3
    n_distinct = 12
    base = rng.integers(0, 2**32, (n_distinct, 2 * W)).astype(np.uint32)
    rows = base[rng.integers(0, n_distinct, T)]
    x = jnp.asarray(rows[:, :W])
    z = jnp.asarray(rows[:, W:])
    cr = jnp.asarray(rng.normal(size=T))
    ci = jnp.asarray(rng.normal(size=T))
    n_valid = jnp.int32(T - 5)
    thr = jnp.asarray(1e-10)
    xr = jnp.asarray(rng.integers(0, 2**32, W).astype(np.uint32))
    zr = jnp.asarray(rng.integers(0, 2**32, W).astype(np.uint32))

    ride_c = _collect(jx_core.cleanup_sorted(x, z, cr, ci, n_valid, thr))
    ride_r = _collect(jx_core.rotate_nonclifford_cleanup(
        x, z, cr, ci, xr, zr, 0.37, n_valid, thr))

    monkeypatch.setattr(jx_core, "_RIDE_MAX_WORDS", 0)
    gath_c = _collect(jx_core.cleanup_sorted(x, z, cr, ci, n_valid, thr))
    gath_r = _collect(jx_core.rotate_nonclifford_cleanup(
        x, z, cr, ci, xr, zr, 0.37, n_valid, thr))

    assert ride_c == gath_c  # exact: same sums in the same segment order
    assert ride_r.keys() == gath_r.keys()
    for k in ride_r:
        assert abs(ride_r[k] - gath_r[k]) < 1e-12
