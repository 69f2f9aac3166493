"""Distributed-cleanup hardening: adversarial skew, capacity sweeps, overflow
detection AND recovery, larger virtual meshes (VERDICT r1 item 8)."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symmer_tpu
from symmer_tpu import PauliwordOp
from symmer_tpu.config import config
from symmer_tpu.kernels import jx_core, pack
from symmer_tpu.parallel.distributed import distributed_cleanup
from symmer_tpu.parallel.mesh import get_mesh


def _canonical(x, z, cr, ci, ns):
    x, z, cr, ci, ns = (np.asarray(a) for a in (x, z, cr, ci, ns))
    n_dev = len(ns)
    C = x.shape[0] // n_dev
    out = {}
    for d in range(n_dev):
        for i in range(d * C, d * C + int(ns[d])):
            key = (x[i].tobytes(), z[i].tobytes())
            assert key not in out
            out[key] = complex(cr[i], ci[i])
    return out


def test_all_duplicates_of_one_term():
    """Adversarial skew: every row is the SAME term -- all T rows route to a
    single home shard.  The pre-round local merge collapses them to one row
    per shard, so even capacity_factor=2 cannot overflow."""
    mesh = get_mesh()
    n_dev = mesh.devices.size
    T, W = 512, 3
    x = np.broadcast_to(
        np.arange(1, W + 1, dtype=np.uint32), (T, W)
    ).copy()
    z = np.broadcast_to(
        np.arange(11, 11 + W, dtype=np.uint32), (T, W)
    ).copy()
    cr = np.full(T, 0.25)
    ci = np.full(T, -1.0)
    n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
    xo, zo, cro, cio, ns, ovf = distributed_cleanup(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        n_local, mesh,
    )
    assert not np.asarray(ovf).any()
    got = _canonical(xo, zo, cro, cio, ns)
    assert len(got) == 1
    ((_, coeff),) = got.items()
    assert np.isclose(coeff, T * (0.25 - 1j))


@pytest.mark.parametrize("capacity_factor", [1, 2, 4])
def test_capacity_factor_sweep(capacity_factor):
    rng = np.random.default_rng(7)
    mesh = get_mesh()
    n_dev = mesh.devices.size
    T, W = 256, 2
    base = rng.integers(0, 2**32, (T // 4, 2 * W)).astype(np.uint32)
    rows = base[rng.integers(0, base.shape[0], T)]
    x, z = rows[:, :W], rows[:, W:]
    cr, ci = rng.normal(size=T), rng.normal(size=T)
    n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
    xo, zo, cro, cio, ns, ovf = distributed_cleanup(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        n_local, mesh, capacity_factor=capacity_factor,
    )
    if np.asarray(ovf).any():
        # tight capacity may legitimately overflow -- must be DETECTED
        assert capacity_factor == 1
        return
    rx, rz, rcr, rci, rn = jx_core.cleanup_sorted(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
        jnp.int32(T), None,
    )
    expected = {}
    rx, rz, rcr, rci = (np.asarray(a) for a in (rx, rz, rcr, rci))
    for i in range(int(rn)):
        expected[(rx[i].tobytes(), rz[i].tobytes())] = complex(rcr[i], rci[i])
    got = _canonical(xo, zo, cro, cio, ns)
    assert set(got) == set(expected)
    assert all(np.isclose(got[k], expected[k]) for k in got)


def test_overflow_detected_and_public_api_recovers():
    """Many DISTINCT terms engineered onto one home shard: capacity_factor=2
    overflows (detected), and the public mesh API still returns the right
    answer by falling back (retry at higher capacity, then gathered path)."""
    mesh = get_mesh()
    n_dev = mesh.devices.size
    T, W64 = 512, 1
    # build distinct rows whose hash low bits all equal 0 (home shard 0)
    rows_x, rows_z = [], []
    v = 0
    while len(rows_x) < T:
        x_row = np.array([[v]], dtype=np.uint64)
        z_row = np.array([[v ^ 0xABCDEF]], dtype=np.uint64)
        h, _ = jx_core.row_hashes(
            jnp.asarray(pack.to_u32(x_row)), jnp.asarray(pack.to_u32(z_row))
        )
        if int(np.asarray(h)[0]) % n_dev == 0:
            rows_x.append(x_row[0])
            rows_z.append(z_row[0])
        v += 1
    x64 = np.array(rows_x, dtype=np.uint64)
    z64 = np.array(rows_z, dtype=np.uint64)
    c = np.arange(1, T + 1).astype(complex)

    # raw kernel at capacity_factor=2: must flag overflow (T rows -> 1 shard
    # of capacity 2 * T/n_dev)
    n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
    *_, ovf = distributed_cleanup(
        jnp.asarray(pack.to_u32(x64)), jnp.asarray(pack.to_u32(z64)),
        jnp.asarray(c.real), jnp.asarray(c.imag),
        n_local, mesh, zero_threshold=1e-15, capacity_factor=2,
    )
    assert np.asarray(ovf).any(), "engineered skew must overflow capacity 2"

    # public API: same data through PauliwordOp.cleanup under use_mesh
    op = PauliwordOp.from_planes(x64, z64, c, 64)
    single = op.cleanup()
    old = config.mesh_threshold
    config.mesh_threshold = 64
    try:
        with symmer_tpu.use_mesh():
            sharded = op.cleanup()
    finally:
        config.mesh_threshold = old
    assert sharded == single
    assert sharded.n_terms == T  # all distinct rows survive


@pytest.mark.slow
def test_mesh_32_virtual_devices():
    """Value parity on a 32-device mesh (needs its own process: the XLA
    device count is fixed at backend init)."""
    code = """
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from symmer_tpu.kernels import jx_core
from symmer_tpu.parallel.distributed import distributed_cleanup
from symmer_tpu.parallel.mesh import get_mesh

rng = np.random.default_rng(0)
mesh = get_mesh()
n_dev = mesh.devices.size
assert n_dev == 32, n_dev
T, W = 2048, 2
base = rng.integers(0, 2**32, (T // 4, 2 * W)).astype(np.uint32)
rows = base[rng.integers(0, base.shape[0], T)]
x, z = rows[:, :W], rows[:, W:]
cr, ci = rng.normal(size=T), rng.normal(size=T)
n_local = np.full(n_dev, T // n_dev, dtype=np.int32)
xo, zo, cro, cio, ns, ovf = distributed_cleanup(
    jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
    n_local, mesh)
assert not np.asarray(ovf).any()
rx, rz, rcr, rci, rn = jx_core.cleanup_sorted(
    jnp.asarray(x), jnp.asarray(z), jnp.asarray(cr), jnp.asarray(ci),
    jnp.int32(T), None)
exp = {}
rx, rz, rcr, rci = (np.asarray(a) for a in (rx, rz, rcr, rci))
for i in range(int(rn)):
    exp[(rx[i].tobytes(), rz[i].tobytes())] = complex(rcr[i], rci[i])
xo, zo, cro, cio, ns = (np.asarray(a) for a in (xo, zo, cro, cio, ns))
C = xo.shape[0] // n_dev
got = {}
for d in range(n_dev):
    for i in range(d * C, d * C + int(ns[d])):
        got[(xo[i].tobytes(), zo[i].tobytes())] = complex(cro[i], cio[i])
assert set(got) == set(exp)
assert all(np.isclose(got[k], exp[k]) for k in got)
print("OK32")
"""
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert "OK32" in out.stdout, out.stdout + out.stderr
