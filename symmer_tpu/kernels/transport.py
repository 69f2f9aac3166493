"""Transport probe: measured host<->device latency and bandwidth.

The auto dispatch decisions in :mod:`kernels.dispatch` trade host compute
time against device round trips.  On a locally-attached TPU a dispatch+sync
costs ~100 us and PCIe moves GB/s; through a remote PJRT relay (tunnelled
chip) a sync costs ~30 ms and bandwidth can be as low as tens of MB/s -- the
break-even problem size shifts by orders of magnitude between the two.  The
reference never faces this (its accelerators are in-process numba/Rust,
process_handler.py chunks over local cores); a TPU-native framework must
measure, not assume.

The probe runs lazily once per process (first time an auto decision needs
it), costs ~0.3 s on a slow tunnel, and can be skipped entirely via env
overrides (useful for deterministic tests and known deployments):

    SYMMER_TPU_SYNC_MS      dispatch+fetch round-trip latency
    SYMMER_TPU_UP_MBPS      host->device bandwidth
    SYMMER_TPU_DOWN_MBPS    device->host bandwidth
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class TransportProfile:
    sync_s: float    # one dispatch + scalar fetch round trip
    up_bps: float    # host -> device bytes/second
    down_bps: float  # device -> host bytes/second
    probed: bool     # False when env-overridden or CPU-backend defaults

    def device_time(self, up_bytes: float, down_bytes: float,
                    n_syncs: int = 1, compute_s: float = 0.0) -> float:
        return (
            n_syncs * self.sync_s
            + up_bytes / self.up_bps
            + down_bytes / self.down_bps
            + compute_s
        )


def _env_float(name):
    v = os.environ.get(name)
    return float(v) if v else None


@functools.lru_cache(maxsize=None)
def profile() -> TransportProfile:
    sync_ms = _env_float("SYMMER_TPU_SYNC_MS")
    up_mbps = _env_float("SYMMER_TPU_UP_MBPS")
    down_mbps = _env_float("SYMMER_TPU_DOWN_MBPS")
    if sync_ms is not None and up_mbps is not None and down_mbps is not None:
        return TransportProfile(sync_ms / 1e3, up_mbps * 1e6, down_mbps * 1e6, False)

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        # in-process "device": effectively memcpy speed, microsecond
        # dispatch.  `is None` (not truthiness) so an explicit 0 override
        # means what it says, as in the live-probe branch below
        return TransportProfile(
            (0.05 if sync_ms is None else sync_ms) / 1e3,
            (20e3 if up_mbps is None else up_mbps) * 1e6,
            (20e3 if down_mbps is None else down_mbps) * 1e6,
            False,
        )

    # --- live probe -------------------------------------------------------
    f = jax.jit(lambda v: v + 1)
    small = jnp.zeros(128, jnp.float32)
    jax.device_get(f(small))  # warm the compile cache
    sync = min(_timed(lambda: jax.device_get(f(small))) for _ in range(3))

    # Download probe subtleties (all observed on the axon relay):
    #   - the buffer must be device-COMPUTED: uploaded buffers are served
    #     back from a host-side cache at memory speed;
    #   - a buffer may only be fetched ONCE: repeat fetches hit the cache;
    #   - block_until_ready can resolve before remote execution completes,
    #     so the computation is synced via a prior fetch of a sibling buffer.
    nbytes_up, nbytes_down = 1 << 20, 1 << 22
    np_ = __import__("numpy")
    host_buf = np_.zeros(nbytes_up // 4, dtype="float32")
    up = min(
        _timed(lambda: jax.device_put(host_buf).block_until_ready())
        for _ in range(2)
    )
    g = jax.jit(lambda v, s: v + s)
    total = jax.jit(lambda v: v.sum())
    base = jax.device_put(np_.zeros(nbytes_down // 4, dtype="float32"))
    jax.device_get(total(g(base, 1.0)))  # compile + true execution sync
    fresh = g(base, 2.0)
    jax.device_get(total(fresh))  # scalar fetch syncs fresh's execution
    down = _timed(lambda: jax.device_get(fresh))
    up_bps = nbytes_up / max(up - sync, 1e-6)
    down_bps = nbytes_down / max(down - sync, 1e-6)
    return TransportProfile(
        sync if sync_ms is None else sync_ms / 1e3,
        up_bps if up_mbps is None else up_mbps * 1e6,
        down_bps if down_mbps is None else down_mbps * 1e6,
        True,
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
