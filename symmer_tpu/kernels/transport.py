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
        # in-process "device": effectively memcpy speed, microsecond dispatch
        return TransportProfile(
            (sync_ms or 0.05) / 1e3,
            (up_mbps or 20e3) * 1e6,
            (down_mbps or 20e3) * 1e6,
            False,
        )

    # --- live probe -------------------------------------------------------
    f = jax.jit(lambda v: v + 1)
    small = jnp.zeros(128, jnp.float32)
    jax.device_get(f(small))  # warm the compile cache
    sync = min(_timed(lambda: jax.device_get(f(small))) for _ in range(3))

    nbytes = 1 << 20
    host_buf = __import__("numpy").zeros(nbytes // 4, dtype="float32")
    dev_buf = jax.device_put(host_buf)
    dev_buf.block_until_ready()
    up = min(
        _timed(lambda: jax.device_put(host_buf).block_until_ready())
        for _ in range(2)
    )
    down = min(_timed(lambda: jax.device_get(dev_buf)) for _ in range(2))
    up_bps = nbytes / max(up - sync, 1e-6)
    down_bps = nbytes / max(down - sync, 1e-6)
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
