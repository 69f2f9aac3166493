"""Device-resident operator pipelines (DeviceOperator).

Each PauliwordOp operation dispatched to the device pays a full
host->device->host round trip; on a remote-attached chip the transfers
dominate. A DeviceOperator pipeline uploads once, chains the kernels in HBM,
and downloads once:

    $ python examples/06_device_resident_pipeline.py
"""
import time

import numpy as np

from symmer_tpu import PauliwordOp
from symmer_tpu.config import config

np.random.seed(0)
H = PauliwordOp.random(100, 5000).cleanup()
rots = []
for k in range(6):
    p = PauliwordOp.random(100, 1)
    p.coeff_vec[:] = 1
    rots.append((p, None if k % 2 else 0.3 + 0.1 * k))

# --- per-op dispatch: each step moves the operator across the transport ---
config.backend = "device"
H.cleanup().perform_rotations(rots).cleanup()  # warm the compile caches
t0 = time.perf_counter()
out_roundtrip = H.cleanup().perform_rotations(rots).cleanup()
t_roundtrip = time.perf_counter() - t0
config.backend = "auto"

# --- device-resident: one upload, one download ----------------------------
H.to_device().cleanup().perform_rotations(rots).cleanup().to_host()  # warm
t0 = time.perf_counter()
out_resident = H.to_device().cleanup().perform_rotations(rots).cleanup().to_host()
t_resident = time.perf_counter() - t0

assert out_resident == out_roundtrip
print(f"per-op dispatch : {t_roundtrip * 1e3:.0f} ms")
print(f"device-resident : {t_resident * 1e3:.0f} ms")
print(f"terms: {out_resident.n_terms} (results identical)")
