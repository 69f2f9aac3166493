"""Extended-precision (double-float) device-path regression tests.

The main suite runs with x64 enabled (device kernels get native f64, the
double-float lanes stay dormant), so the df path is exercised here in a
subprocess with x64 OFF -- the same configuration as a real TPU deployment.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from symmer_tpu.kernels import jx_df

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER = r"""
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as jeb; jeb.clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", False)  # f32 backend -> df mode active
import numpy as np
from symmer_tpu import PauliwordOp
from symmer_tpu.config import config

assert config.device_precision == "extended"
# keep the double-float emulation active on this CPU host (the production
# default would auto-upgrade extended -> native x64 on CPU)
config.cpu_extended_mode = "df"
np.random.seed(4)
H = PauliwordOp.random(50, 400)
r1 = PauliwordOp.random(50, 1); r1.coeff_vec[:] = 1
r2 = PauliwordOp.random(50, 1); r2.coeff_vec[:] = 1
rots = [(r1, 0.3), (r2, None)]

config.backend = "host"
mh = (H * H).cleanup()
rh = H.perform_rotations(rots)
config.backend = "device"
md = (H * H).cleanup()
rd = H.perform_rotations(rots)
config.backend = "auto"

def rel(a, b):
    da, db = a.to_dictionary, b.to_dictionary
    assert set(da) == set(db), f"term sets differ by {len(set(da) ^ set(db))}"
    s = max(abs(v) for v in db.values())
    return max(abs(da[k] - db[k]) for k in da) / s

# df dense VQE engine vs exact statevector (CPU-f32 floor ~1e-7 from LLVM
# FMA contraction, see jx_df docstring; the same engine measures 5e-14 on
# real TPU hardware)
from symmer_tpu import QuantumState
from symmer_tpu.evolution.jx_vqe import DeviceVQEEngine
import scipy.linalg as sl

nqv = 5
Hv = PauliwordOp.random(nqv, 20)
Hv.coeff_vec = Hv.coeff_vec.real.astype(complex)
gv = PauliwordOp.random(nqv, 4); gv.coeff_vec[:] = 1
refv = QuantumState(np.eye(nqv, dtype=int)[:1]).normalize
xv = np.random.randn(4) * 0.3
eng = DeviceVQEEngine(Hv, gv, refv)
assert eng.df
ev = eng.loss(xv)
gr = eng.gradient(xv)
psi = refv.to_dense_matrix.reshape(-1).astype(complex)
for k in range(4):
    psi = sl.expm(1j * xv[k] * gv[k].to_sparse_matrix.toarray()) @ psi
ev_exact = float(np.real(psi.conj() @ Hv.to_sparse_matrix.toarray() @ psi))
h = 1e-3
xp = xv.copy(); xp[0] += h
xm = xv.copy(); xm[0] -= h
fd = (eng.loss(xp) - eng.loss(xm)) / (2 * h)

print(json.dumps({
    "mul": rel(mh, md), "rot": rel(rh, rd),
    "vqe": abs(ev - ev_exact), "vqe_grad": abs(fd - gr[0]),
}))
"""


def test_host_split_merge_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=1000) * 10.0 ** rng.uniform(-10, 10, 1000)
    hi, lo = jx_df.host_split_f64(v)
    assert hi.dtype == np.float32 and lo.dtype == np.float32
    back = jx_df.host_merge_f64(hi, lo)
    assert np.max(np.abs((back - v) / v)) < 2 ** -45


@pytest.mark.slow
def test_double_float_device_path_subprocess():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", DRIVER], capture_output=True, text=True,
        env=env, timeout=900, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    errs = json.loads(out.stdout.strip().splitlines()[-1])
    assert errs["mul"] < 1e-12, errs
    assert errs["rot"] < 1e-12, errs
    assert errs["vqe"] < 1e-5, errs       # CPU-f32 contraction floor; 5e-14 on TPU
    assert errs["vqe_grad"] < 1e-3, errs


MESH_DRIVER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as jeb; jeb.clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", False)
import json
import numpy as np
import symmer_tpu
from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.config import config
# keep the double-float emulation active on this CPU host (the production
# default would auto-upgrade extended -> native x64 on CPU)
config.cpu_extended_mode = "df"
from symmer_tpu.evolution.jx_vqe import DeviceVQEEngine

np.random.seed(2)
nq = 5
H = PauliwordOp.random(nq, 24)
H.coeff_vec = H.coeff_vec.real.astype(complex)
gens = PauliwordOp.random(nq, 3); gens.coeff_vec[:] = 1
ref = QuantumState(np.eye(nq, dtype=int)[:1]).normalize
x = np.random.randn(3) * 0.3
eng1 = DeviceVQEEngine(H, gens, ref)
assert eng1.df
e1 = eng1.loss(x); g1 = eng1.gradient(x)
with symmer_tpu.use_mesh():
    engm = DeviceVQEEngine(H, gens, ref)
    em = engm.loss(x); gm = engm.gradient(x)
print(json.dumps({"de": abs(e1 - em), "dg": float(np.max(np.abs(g1 - gm)))}))
"""


@pytest.mark.slow
def test_double_float_mesh_vqe_subprocess():
    """df VQE engine under an 8-device mesh agrees with single-device
    (tolerance at the documented CPU-f32 contraction floor; exact on TPU)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", MESH_DRIVER], capture_output=True, text=True,
        env=env, timeout=900, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["de"] < 1e-6, d
    assert d["dg"] < 1e-5, d
