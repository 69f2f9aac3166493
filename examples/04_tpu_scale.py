"""Large-operator algebra on the device kernel path.

Demonstrates the regimes the reference advertises as one-second laptop
operations (symmer README), executed as fused XLA programs:

  - a 1,000-qubit operator with 20,000 terms rotated by a non-Clifford
    unitary (with duplicate-merging cleanup),
  - a depth-500 Clifford sequence applied as a single lax.scan,
  - a 1,000,000-qubit single-term product.

Run: python examples/04_tpu_scale.py        (TPU or CPU backend)
"""
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmer_tpu import PauliwordOp
from symmer_tpu.config import config
from symmer_tpu.kernels import pack

rng = np.random.default_rng(0)
config.backend = "device"  # force the XLA path for the demonstration

# ---------------------------------------------------------------------------
n_qubits, n_terms = 1000, 20_000
print(f"building a {n_qubits}-qubit, {n_terms}-term operator ...")
W = pack.n_words_for(n_qubits)
x = rng.integers(0, 2**64, (n_terms, W), dtype=np.uint64) & pack.qubit_mask(n_qubits)
z = rng.integers(0, 2**64, (n_terms, W), dtype=np.uint64) & pack.qubit_mask(n_qubits)
coeffs = rng.normal(size=n_terms)
H = PauliwordOp.from_planes(x, z, coeffs, n_qubits).cleanup()
print(f"  {H.n_terms} unique terms")

R = PauliwordOp.from_planes(
    rng.integers(0, 2**64, (1, W), dtype=np.uint64) & pack.qubit_mask(n_qubits),
    rng.integers(0, 2**64, (1, W), dtype=np.uint64) & pack.qubit_mask(n_qubits),
    [1], n_qubits,
)

t0 = time.perf_counter()
H_rot = H.perform_rotations([(R, 0.3)])
print(f"non-Clifford rotation + cleanup: {H_rot.n_terms} terms "
      f"in {time.perf_counter() - t0:.2f} s (includes jit compile)")

# ---------------------------------------------------------------------------
depth = 500
cliffords = []
for _ in range(depth):
    P = PauliwordOp.from_planes(
        rng.integers(0, 2**64, (1, W), dtype=np.uint64) & pack.qubit_mask(n_qubits),
        rng.integers(0, 2**64, (1, W), dtype=np.uint64) & pack.qubit_mask(n_qubits),
        [1], n_qubits,
    )
    cliffords.append((P, np.pi / 2 * int(rng.integers(1, 4))))

t0 = time.perf_counter()
H_cliff = H.perform_rotations(cliffords)
print(f"depth-{depth} Clifford sequence (one lax.scan): {H_cliff.n_terms} terms "
      f"in {time.perf_counter() - t0:.2f} s")
assert H_cliff.n_terms == H.n_terms  # Clifford conjugation preserves term count

# ---------------------------------------------------------------------------
n_huge = 1_000_000
s1 = "".join(rng.choice(list("IXYZ"), n_huge))
s2 = "".join(rng.choice(list("IXYZ"), n_huge))
t0 = time.perf_counter()
prod = PauliwordOp.from_list([s1]) * PauliwordOp.from_list([s2])
print(f"{n_huge:,}-qubit single-term product in {time.perf_counter() - t0:.2f} s "
      f"(weight {int(pack.popcount_rows(prod.x_pack | prod.z_pack)[0]):,})")

config.backend = "auto"
