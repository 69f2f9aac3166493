"""Exact ground states ON the accelerator: the fused device Lanczos.

The reference's ``exact_gs_energy`` builds a scipy CSR matrix on the host
and runs ARPACK — at 15+ qubits, minutes, nearly all of it spent building
the matrix.  ``exact_gs_energy_device`` never materialises a matrix: the
whole Krylov iteration runs as jitted XOR-permutation matvecs over
X-grouped diagonals, in extended (double-float) precision on f32 backends.

Run: python examples/07_device_eigensolver.py
(On CPU the solver transparently switches the permutations from one-hot
MXU matmuls to row gathers; under ``symmer_tpu.use_mesh`` the diagonal
table shards across devices.)
"""
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from symmer_tpu import PauliwordOp
from symmer_tpu.config import enable_compile_cache, enable_x64
from symmer_tpu.utils import exact_gs_energy, exact_gs_energy_device

if jax.default_backend() == "cpu":
    enable_x64()  # CPU has native f64: skip the double-float emulation
else:
    enable_compile_cache()  # pay remote compiles once, not per process

# a synthetic molecular-style Hamiltonian (hermitian, real coefficients)
np.random.seed(11)
op = PauliwordOp.random(12, 400, complex_coeffs=False)
H = (op + op.dagger).cleanup()
print(f"operator: {H.n_qubits} qubits, {H.n_terms} terms")

t0 = time.perf_counter()
gs_dev, psi = exact_gs_energy_device(H)
t_dev = time.perf_counter() - t0
print(f"device Lanczos:    E0 = {gs_dev:.14f}   ({t_dev:.2f} s)")

t0 = time.perf_counter()
gs_host, _ = exact_gs_energy(H.to_sparse_matrix)
t_host = time.perf_counter() - t0
print(f"host CSR+ARPACK:   E0 = {gs_host:.14f}   ({t_host:.2f} s)")
print(f"|dE| = {abs(gs_dev - gs_host):.2e}")

# the returned QuantumState plugs into everything else
e_check = np.real(H.expval(psi.normalize))
print(f"<psi|H|psi> via operator expval = {e_check:.12f}")

# --- degenerate multiplets with multiplicity (deflated restarts) ---------
# a single Krylov vector sees one vector per DISTINCT eigenvalue; the
# deflated solver locks converged states and re-runs in their orthogonal
# complement, recovering degenerate partners one sweep at a time
from symmer_tpu.utils import exact_lowest_states_device

h2q = PauliwordOp.random(2, 6, complex_coeffs=False)
h2q = (h2q + h2q.dagger).cleanup()
H_deg = h2q.tensor(PauliwordOp.from_dictionary({"I": 1.0}))  # doubles levels
evals, states = exact_lowest_states_device(H_deg, 4)
print("\nlowest 4 WITH multiplicity:", np.round(evals, 10))
print("pairwise degenerate:", np.isclose(evals[0], evals[1]),
      np.isclose(evals[2], evals[3]))
