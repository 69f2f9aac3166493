"""Device-array VQE: the whole objective as one jit-compiled TPU program.

The classic backends (sparse_array / symbolic_*) rebuild the ansatz state on
the host for every objective and parameter-shift evaluation.  The
``device_array`` backend (symmer_tpu/evolution/jx_vqe.py) keeps the dense
statevector on device, evaluates E(x) = <ref|U(x)^dag H U(x)|ref> as one
fused scan over Pauli exponentials + Hamiltonian terms, and obtains the
EXACT gradient from a single jax.grad backward pass instead of 2 * n_params
fresh simulations.

Run: python examples/05_device_vqe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.evolution.variational_optimization import VQE_Driver

rng = np.random.default_rng(0)
n_qubits, n_terms, n_params = 12, 200, 16

H = PauliwordOp.random(n_qubits, n_terms, density=0.4).cleanup()
H.coeff_vec = H.coeff_vec.real.astype(complex)  # Hermitian observable
gens = PauliwordOp.random(n_qubits, n_params, density=0.3).cleanup()
gens = PauliwordOp.from_planes(
    gens.x_pack[:n_params], gens.z_pack[:n_params],
    np.ones(n_params), n_qubits,
)
ref = QuantumState.zero(n_qubits)

driver = VQE_Driver(H, excitation_ops=gens, ref_state=ref)
driver.verbose = False
driver.expectation_eval = "device_array"

x0 = 0.1 * rng.normal(size=driver.n_params)
t0 = time.perf_counter()
opt_out, history = driver.run(x0=x0, method="BFGS", options={"maxiter": 60})
wall = time.perf_counter() - t0

# cross-check the optimum against the host sparse backend
host = VQE_Driver(H, excitation_ops=gens, ref_state=ref)
host.verbose = False
host.expectation_eval = "sparse_array"
e_host = host.f(np.asarray(opt_out["x"]))

print(f"device VQE ({n_qubits}q, {H.n_terms} terms, {n_params} params)")
print(f"  optimized energy : {opt_out['fun']:.10f}")
print(f"  host re-eval     : {e_host:.10f}  (|diff| {abs(e_host - opt_out['fun']):.2e})")
print(f"  iterations       : {len(history['energy'])},  wall {wall:.1f} s")
assert abs(e_host - opt_out["fun"]) < 1e-5
