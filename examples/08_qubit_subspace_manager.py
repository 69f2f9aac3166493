"""QubitSubspaceManager walkthrough: one object, any target qubit count.

Mirrors the reference's notebook "1.4 QubitSubspaceManager Usage": the
manager composes tapering (exact) with contextual-subspace projection
(approximate) and routes a requested qubit count to the right combination --
including auto-computing a reference state when none is given (on-chip
Lanczos up to config.lanczos_ref_max_qubits, DMRG above).
Run: python examples/08_qubit_subspace_manager.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmer_tpu import PauliwordOp, QubitSubspaceManager
from symmer_tpu.utils import exact_gs_energy

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "hamiltonians", "Be_STO-3G_SINGLET_JW.json",
)
with open(PATH) as f:
    data = json.load(f)

H = PauliwordOp.from_dictionary(data["hamiltonian"])
hf = np.asarray(data["data"]["hf_array"])
fci = exact_gs_energy(H.to_sparse_matrix)[0]
print(f"Be STO-3G: {H.n_qubits} qubits, {H.n_terms} terms, FCI = {fci:.8f}")

# with an explicit Hartree-Fock reference
manager = QubitSubspaceManager(H, ref_state=hf)

print("\n qubits | terms | E(reduced) | error vs FCI")
for n in (H.n_qubits, 7, 5, 3, 2):
    H_n = manager.get_reduced_hamiltonian(n)
    e = exact_gs_energy(H_n.to_sparse_matrix)[0]
    print(f"   {H_n.n_qubits:4d} | {H_n.n_terms:5d} | {e: .8f} | {abs(e - fci):.2e}")

# no reference given: the manager computes one itself (exact on-chip
# Lanczos at this size; DMRG beyond config.lanczos_ref_max_qubits)
auto = QubitSubspaceManager(H)
H_3 = auto.get_reduced_hamiltonian(3)
e_3 = exact_gs_energy(H_3.to_sparse_matrix)[0]
print(f"\nauto-reference 3-qubit reduction: E = {e_3:.8f} "
      f"(error {abs(e_3 - fci):.2e})")

# auxiliary operators (e.g. dipole moments, CCSD amplitudes) project through
# the same subspace so expectation values stay consistent; a slice of H
# itself makes a faithful demo (its terms respect the symmetries)
aux = H.sort()[:12]
aux_p = manager.project_auxiliary_operator(aux)
print(f"auxiliary operator projected: {aux.n_qubits}q/{aux.n_terms}t -> "
      f"{aux_p.n_qubits}q/{aux_p.n_terms}t")
