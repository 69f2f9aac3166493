"""CS-VQE walkthrough: Be STO-3G, taper 10 -> 5 qubits exactly, then project
into a 3-qubit contextual subspace with chemical-accuracy-scale error.

Run: python examples/02_contextual_subspace_be.py
(requires the reference molecular test data mounted at /root/reference)
"""
import json

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmer_tpu import ContextualSubspace, PauliwordOp, QubitTapering
from symmer_tpu.utils import exact_gs_energy

with open("/root/reference/tests/hamiltonian_data/Be_STO-3G_SINGLET_JW.json") as f:
    data = json.load(f)

H = PauliwordOp.from_dictionary(data["hamiltonian"])
CC = PauliwordOp.from_dictionary(data["data"]["auxiliary_operators"]["UCCSD_operator"])
fci = data["data"]["calculated_properties"]["FCI"]["energy"]
hf = data["data"]["calculated_properties"]["HF"]["energy"]

print(f"Be Hamiltonian: {H.n_qubits} qubits, {H.n_terms} terms")

# step 1: exact Z2 tapering
QT = QubitTapering(H)
H_taper = QT.taper_it(ref_state=data["data"]["hf_array"])
CC_taper = QT.taper_it(aux_operator=CC)
print(f"tapered to {H_taper.n_qubits} qubits ({H_taper.n_terms} terms)")
print(f"tapered gs error vs FCI: {abs(exact_gs_energy(H_taper.to_sparse_matrix)[0] - fci):.2e}")

# step 2: contextual subspace
CS = ContextualSubspace(H_taper, noncontextual_strategy="SingleSweep_magnitude")
print(f"\nnoncontextual energy = {CS.noncontextual_operator.energy:.8f} (HF = {hf:.8f})")

for n_qubits in [1, 2, 3, 4]:
    CS.update_stabilizers(n_qubits, aux_operator=CC_taper, strategy="aux_preserving")
    H_cs = CS.project_onto_subspace()
    if isinstance(H_cs, float):
        err = abs(H_cs - fci)
        print(f"  {n_qubits} qubits: noncontextual energy, error {err:.2e}")
    else:
        err = abs(exact_gs_energy(H_cs.to_sparse_matrix)[0] - fci)
        print(f"  {H_cs.n_qubits} qubits, {H_cs.n_terms:3d} terms: error vs FCI {err:.2e}")
