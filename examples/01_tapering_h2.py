"""Qubit tapering walkthrough: H2 STO-3G from 4 qubits to 1, preserving FCI.

Mirrors the reference's flagship flow (symmer README "tapering" example).
Run: python examples/01_tapering_h2.py
"""
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmer_tpu import PauliwordOp, QuantumState, QubitTapering
from symmer_tpu.utils import exact_gs_energy

H2 = {
    "IIII": -0.05933866442819677, "IIIZ": -0.23676939575319134,
    "IIZI": -0.23676939575319134, "IIZZ": 0.17571274411978302,
    "IZII": 0.17579122569046912, "IZIZ": 0.12223870791335416,
    "IZZI": 0.16715312911492025, "ZIII": 0.17579122569046912,
    "ZIIZ": 0.16715312911492025, "ZIZI": 0.12223870791335416,
    "ZZII": 0.17002500620877006, "XXYY": -0.044914421201566114,
    "XYYX": 0.044914421201566114, "YXXY": 0.044914421201566114,
    "YYXX": -0.044914421201566114,
}

H = PauliwordOp.from_dictionary(H2)
print(f"H2 Hamiltonian: {H.n_qubits} qubits, {H.n_terms} terms")

QT = QubitTapering(H)
print(f"\nZ2 symmetry generators found ({QT.n_taper}):")
print(QT.symmetry_generators)

hf_state = QuantumState([1, 1, 0, 0])
H_taper = QT.taper_it(ref_state=hf_state)
print(f"\ntapered Hamiltonian ({H_taper.n_qubits} qubit):")
print(H_taper)

gs_full = exact_gs_energy(H.to_sparse_matrix)[0]
gs_taper = exact_gs_energy(H_taper.to_sparse_matrix)[0]
print(f"\nground state energy  full: {gs_full:.12f}")
print(f"ground state energy taper: {gs_taper:.12f}")
print(f"difference: {abs(gs_full - gs_taper):.2e}  (exact reduction)")
