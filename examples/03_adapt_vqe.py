"""ADAPT-VQE on tapered H2: grows a minimal ansatz to FCI accuracy.

Run: python examples/03_adapt_vqe.py
"""
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmer_tpu import PauliwordOp, QubitTapering
from symmer_tpu.evolution import ADAPT_VQE

H2_DICT = {
    "IIII": -0.05933866442819677, "IIIZ": -0.23676939575319134,
    "IIZI": -0.23676939575319134, "IIZZ": 0.17571274411978302,
    "IZII": 0.17579122569046912, "IZIZ": 0.12223870791335416,
    "IZZI": 0.16715312911492025, "ZIII": 0.17579122569046912,
    "ZIIZ": 0.16715312911492025, "ZIZI": 0.12223870791335416,
    "ZZII": 0.17002500620877006, "XXYY": -0.044914421201566114,
    "XYYX": 0.044914421201566114, "YXXY": 0.044914421201566114,
    "YYXX": -0.044914421201566114,
}
FCI = -1.1368382276023516

H = PauliwordOp.from_dictionary(H2_DICT)
QT = QubitTapering(H)
H_taper = QT.taper_it(ref_state=np.array([1, 1, 0, 0]))
ref = QT.tapered_ref_state.normalize

pool = PauliwordOp.from_list(["X", "Y", "Z"])
adapt = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
adapt.verbose = False
adapt.derivative_eval = "commutators"
out = adapt.optimize(max_cycles=4)

print("ADAPT-VQE on tapered H2 (1 qubit):")
print(f"  selected excitations: {out['adapt_operator']}")
print(f"  converged energy: {out['result']['fun']:.12f}")
print(f"  FCI             : {FCI:.12f}")
print(f"  error           : {abs(out['result']['fun'] - FCI):.2e}")
