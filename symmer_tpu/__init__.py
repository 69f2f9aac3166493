"""symmer-tpu: a TPU-native framework for symplectic Pauli-operator algebra
and qubit-subspace reduction, with the capabilities of UCL-CCS/symmer.

Public surface mirrors symmer's (reference __init__.py:1-6).
"""
__version__ = "0.1.0"

from .config import config, enable_x64, use_mesh  # noqa: F401
from .parallel import process  # noqa: F401
from .parallel.mesh import distributed_init  # noqa: F401
from .operators import PauliwordOp, QuantumState  # noqa: F401
from .projection import (  # noqa: F401
    QubitTapering,
    ContextualSubspace,
    QubitSubspaceManager,
)
