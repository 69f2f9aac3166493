"""Operator algebra layer (parity surface of symmer.operators)."""
from .utils import *  # noqa: F401,F403
from .base import (  # noqa: F401
    PauliwordOp,
    QuantumState,
    change_of_basis_XY_to_Z,
    get_PauliwordOp_projector,
    get_ij_operator,
    single_term_expval,
)
from .device_op import DeviceOperator  # noqa: F401
from .independent_op import IndependentOp  # noqa: F401
from .anticommuting_op import AntiCommutingOp  # noqa: F401
from .noncontextual_op import NoncontextualOp, NoncontextualSolver  # noqa: F401
