"""Stabilizer-subspace (S3) projection engine.

Parity surface of symmer ``projection/base.py``: rotate the stabilizers onto
single-qubit Paulis via Cliffords, drop operator terms anticommuting with them,
fix the +/-1 eigenvalues as coefficient sign flips, and delete the stabilised
qubit columns from the packed planes.
"""
from __future__ import annotations

from functools import reduce
from typing import List, Union

import numpy as np

from ..config import config
from ..kernels import dispatch, pack
from ..operators import IndependentOp, PauliwordOp, QuantumState
from ..evolution import Had, trotter


class S3Projection:
    """(reference projection/base.py:7-159)"""

    rotated_flag = False

    def __init__(self, stabilizers: IndependentOp) -> None:
        self.stabilizers = stabilizers

    def _perform_projection(self, operator: PauliwordOp) -> PauliwordOp:
        """Project onto the subspace stabilised by single-qubit Paulis.

        (reference :44-84)
        """
        assert operator.n_qubits == self.stabilizers.n_qubits, (
            "The input operator does not have the same number of qubits as the stabilizers"
        )
        assert self.rotated_flag, (
            "The operator has not been rotated - intended for use with "
            "perform_projection method"
        )
        self.rotated_flag = False

        # drop terms anticommuting with any rotated stabilizer
        commutes_all = np.all(
            operator.commutes_termwise(self.rotated_stabilizers), axis=1
        )
        x_keep = operator.x_pack[commutes_all]
        z_keep = operator.z_pack[commutes_all]
        op_coef = operator.coeff_vec[commutes_all]

        # sign flips from the +/-1 eigenvalue assignment: each (single-qubit)
        # rotated stabilizer tests ONE symplectic bit, so the product of the
        # -1 assignments is a parity over the OR of their bit masks (a 0
        # assignment behaves as +1, reference base.py:67-72)
        rot = self.rotated_stabilizers
        neg = np.real(np.asarray(rot.coeff_vec)) < 0
        if neg.any():
            neg_x = np.bitwise_or.reduce(rot.x_pack[neg], axis=0)
            neg_z = np.bitwise_or.reduce(rot.z_pack[neg], axis=0)
            parity = (
                np.bitwise_count(x_keep & neg_x).sum(axis=1)
                + np.bitwise_count(z_keep & neg_z).sum(axis=1)
            ).astype(np.int64) & 1
            op_coef = op_coef * (1 - 2 * parity)

        # delete the stabilised qubit columns (packed byte-LUT pext)
        free_mask = np.zeros(operator.n_qubits, dtype=bool)
        free_mask[self.free_qubit_indices] = True
        n_free = len(self.free_qubit_indices)
        if n_free:
            return PauliwordOp.from_planes(
                pack.select_columns(x_keep, free_mask),
                pack.select_columns(z_keep, free_mask),
                op_coef, n_free,
            ).cleanup()
        return PauliwordOp(np.array([], dtype=bool), [np.sum(op_coef)])

    def perform_projection(
        self,
        operator: PauliwordOp,
        ref_state: Union[List[int], np.ndarray, QuantumState] = None,
        sector: Union[List[int], np.ndarray] = None,
    ) -> PauliwordOp:
        """(reference :86-124)"""
        if self.stabilizers.n_terms == 0:
            # no stabilizers (e.g. a Hamiltonian with no Z2 symmetries):
            # nothing to project -- return the operator unchanged, as the
            # reference does, instead of crashing on the empty rotation set
            self.rotated_stabilizers = self.stabilizers
            self.stab_qubit_indices = np.array([], dtype=int)
            self.free_qubit_indices = np.arange(operator.n_qubits)
            self.rotated_flag = True
            return operator.cleanup()
        if sector is None and ref_state is not None:
            self.stabilizers.update_sector(ref_state)
        elif sector is not None:
            self.stabilizers.coeff_vec = np.array(sector, dtype=int)

        self.rotated_stabilizers = self.stabilizers.rotate_onto_single_qubit_paulis()
        self.stab_qubit_indices = (
            np.where(self.rotated_stabilizers.symp_matrix)[1] % operator.n_qubits
        )
        self.free_qubit_indices = np.setdiff1d(
            np.arange(operator.n_qubits), self.stab_qubit_indices
        )

        rotations = self.stabilizers.stabilizer_rotations
        if self._use_fused_device_path(operator, rotations):
            return self._perform_projection_device(operator, rotations)

        if len(rotations) > 0:
            op_rotated = operator.perform_rotations(rotations)
        else:
            op_rotated = operator

        self.rotated_flag = True
        return self._perform_projection(operator=op_rotated)

    def _use_fused_device_path(self, operator: PauliwordOp, rotations) -> bool:
        """True when the one-round-trip device projection applies: a large
        operator, Clifford-only stabilizer rotations (always the case for
        tapering; CS-VQE applies its non-Clifford UP rotations before calling
        here), and at least one free qubit.  Under ``use_mesh`` the dispatch
        layer routes through the term-sharded fused projection
        (parallel/distributed.distributed_clifford_project)."""
        if len(self.free_qubit_indices) == 0:
            return False
        if not all(
            dispatch.is_clifford_angle(angle) is not None
            for _, angle in rotations
        ):
            return False
        # transport-aware: the fused projection moves the operator once each
        # way; through a slow tunnel the packed host path can win outright
        T, W = operator.n_terms, operator.n_words
        row_bytes = 16 * W + 16  # u32-viewed planes + [hi, lo] coefficients
        host_s = (
            max(1, len(rotations)) * T * W / config.host_rotate_rate
            + T * W / config.host_cleanup_rate
        )
        return config.use_device_io(
            host_s, up_bytes=T * row_bytes, down_bytes=T * row_bytes, n_syncs=2
        )

    def _perform_projection_device(
        self, operator: PauliwordOp, rotations
    ) -> PauliwordOp:
        """Rotation + projection + cleanup fused into one device round trip
        (kernels/jx_core.clifford_project_cleanup).  Semantically identical to
        perform_rotations followed by _perform_projection: the device kernel
        zeroes the stabilized columns before dedup (grouping-equivalent to
        deleting them) and the columns are deleted here on the compacted
        result."""
        rot = self.rotated_stabilizers
        free_mask = np.zeros(operator.n_qubits, dtype=bool)
        free_mask[self.free_qubit_indices] = True
        rot_planes = [(r.x_pack[0], r.z_pack[0], angle) for r, angle in rotations]
        x, z, c = dispatch.clifford_rotate_project(
            operator.x_pack, operator.z_pack, operator.coeff_vec,
            rot_planes, rot.x_pack, rot.z_pack, rot.coeff_vec,
            free_mask, zero_threshold=1e-15,
        )
        self.rotated_flag = False
        free = self.free_qubit_indices
        if x.shape[0] == 0:
            # every term projected away: an explicit zero operator on the
            # free qubits (what the host path's cleanup of an empty
            # operator produces)
            return PauliwordOp(
                np.zeros((1, 2 * len(free)), dtype=bool), [0]
            )
        # packed column deletion (byte-LUT pext) -- no boolean round trip
        return PauliwordOp.from_planes(
            pack.select_columns(x, free_mask),
            pack.select_columns(z, free_mask),
            c, len(free),
        )

    def _project_state(self, state: QuantumState) -> QuantumState:
        """Project a state into the stabilizer subspace (reference :126-159)."""
        transformation_list = []
        rotated = self.stabilizers.rotate_onto_single_qubit_paulis()
        # Hadamards on X-stabilised qubits
        transformation_list += [
            Had(self.stabilizers.n_qubits, i)
            for i in np.where(np.sum(rotated.X_block & ~rotated.Z_block, axis=0))[0]
        ]
        # (P^2 + P)/2 projectors onto the stabilizer subspace
        transformation_list += [
            ((rotated[i] ** 2) + rotated[i]) * 0.5 for i in range(rotated.n_terms)
        ]
        # Clifford rotations mapping the stabilizers onto single-qubit Paulis
        transformation_list += [
            trotter(s[0] * (np.pi / 4 * 1j)) for s in self.stabilizers.stabilizer_rotations
        ]
        transformation = reduce(lambda x, y: x * y, transformation_list)
        transformed_state = transformation * state
        # drop stabilised qubit positions and merge duplicates
        return QuantumState(
            transformed_state.state_matrix[:, self.free_qubit_indices],
            transformed_state._amps,
        ).cleanup(zero_threshold=1e-12)
