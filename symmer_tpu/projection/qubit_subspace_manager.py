"""End-to-end qubit subspace orchestration: taper -> contextual subspace.

Parity surface of symmer ``projection/qubit_subspace_manager.py``.
"""
from __future__ import annotations

import warnings
from typing import List, Union

import numpy as np

from ..operators import PauliwordOp, QuantumState
from ..utils import exact_gs_energy
from .contextual_subspace import ContextualSubspace
from .qubit_tapering import QubitTapering


class QubitSubspaceManager:
    """(reference qubit_subspace_manager.py:9-207)"""

    _projection_ready = False

    def __init__(
        self,
        hamiltonian: PauliwordOp,
        ref_state: Union[np.ndarray, List[int], QuantumState] = None,
        run_qubit_tapering: bool = True,
        run_contextual_subspace: bool = True,
    ) -> None:
        self.hamiltonian = hamiltonian
        self.ref_state = self.prepare_ref_state(ref_state)
        self.run_qubit_tapering = run_qubit_tapering
        self.run_contextual_subspace = run_contextual_subspace
        self.build_subspace_objects()

    def prepare_ref_state(self, ref_state=None) -> QuantumState:
        """Auto reference: exact diagonalisation below 12 qubits; up to
        ``config.lanczos_ref_max_qubits`` the *exact* ground state still comes
        cheaply from the on-chip Lanczos when an accelerator is attached
        (the reference caps exact references at 12 qubits and falls straight
        to DMRG, reference :54-86); DMRG beyond.
        """
        if ref_state is not None:
            if isinstance(ref_state, list):
                ref_state = np.array(ref_state).reshape(-1)
            if isinstance(ref_state, np.ndarray):
                ref_state = QuantumState(ref_state, [1])
            self._aux_operator = None
        else:
            warnings.warn(
                "No reference state supplied - trying to identify one via "
                "alternative means."
            )
            ref_state = self._auto_ref_state()
            self._aux_operator = ref_state.state_op

        return ref_state.cleanup(zero_threshold=1e-4).normalize

    def _auto_ref_state(self) -> QuantumState:
        from ..config import config

        nq = self.hamiltonian.n_qubits
        if nq <= 12:
            return exact_gs_energy(self.hamiltonian.to_sparse_matrix)[1]
        if nq <= config.lanczos_ref_max_qubits and self._device_lanczos_ok():
            from ..utils import exact_gs_energy_device

            try:
                return exact_gs_energy_device(self.hamiltonian)[1]
            except (MemoryError, RuntimeError) as exc:
                # table over budget (MemoryError) or a device RESOURCE_EXHAUSTED
                # (XlaRuntimeError subclasses RuntimeError): fall back to DMRG
                warnings.warn(
                    f"device Lanczos reference failed ({exc!r}); "
                    "falling back to DMRG"
                )
        from ..approximate import find_groundstate_dmrg, get_MPO

        mpo = get_MPO(self.hamiltonian, max_bond_dimension=30)
        return find_groundstate_dmrg(
            mpo, bond_dims=[8, 16, 32], max_sweeps_per_dim=2
        )

    @staticmethod
    def _device_lanczos_ok() -> bool:
        """An accelerator is attached (CPU XLA gathers make the exact Lanczos
        no better than DMRG for reference preparation)."""
        try:
            import jax

            return jax.default_backend() != "cpu"
        except Exception:  # pragma: no cover
            return False

    def build_subspace_objects(self) -> None:
        """(reference :88-108)"""
        if self.run_qubit_tapering:
            self.QT = QubitTapering(operator=self.hamiltonian)
            self._hamiltonian = self.QT.taper_it(ref_state=self.ref_state)
            self._ref_state = self.QT.tapered_ref_state.normalize
            self._Z2_symmetries = self.QT.symmetry_generators.copy()
        else:
            self._hamiltonian = self.hamiltonian.copy()
            self._ref_state = self.ref_state.copy()
            self._Z2_symmetries = None

        if self.run_contextual_subspace:
            try:
                self.CS = ContextualSubspace(
                    operator=self._hamiltonian,
                    reference_state=self._ref_state,
                    noncontextual_strategy="StabilizeFirst",
                    noncontextual_solver="brute_force",
                )
            except ValueError as exc:
                # e.g. the (tapered) Hamiltonian is itself noncontextual --
                # there is no contextual subspace to project onto
                warnings.warn(f"contextual subspace disabled: {exc}")
                self.run_contextual_subspace = False

    def get_reduced_hamiltonian(
        self, n_qubits: int = None, aux_operator: PauliwordOp = None
    ) -> PauliwordOp:
        """(reference :110-164)"""
        self._projection_ready = True
        self._n_qubits = n_qubits
        if aux_operator is None:
            aux_operator = self._aux_operator

        assert n_qubits is not None, (
            "Must supply the desired number of qubits for the contextual "
            "subspace"
        )
        if n_qubits >= self.hamiltonian.n_qubits:
            warnings.warn(
                "Specified at least as many qubits as are present in the "
                f"Hamiltonian - returning the full {self.hamiltonian.n_qubits} operator."
            )
            operator_out = self.hamiltonian

        elif n_qubits > self._hamiltonian.n_qubits:
            # partial tapering: fix only some of the Z2 symmetries
            assert self.run_qubit_tapering, ""
            self.QT.symmetry_generators = self._Z2_symmetries[
                : self.hamiltonian.n_qubits - n_qubits
            ]
            operator_out = self.QT.taper_it(ref_state=self.ref_state)

        else:
            if self.run_qubit_tapering:
                if not self.run_contextual_subspace and n_qubits < self._hamiltonian.n_qubits:
                    warnings.warn(
                        "When contextual subspace is not run we may only reduce "
                        "the Hamiltonian by the number of Z2 symmetries present. "
                        f"The reduced Hamiltonian will contain "
                        f"{self._hamiltonian.n_qubits} qubits."
                    )
                self.QT.symmetry_generators = self._Z2_symmetries
                aux_operator = self.QT.taper_it(aux_operator=aux_operator)
                operator_out = self._hamiltonian

            if self.run_contextual_subspace:
                assert n_qubits is not None, (
                    "Must supply the desired number of qubits for the contextual subspace."
                )
                try:
                    self.CS.update_stabilizers(
                        n_qubits=n_qubits, aux_operator=aux_operator,
                        strategy="aux_preserving",
                    )
                    operator_out = self.CS.project_onto_subspace()
                except (ValueError, AssertionError) as exc:
                    # StabilizeFirst defers the noncontextual construction to
                    # this point, so "Hamiltonian is noncontextual" /
                    # "search region collapsed" surface HERE, not in
                    # __init__ -- fall back to the tapered operator instead
                    # of crashing the pipeline
                    warnings.warn(
                        f"contextual subspace disabled: {exc}; returning the "
                        f"{operator_out.n_qubits}-qubit tapered Hamiltonian"
                    )
                    self.run_contextual_subspace = False

            if not self.run_qubit_tapering and not self.run_contextual_subspace:
                warnings.warn(
                    "Not running any subspace methods - returning the original Hamiltonian"
                )
                operator_out = self.hamiltonian

        return operator_out

    def project_auxiliary_operator(self, operator: PauliwordOp) -> PauliwordOp:
        """(reference :166-186)"""
        assert self._projection_ready, (
            "Have not yet projected the Hamiltonian into the contextual subspace"
        )
        if self._n_qubits < self.hamiltonian.n_qubits:
            if self.run_qubit_tapering:
                operator = self.QT.taper_it(aux_operator=operator)
            if self.run_contextual_subspace:
                operator = self.CS.project_onto_subspace(operator_to_project=operator)
        return operator

    def project_auxiliary_state(self, state: QuantumState) -> QuantumState:
        """(reference :188-207)"""
        assert self._projection_ready, (
            "Have not yet projected the Hamiltonian into the contextual subspace"
        )
        if self._n_qubits < self.hamiltonian.n_qubits:
            if self.run_qubit_tapering:
                state = self.QT.project_state(state_to_project=state)
            if self.run_contextual_subspace:
                state = self.CS.project_state(state_to_project=state)
        return state
