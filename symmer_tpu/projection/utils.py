"""Projection utilities: stabilizer identification and biasing.

Parity surface of symmer ``projection/utils.py``.
"""
from __future__ import annotations

from copy import deepcopy
from typing import Optional, Union

import numpy as np

from ..operators import IndependentOp, PauliwordOp


def norm(vector: np.ndarray) -> float:
    return np.sqrt(np.dot(vector, vector.conjugate())).real


def lp_norm(vector: np.ndarray, p: int = 2) -> float:
    return np.power(np.sum(np.power(np.abs(vector), p)), 1 / p)


def basis_score(
    weighting_operator: PauliwordOp, basis: IndependentOp, p: int = 1
) -> float:
    """Ratio of the coefficient norm preserved under projection over the basis.

    (reference projection/utils.py:33-61)
    """
    mask_preserved = np.where(
        np.all(weighting_operator.commutes_termwise(basis), axis=1)
    )[0]
    return lp_norm(weighting_operator.coeff_vec[mask_preserved], p=p) / lp_norm(
        weighting_operator.coeff_vec, p=p
    )


def update_eigenvalues(generators: IndependentOp, stabilizers: IndependentOp) -> None:
    """Propagate +/-1 sector assignments through a generator reconstruction.

    (reference projection/utils.py:63-83)
    """
    reconstruction, successfully_reconstructed = stabilizers.generator_reconstruction(
        generators
    )
    if not np.all(successfully_reconstructed):
        raise ValueError("Generators not sufficient to reconstruct symmetry operators")
    stabilizers.coeff_vec = (-1) ** np.count_nonzero(
        np.bitwise_and(
            reconstruction.astype(bool),
            np.asarray(generators.coeff_vec) == -1,
        ),
        axis=1,
    )


class StabilizerIdentification:
    """Binary search over term-significance prefixes for a target subspace size.

    (reference projection/utils.py:85-154)
    """

    def __init__(self, weighting_operator: PauliwordOp, use_X_only=False) -> None:
        self.weighting_operator = weighting_operator
        self.use_X_only = use_X_only
        self.build_basis_weighting_operator()

    def build_basis_weighting_operator(self):
        if self.use_X_only:
            X_block = self.weighting_operator.X_block
            self.weighting_operator = PauliwordOp(
                np.hstack([X_block, np.zeros_like(X_block)]),
                np.abs(self.weighting_operator.coeff_vec),
            ).cleanup()
        self.basis_weighting = self.weighting_operator.sort(by="magnitude")
        self.qubit_positions = np.arange(self.weighting_operator.n_qubits)
        self.term_region = [0, self.basis_weighting.n_terms]

    def symmetry_generators_by_term_significance(self, n_preserved):
        preserve = self.basis_weighting[: n_preserved]
        stabilizers = IndependentOp.symmetry_generators(preserve, commuting_override=True)
        mask_diag = np.where(~np.any(stabilizers.X_block, axis=1))[0]
        return IndependentOp.from_planes(
            stabilizers.x_pack[mask_diag],
            stabilizers.z_pack[mask_diag],
            stabilizers.coeff_vec[mask_diag],
            stabilizers.n_qubits,
        )

    def symmetry_generators_by_subspace_dimension(self, n_sim_qubits, region=None):
        if region is None:
            region = deepcopy(self.term_region)
        assert n_sim_qubits < self.basis_weighting.n_qubits, (
            "Number of qubits to simulate exceeds those in the operator"
        )
        assert region[1] - region[0] > 1, (
            "Search region collapsed without identifying any stabilizers"
        )
        n_terms = sum(region) // 2
        stabilizers = self.symmetry_generators_by_term_significance(n_terms)
        current_n_qubits = self.basis_weighting.n_qubits - stabilizers.n_terms
        sign = np.sign(current_n_qubits - n_sim_qubits)
        if sign == 0:
            return stabilizers
        elif sign == +1:
            region[1] = n_terms
        else:
            region[0] = n_terms
        return self.symmetry_generators_by_subspace_dimension(n_sim_qubits, region=region)


class ObservableBiasing:
    """HOMO-LUMO double-Gaussian term re-weighting (reference utils.py:156-230)."""

    HOMO_bias = 0.2
    LUMO_bias = 0.2
    separation = 1

    def __init__(self, base_operator: PauliwordOp, HOMO_LUMO_gap) -> None:
        self.base_operator = base_operator
        assert HOMO_LUMO_gap - int(HOMO_LUMO_gap) == 0.5, (
            "HOMO_LUMO_gap should be specified as the mid-point between "
            "the HOMO and LUMO indices"
        )
        self.HOMO_LUMO_gap = HOMO_LUMO_gap
        self.shifted_q_pos = np.arange(base_operator.n_qubits) - self.HOMO_LUMO_gap

    def HOMO_LUMO_bias_curve(self) -> np.ndarray:
        shift = self.separation - 1 / 2
        HOMO_sigma = np.tan((1 - self.HOMO_bias) * np.pi / 2)
        LUMO_sigma = np.tan((1 - self.LUMO_bias) * np.pi / 2)
        if HOMO_sigma != 0:
            L = np.exp(-np.square((self.shifted_q_pos + shift) / HOMO_sigma) / 2)
        else:
            non_zero_index = int(self.HOMO_LUMO_gap - shift)
            L = np.eye(1, self.base_operator.n_qubits, non_zero_index).reshape(
                self.base_operator.n_qubits
            )
        if LUMO_sigma != 0:
            U = np.exp(-np.square((self.shifted_q_pos - shift) / LUMO_sigma) / 2)
        else:
            non_zero_index = int(self.HOMO_LUMO_gap + shift)
            U = np.eye(1, self.base_operator.n_qubits, non_zero_index).reshape(
                self.base_operator.n_qubits
            )
        return (L + U) / 2

    def HOMO_LUMO_biased_operator(self) -> PauliwordOp:
        reweighted_operator = self.base_operator.copy()
        reweighted_operator.coeff_vec = (
            np.sum(reweighted_operator.X_block * self.HOMO_LUMO_bias_curve(), axis=1)
            * reweighted_operator.coeff_vec
        )
        return reweighted_operator


def stabilizer_walk(
    n_sim_qubits,
    biasing_operator: ObservableBiasing,
    weighting_operator: PauliwordOp = None,
    print_info: bool = False,
    use_X_only: bool = False,
) -> IndependentOp:
    """Differential evolution over the bias parameters (reference utils.py:232-273)."""
    from scipy.optimize import differential_evolution

    if weighting_operator is None:
        weighting_operator = biasing_operator.base_operator

    def get_stabilizers(x):
        biasing_operator.HOMO_bias, biasing_operator.LUMO_bias = x
        biased_op = biasing_operator.HOMO_LUMO_biased_operator()
        stabilizers = StabilizerIdentification(biased_op, use_X_only=use_X_only)
        return stabilizers.symmetry_generators_by_subspace_dimension(n_sim_qubits)

    def objective(x):
        S = get_stabilizers(x)
        return -basis_score(weighting_operator, S)

    opt_out = differential_evolution(objective, bounds=[(0, 1), (0, 1)])
    stab_score = -opt_out["fun"]
    bias_param = opt_out["x"]
    S = get_stabilizers(bias_param)
    if print_info:
        print(f"Optimal score w(S)={stab_score} for HOMO/LUMO bias {bias_param}")
    return S


def get_noncon_generators_from_commuting_stabilizers(
    stabilizers: Union[PauliwordOp, IndependentOp],
    weighting_operator: PauliwordOp,
    return_clique_only: Optional[bool] = False,
):
    """Best anticommuting augmentation of a commuting stabilizer set.

    (reference projection/utils.py:275-339)
    """
    from ..utils import product_list, random_anitcomm_2n_1_PauliwordOp

    if not np.all(stabilizers.commutes_termwise(stabilizers)):
        return stabilizers
    generators = stabilizers.generators

    best_l1_norm = -1
    new_stabilizers = None
    stab_used = None
    unique_q_inds = ~(
        np.sum(np.logical_xor(generators.Z_block, generators.X_block), axis=0) - 1
    ).astype(bool)
    for idx in range(generators.n_terms):
        stab = generators[idx]
        act_positions = np.logical_and(
            np.logical_xor(stab.Z_block, stab.X_block)[0], unique_q_inds
        )
        n_act_qubits = int(np.sum(act_positions))
        ac_basis = random_anitcomm_2n_1_PauliwordOp(n_act_qubits, apply_clifford=False)[1:]
        new_basis_symp = np.zeros((n_act_qubits * 2, stab.n_qubits * 2), dtype=bool)
        cols = np.hstack([act_positions, act_positions])
        new_basis_symp[:, cols] = ac_basis.symp_matrix
        new_basis = PauliwordOp(new_basis_symp, np.ones(n_act_qubits * 2))

        gen, mask = stab.generator_reconstruction(new_basis)
        required_products = gen[0].nonzero()[0][1:]
        if len(required_products) > 0:
            prod = product_list([new_basis[int(i)] for i in required_products])
            new_basis = (new_basis * prod).cleanup()
        new_basis.coeff_vec = np.ones_like(new_basis.coeff_vec)

        _, mask = weighting_operator.generator_reconstruction(new_basis)
        success = weighting_operator[mask]
        l1_norm = np.linalg.norm(success.coeff_vec, ord=1)
        if l1_norm > best_l1_norm:
            new_stabilizers = generators - stab + new_basis
            best_l1_norm = l1_norm
            stab_used = stab.copy()

    assert new_stabilizers.is_noncontextual, "new stabilizers are not noncontextual"
    if return_clique_only:
        return IndependentOp.from_PauliwordOp(new_stabilizers) - generators, stab_used
    return IndependentOp.from_PauliwordOp(new_stabilizers)
