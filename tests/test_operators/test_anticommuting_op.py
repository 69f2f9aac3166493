"""AntiCommutingOp / unitary-partitioning tests.

(modeled on symmer tests/test_operators/test_anticommuting_op.py)
"""
import numpy as np
import pytest

from symmer_tpu.operators import AntiCommutingOp, PauliwordOp
from symmer_tpu.operators.anticommuting_op import conjugate_Pop_with_R
from symmer_tpu.utils import random_anitcomm_2n_1_PauliwordOp


def test_commuting_terms_rejected():
    with pytest.raises(AssertionError):
        AntiCommutingOp.from_list(["ZI", "IZ"])


def test_anticommuting_accepted():
    op = AntiCommutingOp.from_list(["XI", "YI", "ZI"])
    assert op.n_terms == 3


def test_random_anticommuting_structure():
    for nq in [2, 3]:
        op = random_anitcomm_2n_1_PauliwordOp(nq)
        assert op.n_terms == 2 * nq + 1
        adj = op.adjacency_matrix.copy()
        np.fill_diagonal(adj, False)
        assert not adj.any()


@pytest.mark.parametrize("up_method", ["seq_rot", "LCU"])
def test_unitary_partitioning(up_method):
    np.random.seed(3)
    AC = AntiCommutingOp.from_PauliwordOp(random_anitcomm_2n_1_PauliwordOp(3))
    Ps, rotations, gamma_l, AC_normed = AC.unitary_partitioning(up_method=up_method)
    # gamma_l = l2 norm of the coefficients
    assert np.isclose(gamma_l, np.linalg.norm(AC.coeff_vec.real))
    # rotations reduce the normalised clique to the single term Ps
    assert AC_normed.perform_rotations(rotations) == Ps
    assert Ps.n_terms == 1


@pytest.mark.parametrize("up_method", ["seq_rot", "LCU"])
def test_unitary_partitioning_s_index(up_method):
    np.random.seed(4)
    AC = AntiCommutingOp.from_PauliwordOp(random_anitcomm_2n_1_PauliwordOp(2))
    Ps, rotations, gamma_l, AC_normed = AC.unitary_partitioning(
        s_index=2, up_method=up_method
    )
    # the term rotated onto is the s-indexed one
    assert np.array_equal(Ps.symp_matrix[0], AC.symp_matrix[2])


def test_single_term_short_circuit():
    AC = AntiCommutingOp.from_list(["XYZ"], [0.5])
    Ps, rotations, gamma_l, AC_normed = AC.unitary_partitioning()
    assert rotations == []
    assert np.isclose(gamma_l, 0.5)
    assert np.isclose(abs(Ps.coeff_vec[0]), 1)


def test_lcu_rotation_operator_unitary(dense_oracle):
    _, dense_op = dense_oracle
    np.random.seed(5)
    AC = AntiCommutingOp.from_PauliwordOp(random_anitcomm_2n_1_PauliwordOp(2))
    Ps, _, gamma_l, AC_normed = AC.unitary_partitioning(up_method="LCU")
    R = dense_op(AC.R_LCU)
    assert np.allclose(R @ R.conj().T, np.eye(R.shape[0]), atol=1e-10)
    # R A_norm R^dag == Ps
    assert np.allclose(
        R @ dense_op(AC_normed) @ R.conj().T, dense_op(Ps), atol=1e-10
    )


def test_conjugate_Pop_with_R(dense_oracle):
    _, dense_op = dense_oracle
    np.random.seed(6)
    AC = AntiCommutingOp.from_PauliwordOp(random_anitcomm_2n_1_PauliwordOp(2))
    _, _, _, _ = AC.unitary_partitioning(up_method="LCU")
    Pop = PauliwordOp.random(2, 3)
    out = conjugate_Pop_with_R(Pop, AC.R_LCU)
    R = dense_op(AC.R_LCU)
    assert np.allclose(dense_op(out), R @ dense_op(Pop) @ R.conj().T, atol=1e-10)


def test_ac_root():
    from symmer_tpu.utils import Get_AC_root

    np.random.seed(7)
    AC = AntiCommutingOp.from_PauliwordOp(random_anitcomm_2n_1_PauliwordOp(2))
    root = Get_AC_root(0.25, AC)
    fourth = (root * root * root * root).cleanup(zero_threshold=1e-10)
    assert fourth == AC
