"""MPO / DMRG tests (modeled on symmer test_approximate_tensor_network.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.approximate import MPOOp, find_groundstate_dmrg, get_MPO
from symmer_tpu.utils import exact_gs_energy

from ..conftest import dense_op

rng = np.random.default_rng(0)


def _random_hermitian_op(n, t):
    op = PauliwordOp.random(n, t)
    return (op + op.dagger).multiply_by_constant(0.5)


def test_mpo_matrix_matches_dense():
    op = _random_hermitian_op(4, 8)
    mpo = MPOOp.from_WordOp(op)
    assert np.allclose(mpo.to_matrix, dense_op(op))


def test_mpo_from_dictionary():
    d = {"XX": 0.5, "ZI": -0.3, "YY": 0.2}
    mpo = MPOOp.from_dictionary(d)
    assert np.allclose(mpo.to_matrix, dense_op(PauliwordOp.from_dictionary(d)))


def test_mpo_coefflist_tuples():
    mpo = MPOOp(["XX", "ZZ"], [(0.5, 0.1), (-0.3, 0.0)])
    expect = dense_op(PauliwordOp.from_dictionary({"XX": 0.5 + 0.1j, "ZZ": -0.3}))
    assert np.allclose(mpo.to_matrix, expect)


def test_mpo_compression_is_faithful(be_fixture):
    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    mpo = get_MPO(H, max_bond_dimension=30)
    assert np.abs(mpo.to_matrix - H.to_sparse_matrix.toarray()).max() < 1e-10


def test_dmrg_small_system_exact():
    op = _random_hermitian_op(4, 10)
    gs, _ = exact_gs_energy(op.to_sparse_matrix)
    psi = find_groundstate_dmrg(MPOOp.from_WordOp(op), bond_dims=[4, 8, 16],
                                max_sweeps_per_dim=4)
    assert abs(op.expval(psi.normalize) - gs) < 1e-4


def test_dmrg_be(be_fixture):
    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    gs, _ = exact_gs_energy(H.to_sparse_matrix)
    mpo = get_MPO(H, max_bond_dimension=60)
    psi = find_groundstate_dmrg(mpo, bond_dims=[8, 16, 32], max_sweeps_per_dim=3)
    assert abs(H.expval(psi.normalize) - gs) < 1e-4


def test_pstring_to_mpo_single_string_contraction():
    from symmer_tpu.approximate.tensor_network import Paulis, pstring_to_mpo

    mpo = pstring_to_mpo("XZY", scaling=-0.5j)
    assert [W.shape for W in mpo] == [(2, 2, 1, 1)] * 3
    dense = np.array([[1.0]])
    full = 1
    for W in mpo:
        full = np.kron(full, W[:, :, 0, 0])
    expected = -0.5j * np.kron(np.kron(Paulis["X"], Paulis["Z"]), Paulis["Y"])
    assert np.allclose(full, expected)
