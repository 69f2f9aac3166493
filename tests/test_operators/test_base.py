"""PauliwordOp core tests (modeled on symmer tests/test_operators/test_base.py)."""
import itertools

import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.operators import (
    change_of_basis_XY_to_Z,
    get_ij_operator,
    get_PauliwordOp_projector,
    single_term_expval,
)

from ..conftest import dense_op, dense_pauli

rng = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# initialisation validation
# ---------------------------------------------------------------------------

def test_init_rejects_non_binary_int():
    with pytest.raises(AssertionError):
        PauliwordOp(np.array([[0, 1, 2, 0]]), [1])


def test_init_rejects_odd_columns():
    with pytest.raises(AssertionError):
        PauliwordOp(np.zeros((1, 3), dtype=bool), [1])


def test_init_rejects_mismatched_coeffs():
    with pytest.raises(AssertionError):
        PauliwordOp(np.zeros((2, 4), dtype=bool), [1])


def test_init_from_int_and_bool_match():
    symp = rng.integers(0, 2, (5, 8))
    a = PauliwordOp(symp, np.ones(5))
    b = PauliwordOp(symp.astype(bool), np.ones(5))
    assert a == b


def test_from_list_dict_roundtrip():
    d = {"XYZI": 1.2 + 0.3j, "IIZZ": -0.7, "YYXX": 2j}
    op = PauliwordOp.from_dictionary(d)
    assert op.n_qubits == 4 and op.n_terms == 3
    assert op.to_dictionary == d


def test_empty():
    op = PauliwordOp.empty(3)
    assert op.n_terms == 1 and op.n_qubits == 3
    assert op.coeff_vec[0] == 0


def test_symp_matrix_view_roundtrip():
    op = PauliwordOp.random(6, 9)
    again = PauliwordOp(op.symp_matrix, op.coeff_vec)
    assert again == op


# ---------------------------------------------------------------------------
# multiplication: exhaustive single-qubit and random multi-term vs dense kron
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s1,s2", list(itertools.product("IXYZ", repeat=2)))
def test_single_qubit_products_exact(s1, s2):
    a = PauliwordOp.from_list([s1])
    b = PauliwordOp.from_list([s2])
    prod = a * b
    assert np.allclose(dense_op(prod), dense_pauli(s1) @ dense_pauli(s2))


def test_two_qubit_products_exhaustive():
    strs = ["".join(t) for t in itertools.product("IXYZ", repeat=2)]
    for s1 in strs:
        for s2 in strs:
            prod = PauliwordOp.from_list([s1]) * PauliwordOp.from_list([s2])
            assert np.allclose(dense_op(prod), dense_pauli(s1) @ dense_pauli(s2)), (s1, s2)


def test_multiterm_multiply_vs_dense():
    a = PauliwordOp.random(3, 6)
    b = PauliwordOp.random(3, 5)
    assert np.allclose(dense_op(a * b), dense_op(a) @ dense_op(b))


def test_known_product():
    # hand-computed: (XY)(YX) = (X*Y) tensor (Y*X) = (iZ)(-iZ) = Z (x) Z
    out = PauliwordOp.from_list(["XY"]) * PauliwordOp.from_list(["YX"])
    assert out.to_dictionary == {"ZZ": (1 + 0j)}


def test_add_sub_scalar():
    a = PauliwordOp.random(4, 7)
    b = PauliwordOp.random(4, 5)
    assert np.allclose(dense_op(a + b), dense_op(a) + dense_op(b))
    assert np.allclose(dense_op(a - b), dense_op(a) - dense_op(b))
    assert np.allclose(dense_op(a * (2 - 1j)), (2 - 1j) * dense_op(a))
    assert np.allclose(dense_op(sum([a, b, a])), 2 * dense_op(a) + dense_op(b))


def test_scalar_dunders():
    # scalar*op, -op, op/scalar (beyond the reference, which only has op*scalar)
    a = PauliwordOp.random(3, 5)
    assert np.allclose(dense_op((2 - 1j) * a), (2 - 1j) * dense_op(a))
    assert np.allclose(dense_op(-a), -dense_op(a))
    assert np.allclose(dense_op(a / 4), dense_op(a) / 4)
    with pytest.raises(TypeError):
        a / PauliwordOp.random(3, 2)


def test_pow():
    a = PauliwordOp.random(3, 4)
    assert np.allclose(dense_op(a**2), dense_op(a) @ dense_op(a))
    assert (a**0).to_dictionary == {"III": 1}


def test_commutator_anticommutator():
    a = PauliwordOp.random(3, 5)
    b = PauliwordOp.random(3, 4)
    da, db = dense_op(a), dense_op(b)
    assert np.allclose(dense_op(a.commutator(b)), da @ db - db @ da)
    assert np.allclose(dense_op(a.anticommutator(b)), da @ db + db @ da)


def test_associativity_and_dagger_property():
    a, b, c = (PauliwordOp.random(3, 3) for _ in range(3))
    assert (a * b) * c == a * (b * c)
    assert (a * b).dagger == b.dagger * a.dagger


def test_cleanup_idempotent_and_threshold():
    op = PauliwordOp.from_list(["XX", "XX", "ZI"], [0.5, 0.5, 1e-18])
    clean = op.cleanup()
    assert clean.n_terms == 1
    assert clean.to_dictionary == {"XX": (1 + 0j)}
    assert clean.cleanup() == clean


def test_multiply_large_qubit_count():
    # 1,000-qubit single-term product (packed planes, no dense fallback)
    s1 = "".join(rng.choice(list("IXYZ"), 1000))
    s2 = "".join(rng.choice(list("IXYZ"), 1000))
    out = PauliwordOp.from_list([s1]) * PauliwordOp.from_list([s2])
    assert out.n_terms == 1 and out.n_qubits == 1000


# ---------------------------------------------------------------------------
# commutation structure
# ---------------------------------------------------------------------------

def test_commutes_termwise_vs_dense():
    a = PauliwordOp.random(4, 6)
    b = PauliwordOp.random(4, 5)
    C = a.commutes_termwise(b)
    for i in range(a.n_terms):
        for j in range(b.n_terms):
            di = dense_op(a[i]) / a.coeff_vec[i]
            dj = dense_op(b[j]) / b.coeff_vec[j]
            comm = di @ dj - dj @ di
            assert C[i, j] == (np.abs(comm).max() < 1e-10)


def test_commutes_example_from_reference_docstring():
    op1 = PauliwordOp.from_list(["XYXZ", "YYII"])
    op2 = PauliwordOp.from_list(["YYZZ", "XIXZ", "XZZI"])
    expected = np.array([[True, True, True], [True, False, True]])
    assert np.array_equal(op1.commutes_termwise(op2), expected)


def test_adjacency_and_qwc():
    op = PauliwordOp.from_list(["XIZ", "XYI", "IYZ", "ZZZ"])
    adj = op.adjacency_matrix
    assert np.array_equal(adj, op.commutes_termwise(op))
    qwc = op.adjacency_matrix_qwc
    # QWC implies C
    assert np.all(adj[qwc])


@pytest.mark.parametrize(
    "terms,expected",
    [
        (["XI", "IZ", "ZZ", "ZI"], True),
        (["II", "ZZ", "XX", "YY"], True),
        # all two-qubit Paulis with support on both qubits: contextual
        (["II", "ZZ", "ZX", "ZY", "XZ", "YZ", "XX", "XY", "YX", "YY"], False),
        (["III", "IIZ", "ZII", "IXZ", "IYZ", "YYZ"], False),
    ],
)
def test_is_noncontextual_cases(terms, expected):
    op = PauliwordOp.from_list(terms)
    assert op.is_noncontextual == expected


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("angle", [None, np.pi / 2, -np.pi / 2, np.pi, 3 * np.pi / 2, 0.37, -1.2])
def test_rotation_vs_dense_conjugation(angle):
    import scipy.linalg

    op = PauliwordOp.random(3, 5)
    R = PauliwordOp.from_list(["XYZ"])
    rotated = op._rotate_by_single_Pword(R, angle).cleanup()
    t = np.pi / 2 if angle is None else angle
    U = scipy.linalg.expm(1j * t / 2 * dense_pauli("XYZ"))
    assert np.allclose(dense_op(rotated), U @ dense_op(op) @ U.conj().T)


def test_perform_rotations_sequence():
    import scipy.linalg

    op = PauliwordOp.random(3, 4)
    rots = [
        (PauliwordOp.from_list(["ZZI"]), None),
        (PauliwordOp.from_list(["XIX"]), 0.21),
        (PauliwordOp.from_list(["IYZ"]), np.pi),
    ]
    out = op.perform_rotations(rots)
    U = np.eye(8)
    for P, ang in rots:
        t = np.pi / 2 if ang is None else ang
        U = scipy.linalg.expm(1j * t / 2 * dense_op(P)) @ U
    assert np.allclose(dense_op(out), U @ dense_op(op) @ U.conj().T, atol=1e-12)


def test_clifford_rotation_preserves_term_count():
    op = PauliwordOp.random(5, 12).cleanup()
    R = PauliwordOp.from_list(["XZXZY"])
    rotated = op._rotate_by_single_Pword(R, np.pi / 2)
    assert rotated.n_terms == op.n_terms


# ---------------------------------------------------------------------------
# structure: tensor, sort, reindex, getitem
# ---------------------------------------------------------------------------

def test_tensor_vs_kron():
    a = PauliwordOp.random(2, 3)
    b = PauliwordOp.random(2, 4)
    assert np.allclose(dense_op(a.tensor(b)), np.kron(dense_op(a), dense_op(b)))


def test_sort_magnitude():
    op = PauliwordOp.from_list(["XX", "YY", "ZZ"], [0.1, -3, 1])
    assert np.allclose(abs(op.sort(by="magnitude").coeff_vec), [3, 1, 0.1])


def test_sort_support_matches_bigint_order():
    # packed bit-reversed lexsort must reproduce the big-int support order
    # (reference base.py:469-473), including >64-qubit rows
    from symmer_tpu.operators.utils import binary_array_to_int

    np.random.seed(7)
    for nq in (5, 64, 70, 130):
        op = PauliwordOp.random(nq, 40)
        got = op.sort(by="support")
        pos = (got.X_block | got.Z_block).astype(int)
        vals = binary_array_to_int(pos)
        assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
        # same multiset of terms
        assert got == op


def test_reindex():
    op = PauliwordOp.from_list(["XYZ"])
    out = op.reindex([2, 0, 1])  # qubit 0->2, 1->0, 2->1 reorder columns
    assert list(out.to_dictionary.keys())[0] in {"ZXY", "YZX"}


def test_getitem_iter():
    op = PauliwordOp.random(3, 6)
    assert op[2] == PauliwordOp(op.symp_matrix[2], [op.coeff_vec[2]])
    assert op[-1] == op[op.n_terms - 1]
    assert len(list(iter(op))) == op.n_terms


def test_eq_hash():
    a = PauliwordOp.from_dictionary({"XY": 1, "ZI": 2})
    b = PauliwordOp.from_dictionary({"ZI": 2, "XY": 1})
    assert a == b and hash(a) == hash(b)
    assert a != PauliwordOp.from_dictionary({"ZI": 2, "XY": 1.1})


# ---------------------------------------------------------------------------
# matrix conversion
# ---------------------------------------------------------------------------

def test_to_sparse_matrix_vs_dense_kron():
    op = PauliwordOp.random(4, 8)
    assert np.allclose(op.to_sparse_matrix.toarray(), dense_op(op))


@pytest.mark.parametrize("strategy", ["projector", "full_basis"])
def test_from_matrix_roundtrip(strategy):
    M = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    op = PauliwordOp.from_matrix(M, strategy=strategy)
    assert np.allclose(op.to_sparse_matrix.toarray(), M)


def test_from_matrix_sparse_input():
    from scipy.sparse import csr_matrix

    M = np.diag(rng.normal(size=8)).astype(complex)
    op = PauliwordOp.from_matrix(csr_matrix(M), strategy="projector")
    assert np.allclose(op.to_sparse_matrix.toarray(), M)


def test_from_matrix_coo_input():
    from scipy.sparse import coo_matrix

    M = np.diag(rng.normal(size=8)).astype(complex)
    M[0, 5] = 1.5 - 0.5j
    op = PauliwordOp.from_matrix(coo_matrix(M), strategy="projector")
    assert np.allclose(op.to_sparse_matrix.toarray(), M)


def test_from_matrix_projector_nonhermitian_offdiagonal():
    # exercises multiple XOR-diagonal groups in the FWHT decomposition
    M = np.zeros((16, 16), complex)
    M[3, 9] = 2.0 + 1j
    M[12, 1] = -0.7
    M[5, 5] = 0.3j
    op = PauliwordOp.from_matrix(M, strategy="projector")
    assert np.allclose(op.to_sparse_matrix.toarray(), M)


def test_qubitwise_commutes_vs_loop_oracle():
    A = PauliwordOp.random(9, 40)
    B = PauliwordOp.random(9, 30)
    got = A.qubitwise_commutes_termwise(B)
    Xa, Za = A.X_block, A.Z_block
    Xb, Zb = B.X_block, B.Z_block
    for i in range(A.n_terms):
        for j in range(B.n_terms):
            exp = True
            for q in range(9):
                pa = (Xa[i, q], Za[i, q])
                pb = (Xb[j, q], Zb[j, q])
                if pa != (False, False) and pb != (False, False) and pa != pb:
                    exp = False
                    break
            assert got[i, j] == exp


def test_qubitwise_commutes_native_matches_numpy_fallback():
    import os

    from symmer_tpu.kernels import np_core
    from symmer_tpu.native import gf2core

    if gf2core is None:
        pytest.skip("native gf2core unavailable")
    A = PauliwordOp.random(130, 300)  # multi-word planes
    B = PauliwordOp.random(130, 200)
    native = gf2core.qwc_matrix(A.x_pack, A.z_pack, B.x_pack, B.z_pack)
    n1 = A.x_pack | A.z_pack
    n2 = B.x_pack | B.z_pack
    diff = (
        (A.x_pack[:, None, :] ^ B.x_pack[None, :, :])
        | (A.z_pack[:, None, :] ^ B.z_pack[None, :, :])
    ) & n1[:, None, :] & n2[None, :, :]
    assert np.array_equal(native, ~np.any(diff, axis=2))


def test_anticommutes_native_matches_numpy():
    from symmer_tpu.native import gf2core

    if gf2core is None:
        pytest.skip("native gf2core unavailable")
    A = PauliwordOp.random(70, 64)
    B = PauliwordOp.random(70, 96)
    native = gf2core.matmul_gf2(
        np.hstack([A.x_pack, A.z_pack]), np.hstack([B.z_pack, B.x_pack])
    )
    a = np.bitwise_count(A.x_pack[:, None, :] & B.z_pack[None, :, :]).sum(axis=2)
    b = np.bitwise_count(A.z_pack[:, None, :] & B.x_pack[None, :, :]).sum(axis=2)
    assert np.array_equal(native, ((a + b) & 1).astype(bool))


def test_matrix_free_matvec():
    op = PauliwordOp.random(5, 10)
    v = rng.normal(size=32) + 1j * rng.normal(size=32)
    assert np.allclose(op.matrix_free_linear_operator() @ v, dense_op(op) @ v)


def test_generators_span():
    op = PauliwordOp.random(4, 6).cleanup()
    G = op.generators
    _, mask = op.generator_reconstruction(G)
    assert np.all(mask)


def test_generator_reconstruction_products():
    G = PauliwordOp.from_list(["ZZII", "IZZI", "IIZZ", "XXXX"])
    H = PauliwordOp.from_list(["ZIZI", "YXXY"])
    recon, mask = H.generator_reconstruction(G)
    assert np.all(mask)
    for i in range(H.n_terms):
        prod = PauliwordOp.from_list(["IIII"])
        for j in np.where(recon[i])[0]:
            prod = prod * G[j]
        # product reproduces the term up to sign
        assert np.array_equal(prod.symp_matrix, H[i].symp_matrix)


# ---------------------------------------------------------------------------
# module-level functions
# ---------------------------------------------------------------------------

def test_get_projector():
    pj = get_PauliwordOp_projector("I0+")
    expect = np.kron(
        np.kron(np.eye(2), np.array([[1, 0], [0, 0]])),
        np.array([[0.5, 0.5], [0.5, 0.5]]),
    )
    assert np.allclose(pj.to_sparse_matrix.toarray(), expect)


def test_get_ij_operator():
    ij = get_ij_operator(3, 5, 3)
    expect = np.zeros((8, 8))
    expect[3, 5] = 1
    assert np.allclose(ij.to_sparse_matrix.toarray(), expect)


def test_single_term_expval():
    psi = QuantumState.haar_random(3)
    vec = psi.to_sparse_matrix.toarray().reshape(-1, 1)
    val = single_term_expval(PauliwordOp.from_list(["XYZ"]), psi)
    assert np.isclose(val, (vec.conj().T @ dense_pauli("XYZ") @ vec)[0, 0].real)


def test_change_of_basis():
    Pop = PauliwordOp.from_list(["XYZI"])
    U = change_of_basis_XY_to_Z(Pop)
    res = (U * Pop * U.dagger).cleanup()
    assert list(res.to_dictionary.keys()) == ["ZZZI"]
    assert np.allclose(
        dense_op(U) @ dense_op(U).conj().T, np.eye(16), atol=1e-12
    )


def test_expval_vs_dense():
    op = PauliwordOp.random(3, 6)
    op = (op + op.dagger).multiply_by_constant(0.5)
    psi = QuantumState.haar_random(3)
    vec = psi.to_sparse_matrix.toarray().reshape(-1, 1)
    assert np.isclose(op.expval(psi), (vec.conj().T @ dense_op(op) @ vec)[0, 0].real)


def test_clique_cover():
    op = PauliwordOp.random(4, 10).cleanup()
    for strategy in ["largest_first", "sorted_insertion"]:
        cover = op.clique_cover(edge_relation="C", strategy=strategy)
        # every clique internally commutes; cliques partition the terms
        n_total = 0
        for clique in cover.values():
            assert np.all(clique.commutes_termwise(clique))
            n_total += clique.n_terms
        assert n_total >= op.n_terms  # identity padding may add terms


def test_expval_dense_support_route():
    """A state covering the full basis routes through the X-grouped-diagonal
    expval (O(G 2^n); the sparse-support kernels are O(T B)..O(T B^2) and
    pathological there) and agrees with the dense-matrix oracle."""
    nq = 11
    op = PauliwordOp.random(nq, 60, complex_coeffs=False)
    op = (op + op.dagger).cleanup()
    psi = QuantumState.haar_random(nq)  # support = 2^nq rows
    assert psi._s_pack.shape[0] >= 1024
    vec = psi.to_sparse_matrix.toarray().reshape(-1)
    expect = float(np.real(vec.conj() @ (op.to_sparse_matrix @ vec)))
    assert np.isclose(op.expval(psi), expect, atol=1e-10)


def test_expval_returns_complex():
    """Regression (review finding): expval must return the complex value the
    reference's sum(expvals * coeff_vec) does — a non-Hermitian operator
    (e.g. i[H, A]) has a meaningful imaginary part."""
    op = PauliwordOp.from_list(["Z"], [1j])
    psi = QuantumState(np.array([[0]]), [1])
    assert np.isclose(op.expval(psi), 1j)
    assert np.isclose(op.to_device().expval(psi), 1j)


def test_to_dataframe_pairs_cleaned_terms():
    """Regression (review finding): strings and coefficients must both come
    from the cleaned operator (cleanup reorders and merges terms)."""
    op = PauliwordOp.from_list(["ZZ", "XX", "XX"], [1.0, 2.0, 3.0])
    df = op.to_dataframe
    got = dict(zip(df["Pauli terms"], df["Coefficients (real)"]))
    assert got == {"XX": 5.0, "ZZ": 1.0}


def test_getitem_negative_slices():
    """Regression (review finding): op[:-1] must mean all-but-last, not an
    empty operator (slice.indices semantics)."""
    op = PauliwordOp.from_list(["XX", "YY", "ZZ"], [1.0, 2.0, 3.0])
    assert op[:-1].n_terms == 2
    assert op[-2:].n_terms == 2
    psi = QuantumState(np.array([[0, 0], [0, 1], [1, 1]]), [1.0, 2.0, 3.0])
    assert psi[:-1].n_terms == 2


def test_perform_rotations_rejects_multi_term():
    """Regression (review finding): a multi-term rotation operator must
    raise (the reference's single-term guard), not silently truncate."""
    H = PauliwordOp.from_list(["ZZ"], [1.0])
    bad = PauliwordOp.from_list(["XI", "IZ"], [1.0, 1.0])
    with pytest.raises(AssertionError):
        H.perform_rotations([(bad, 0.3)])


def test_hash_consistent_with_eq():
    """Regression (review finding): isclose-equal operators must hash
    equal (hash covers the cleaned term set, not rounded coefficients)."""
    a = PauliwordOp.from_list(["Z"], [0.100000005])
    b = PauliwordOp.from_list(["Z"], [0.099999995])
    assert a == b
    assert hash(a) == hash(b)


def test_int32_symplectic_accepted():
    """Regression (review finding): any integer dtype is a valid 0/1
    symplectic matrix, not only the platform default int."""
    op = PauliwordOp(np.array([[0, 1, 1, 0]], dtype=np.int32), [1.0])
    assert op.n_terms == 1 and op.n_qubits == 2


def test_expval_mismatched_qubits_raises():
    op = PauliwordOp.from_list(["ZZ"], [1.0])
    psi3 = QuantumState(np.array([[0, 0, 0]]), [1.0])
    with pytest.raises(AssertionError):
        op.expval(psi3)
    with pytest.raises(AssertionError):
        op * psi3
