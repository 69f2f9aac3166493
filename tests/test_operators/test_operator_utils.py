"""GF(2) and utility-function tests (modeled on symmer test_operator_utils.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp
from symmer_tpu.operators.utils import (
    _cref_binary,
    _rref_binary,
    binary_array_to_int,
    check_adjmat_noncontextual,
    check_independent,
    check_jordan_independent,
    cref_binary,
    matmul_GF2,
    mul_symplectic,
    perform_noncontextual_sweep,
    rref_binary,
    string_to_symplectic,
    symplectic_to_string,
    unit_n_sphere_cartesian_coords,
)

rng = np.random.default_rng(0)


def _ref_rref(matrix):
    """direct transliteration of the reference _rref_binary loop as oracle"""
    m = matrix.copy()
    for i, row in enumerate(m):
        if np.any(row):
            piv = np.where(row)[0][0]
            upd = np.setdiff1d(np.where(m[:, piv]), i)
            m[upd] = np.bitwise_xor(m[upd], row)
    return m


def test_string_symplectic_roundtrip():
    for s in ["IXYZ", "ZZZZ", "IIII", "YXIZ"]:
        symp = string_to_symplectic(s, 4)
        assert symplectic_to_string(symp) == s


def test_string_to_symplectic_validates():
    with pytest.raises(AssertionError):
        string_to_symplectic("AXYZ", 4)
    with pytest.raises(AssertionError):
        string_to_symplectic("XY", 4)


def test_matmul_gf2():
    A = rng.integers(0, 2, (7, 9)).astype(bool)
    B = rng.integers(0, 2, (9, 5)).astype(bool)
    assert np.array_equal(matmul_GF2(A, B), (A.astype(int) @ B.astype(int)) % 2 == 1)


def test_rref_matches_reference_semantics():
    for _ in range(10):
        m = rng.integers(0, 2, (8, 12)).astype(bool)
        assert np.array_equal(_rref_binary(m), _ref_rref(m))


def test_rref_reordered_pivots_ascend():
    m = rng.integers(0, 2, (8, 12)).astype(bool)
    red = rref_binary(m)
    pivots = [np.where(r)[0][0] for r in red if np.any(r)]
    assert pivots == sorted(pivots)


def test_cref_is_transposed_rref():
    m = rng.integers(0, 2, (8, 12)).astype(bool)
    assert np.array_equal(_cref_binary(m), _ref_rref(m.T.copy()).T)
    assert np.array_equal(cref_binary(m), rref_binary(m.T.copy()).T)


def test_check_independent():
    assert check_independent(PauliwordOp.from_list(["XI", "IZ"]))
    assert not check_independent(PauliwordOp.from_list(["ZI", "IZ", "ZZ"]))
    # more than 2N terms can never be independent
    assert not check_independent(PauliwordOp.from_list(["XI", "YI", "ZI", "IX", "IZ"]))


def test_check_jordan_independent():
    # reference docstring example (operators/utils.py:533-541)
    H = PauliwordOp.from_dictionary(
        {"IIIZ": 1, "IIZI": 1, "ZIII": 1, "IXII": 1, "XIIX": 1}
    )
    assert check_jordan_independent(H)
    # {XX, YY, ZZ} is dependent under the Jordan product check
    assert not check_jordan_independent(PauliwordOp.from_list(["XX", "YY", "ZZ"]))


def test_check_adjmat_noncontextual():
    op = PauliwordOp.from_list(["XI", "IZ", "ZZ", "ZI"])
    assert check_adjmat_noncontextual(op.adjacency_matrix)
    op2 = PauliwordOp.from_list(["III", "IIZ", "ZII", "IXZ", "IYZ", "YYZ"])
    assert not check_adjmat_noncontextual(op2.adjacency_matrix)


def test_noncontextual_sweep():
    np.random.seed(0)
    op = PauliwordOp.random(4, 20).cleanup()
    nc = perform_noncontextual_sweep(op)
    assert nc.is_noncontextual
    assert nc.n_terms <= op.n_terms


def test_mul_symplectic():
    s1 = string_to_symplectic("XY", 2)
    s2 = string_to_symplectic("YX", 2)
    out, coeff = mul_symplectic(s1, 1, s2, 1)
    assert symplectic_to_string(out) == "ZZ"
    assert coeff == 1


def test_binary_array_to_int():
    assert list(binary_array_to_int(np.array([[1, 0, 1], [0, 1, 1]]))) == [5, 3]
    # wide rows stay exact via Python ints
    wide = np.zeros((1, 70), dtype=int)
    wide[0, 0] = 1
    assert binary_array_to_int(wide)[0] == 2**69


def test_unit_n_sphere():
    angles = rng.uniform(0, np.pi, 4)
    coords = unit_n_sphere_cartesian_coords(angles)
    assert np.isclose(np.linalg.norm(coords), 1)


def test_check_adjmat_noncontextual_large_matches_reference_formula():
    """The packed hash-dedup path (> 64 rows) must agree with the reference
    np.unique formulation on both random and clique-structured matrices."""
    import numpy as np

    for seed in range(20):
        rng = np.random.default_rng(seed)
        m = int(rng.integers(65, 220))
        if seed % 2:
            A = rng.integers(0, 2, (m, m)).astype(bool)
            A |= A.T
            np.fill_diagonal(A, True)
        else:
            k = int(rng.integers(2, 6))
            labels = rng.integers(0, k, m)
            A = labels[:, None] == labels[None, :]
            A[labels == 0] = True
            A[:, labels == 0] = True
        nm = ~np.all(A, axis=1)
        sub = A[nm][:, nm]
        u = np.unique(sub, axis=0)
        want = bool(np.all(np.count_nonzero(u, axis=0) == 1))
        assert check_adjmat_noncontextual(A) == want, seed


def test_symplectic_cleanup_wrapper():
    """API-parity wrapper (reference operators/utils.py:230-279)."""
    from symmer_tpu.operators.utils import symplectic_cleanup

    symp = np.array(
        [[1, 0, 0, 1], [1, 0, 0, 1], [0, 1, 1, 0], [1, 0, 0, 1]], dtype=bool
    )
    m, c = symplectic_cleanup(symp, [1 + 2j, 3, 0.5, -4])
    d = {tuple(row): coeff for row, coeff in zip(m.astype(int).tolist(), c)}
    assert d[(1, 0, 0, 1)] == 1 + 2j + 3 - 4
    assert d[(0, 1, 1, 0)] == 0.5
    # threshold drops the cancelling group
    m2, c2 = symplectic_cleanup(
        np.array([[1, 0, 0, 1], [1, 0, 0, 1], [0, 1, 1, 0]], dtype=bool),
        [2.0, -2.0, 1.0],
        zero_threshold=1e-12,
    )
    assert m2.shape[0] == 1 and c2[0] == 1.0


def test_symplectic_to_sparse_matrix_wrapper():
    from symmer_tpu.operators.utils import symplectic_to_sparse_matrix

    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.diag([1.0, -1.0]).astype(complex)
    sv = string_to_symplectic("XYZ", 3)
    out = symplectic_to_sparse_matrix(sv, 1.5 - 0.5j)
    ref = (1.5 - 0.5j) * np.kron(np.kron(X, Y), Z)
    assert np.allclose(out.toarray(), ref)


def test_prepare_chunks_parity():
    from symmer_tpu.parallel import process

    chunks = list(process.prepare_chunks(range(7)))
    flat = [x for ch in chunks for x in ch]
    assert flat == list(range(7))
    assert len(chunks) == min(7, process.n_logical_cores)
    assert list(process.prepare_chunks([])) == []


def test_numba_matmal_aliases_match_dense_mod2():
    from symmer_tpu.operators.utils import (
        numba_binary_matmal_GF2,
        numba_dot_matmal_GF2,
    )

    rng = np.random.default_rng(7)
    A = rng.integers(0, 2, (13, 9)).astype(bool)
    B = rng.integers(0, 2, (9, 17)).astype(bool)
    expected = (A.astype(int) @ B.astype(int)) % 2 == 1
    assert np.array_equal(numba_binary_matmal_GF2(A, B), expected)
    assert np.array_equal(numba_dot_matmal_GF2(A, B), expected)
    assert np.array_equal(matmul_GF2(A, B), expected)
