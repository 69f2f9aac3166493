"""Verified GF(2) sketch for the symmetry-generator null-space search.

Covers kernels/gf2.py:_kernel_basis_sketched / kernel_basis_symplectic and
the native xor_fold / null_check2 primitives behind them (the tall-matrix
fast path of IndependentOp.symmetry_generators, reference
independent_op.py:90-144).
"""
import numpy as np
import pytest

from symmer_tpu.kernels import gf2, pack

try:
    from symmer_tpu.native import gf2core
except Exception:  # pragma: no cover
    gf2core = None

rng = np.random.default_rng(17)


def _tall_matrix_with_kernel(R, n_bits, k):
    """R x n_bits packed bit matrix whose kernel has dimension >= k: the
    last k columns are XOR combinations of earlier columns, so the vectors
    (dependency ^ e_{n-k+i}) all lie in the null space."""
    dense = rng.integers(0, 2, (R, n_bits - k), dtype=np.uint8).astype(bool)
    mix = rng.integers(0, 2, (n_bits - k, k), dtype=np.uint8).astype(bool)
    dep = (dense.astype(np.uint8) @ mix.astype(np.uint8)) & 1
    full = np.hstack([dense, dep.astype(bool)])
    return pack.pack_bits(full), full


def _in_null(M_dense, v_pack, n_bits):
    v = pack.unpack_bits(v_pack, n_bits)
    return not (((M_dense.astype(np.uint8) @ v.T.astype(np.uint8)) & 1).any())


@pytest.mark.parametrize("R,n_bits,k", [(6000, 40, 3), (9000, 64, 1), (5000, 30, 0)])
def test_sketched_kernel_matches_exact(R, n_bits, k):
    Mp, Md = _tall_matrix_with_kernel(R, n_bits, k)
    exact = gf2.kernel_basis_packed(Mp, n_bits)
    sketched = gf2._kernel_basis_sketched(Mp, n_bits)
    # the sketch either returns the EXACT kernel (verified) or None (fallback)
    if sketched is None:
        pytest.skip("sketch declined (verification failed) -- fallback path")
    assert sketched.shape[0] == exact.shape[0] >= k
    for v in sketched:
        assert _in_null(Md, v[None, :], n_bits)


def test_sketched_kernel_numpy_fold_path(monkeypatch):
    """Without the native module the fold runs through np.bitwise_xor.reduceat;
    result must be identical in dimension and membership."""
    import symmer_tpu.native as native_pkg

    if getattr(native_pkg, "gf2core", None) is None:
        pytest.skip("native module absent; numpy path is already the default")
    Mp, Md = _tall_matrix_with_kernel(7000, 48, 2)
    exact = gf2.kernel_basis_packed(Mp, 48)
    monkeypatch.setattr(native_pkg, "gf2core", None)
    sketched = gf2._kernel_basis_sketched(Mp, 48)
    assert sketched is not None and sketched.shape[0] == exact.shape[0]
    for v in sketched:
        assert _in_null(Md, v[None, :], 48)


@pytest.mark.parametrize("R,n_a,n_b", [(8192 + 7, 20, 20), (10_000, 33, 17)])
def test_kernel_basis_symplectic_matches_materialised(R, n_a, n_b):
    """Two-block entry point == kernel of the materialised concatenation."""
    k = 2
    n_bits = n_a + n_b
    Mp, Md = _tall_matrix_with_kernel(R, n_bits, k)
    A = pack.pack_bits(Md[:, :n_a])
    B = pack.pack_bits(Md[:, n_a:])
    out = gf2.kernel_basis_symplectic(A, n_a, B, n_b)
    exact = gf2.kernel_basis_packed(Mp, n_bits)
    assert out.shape[0] == exact.shape[0] >= k
    for v in out:
        assert _in_null(Md, v[None, :], n_bits)


def test_kernel_basis_symplectic_small_uses_exact_path():
    """Below the sketch threshold (R <= 4096) the result is still correct."""
    Mp, Md = _tall_matrix_with_kernel(512, 24, 2)
    A = pack.pack_bits(Md[:, :12])
    B = pack.pack_bits(Md[:, 12:])
    out = gf2.kernel_basis_symplectic(A, 12, B, 12)
    exact = gf2.kernel_basis_packed(Mp, 24)
    assert out.shape[0] == exact.shape[0]


@pytest.mark.skipif(gf2core is None, reason="native build unavailable")
def test_native_xor_fold_matches_numpy_oracle():
    R, W, m = 5000, 3, 70
    M = rng.integers(0, 1 << 63, (R, W), dtype=np.uint64)
    idx = rng.integers(0, m, R).astype(np.int64)
    out = gf2core.xor_fold(M, idx, m)
    oracle = np.zeros((m, W), dtype=np.uint64)
    for i in range(R):
        oracle[idx[i]] ^= M[i]
    assert np.array_equal(out, oracle)


@pytest.mark.skipif(gf2core is None, reason="native build unavailable")
def test_native_null_check2():
    n_a = n_b = 16
    Mp, Md = _tall_matrix_with_kernel(5000, n_a + n_b, 2)
    A = pack.pack_bits(Md[:, :n_a])
    B = pack.pack_bits(Md[:, n_a:])
    kern = gf2.kernel_basis_packed(Mp, n_a + n_b)
    va = gf2.extract_bit_range(kern, 0, n_a)
    vb = gf2.extract_bit_range(kern, n_a, n_b)
    assert gf2core.null_check2(A, B, va, vb)
    # flip one bit of one candidate -> no longer in the null space
    va_bad = va.copy()
    va_bad[0, 0] ^= np.uint64(1)
    assert not gf2core.null_check2(A, B, va_bad, vb)


def test_symmetry_generators_at_sketch_scale():
    """End-to-end: symmetry discovery on a >4096-term operator goes through
    the sketched path and every discovered generator commutes with H."""
    from symmer_tpu.operators import IndependentOp

    import bench

    H = bench._synthetic_taper_operator(n_qubits=40, n_terms=6000, n_sym=4,
                                        seed=11)
    gens = IndependentOp.symmetry_generators(H)
    assert gens.n_terms >= 4
    assert not gens.anticommutes_termwise(H).any()
