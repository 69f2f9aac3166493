"""Dense / sparse matrix realisations of packed Pauli operators.

Pauli tensor products are one-sparse: row r maps to column r ^ x_int with value
(-i)^{|Y|} (-1)^{popcount(r & z_int)} (cf. symmer ``operators/utils.py:182-228``
and the XOR-indexing construction ``base.py:1477-1498``).  This module provides

  - scipy CSR construction (API parity with ``to_sparse_matrix``),
  - a matrix-free matvec (host and jitted device) enabling iterative
    eigensolvers far beyond the reference's 30-qubit dense cap.

Integer basis convention: qubit 0 is the MOST significant bit of the basis
index (reference convention).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from . import pack


def plane_ints(pck: np.ndarray, n_qubits: int) -> np.ndarray:
    """Packed rows -> int64 with qubit 0 as MSB.  Requires n_qubits <= 62."""
    assert n_qubits <= 62, "plane_ints limited to 62 qubits"
    bits = pack.unpack_bits(pck, n_qubits).astype(np.int64)
    weights = (1 << np.arange(n_qubits - 1, -1, -1)).astype(np.int64)
    return bits @ weights


def to_sparse_matrix(x, z, c, n_qubits: int):
    """scipy CSR matrix of the operator (n_qubits <= ~16 advisable)."""
    from scipy.sparse import csr_matrix

    if n_qubits == 0:
        return csr_matrix(np.array([[np.sum(c)]]))
    dim = 1 << n_qubits
    x_int = plane_ints(x, n_qubits)
    z_int = plane_ints(z, n_qubits)
    y_cnt = np.bitwise_count(x & z).sum(axis=1).astype(np.int64)
    rows = np.arange(dim, dtype=np.int64)
    # chunk over terms to bound the (T, dim) intermediates
    T = x.shape[0]
    out = csr_matrix((dim, dim), dtype=complex)
    step = max(1, (1 << 24) // dim)
    minus_i_pow = np.array([1, -1j, -1, 1j])
    for t0 in range(0, T, step):
        t1 = min(T, t0 + step)
        cols = rows[None, :] ^ x_int[t0:t1, None]
        par = np.bitwise_count(rows[None, :] & z_int[t0:t1, None]).astype(np.int64) & 1
        vals = (
            (minus_i_pow[y_cnt[t0:t1] % 4] * c[t0:t1])[:, None]
            * (1 - 2 * par)
        )
        row_idx = np.broadcast_to(rows, (t1 - t0, dim)).reshape(-1)
        out = out + csr_matrix(
            (vals.reshape(-1), (row_idx, cols.reshape(-1))), shape=(dim, dim)
        )
    return out


def matvec_host(x, z, c, n_qubits: int, v: np.ndarray) -> np.ndarray:
    """H @ v without materialising H (host)."""
    dim = 1 << n_qubits
    x_int = plane_ints(x, n_qubits)
    z_int = plane_ints(z, n_qubits)
    y_cnt = np.bitwise_count(x & z).sum(axis=1).astype(np.int64)
    minus_i_pow = np.array([1, -1j, -1, 1j])
    rows = np.arange(dim, dtype=np.int64)
    out = np.zeros(dim, dtype=complex)
    step = max(1, (1 << 24) // dim)
    for t0 in range(0, len(c), step):
        t1 = min(len(c), t0 + step)
        src = rows[None, :] ^ x_int[t0:t1, None]         # H[r, r^x] pattern
        par = np.bitwise_count(rows[None, :] & z_int[t0:t1, None]).astype(np.int64) & 1
        amp = (minus_i_pow[y_cnt[t0:t1] % 4] * c[t0:t1])[:, None] * (1 - 2 * par)
        out += np.sum(amp * v[src], axis=0)
    return out


def make_linear_operator(x, z, c, n_qubits: int):
    """scipy LinearOperator backed by the matrix-free matvec."""
    from scipy.sparse.linalg import LinearOperator

    dim = 1 << n_qubits
    return LinearOperator(
        (dim, dim),
        matvec=lambda v: matvec_host(x, z, c, n_qubits, np.asarray(v).reshape(-1)),
        dtype=complex,
    )


def matvec_device_fn(n_qubits: int):
    """Return a jitted (x_int, z_int, phase_c, v) -> H@v device matvec.

    phase_c = (-i)^{|Y|} * coeff, precomputed per term.  The gather
    v[r ^ x_int] is a TPU-friendly batched permutation.
    """
    import jax
    import jax.numpy as jnp

    dim = 1 << n_qubits

    @jax.jit
    def mv(x_int, z_int, phase_c, v):
        rows = jnp.arange(dim, dtype=jnp.int32 if n_qubits < 31 else jnp.int64)

        def body(carry, term):
            xi, zi, pc_ = term
            src = rows ^ xi
            par = jax.lax.population_count(rows & zi).astype(jnp.int32) & 1
            sgn = (1 - 2 * par).astype(v.dtype)
            return carry + pc_ * sgn * v[src], None

        out, _ = jax.lax.scan(body, jnp.zeros(dim, v.dtype), (x_int, z_int, phase_c))
        return out

    return mv
