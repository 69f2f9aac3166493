"""Device (XLA/TPU) GF(2) row reduction on packed rows.

Row-reduced echelon form without row reordering, identical semantics to the
host/C++ implementations (kernels/gf2.py, native/gf2core.cpp; reference
``_rref_binary`` operators/utils.py:292-315): iterate rows in order, pivot on
the lowest set bit, XOR the pivot row into every other row holding that bit.

The sequential pivoting runs as a ``fori_loop``; each step is a full-matrix
masked XOR, so the reduction streams at HBM bandwidth -- the regime that
matters is symmetry discovery over 10^5-term operators, where the transposed
stack is (2n) x (n_terms + 2n) bits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def rref_packed_device(M: jnp.ndarray) -> jnp.ndarray:
    """RREF over GF(2); M: uint32[R, W] packed rows (LSB-first bit order)."""
    R, W = M.shape

    def body(i, M):
        row = M[i]
        nonzero = row != 0
        any_nz = jnp.any(nonzero)
        w = jnp.argmax(nonzero)  # first nonzero word
        word = row[w]
        pivot_bit = word & (~word + jnp.uint32(1))  # lowest set bit
        hit = (M[:, w] & pivot_bit) != 0
        hit = hit.at[i].set(False)
        hit = hit & any_nz
        return jnp.where(hit[:, None], M ^ row[None, :], M)

    return lax.fori_loop(0, R, body, M)
