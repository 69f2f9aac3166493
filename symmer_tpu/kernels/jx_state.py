"""Device (XLA/TPU) kernels for Pauli action on computational-basis states.

Same one-sparse action as the host path (kernels/state_core.py):

    P|s> = (-i)^{|Y|} (-1)^{popcount((s^x) & z)} |s ^ x>

All-pairs application produces (T*B) basis rows; deduplication reuses the
sort-based cleanup machinery (a state is just a packed bit matrix with a zero
Z plane).  The inner product merges two sorted row sets: rows are sorted with
an origin flag, and equal adjacent rows from opposite origins contribute
amp_bra * amp_ket.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import jx_core


def apply_to_ket(x, z, cr, ci, s, ar, ai):
    """All (term, basis) pairs of O|psi>: returns (bits, amp_re, amp_im).

    x, z: uint32[T, W]; cr, ci: float[T]; s: uint32[B, W]; ar, ai: float[B].
    Output rows ordered t*B + b.
    """
    T, W = x.shape
    B = s.shape[0]
    bits = (s[None, :, :] ^ x[:, None, :]).reshape(T * B, W)
    y_cnt = jx_core.y_count(x, z)  # (T,)
    par = (
        jnp.sum(jx_core.pc(bits.reshape(T, B, W) & z[:, None, :]), axis=-1) & 1
    )  # (T, B)
    # (-i)^y * c  then * (-1)^par, outer with state amplitudes
    pr, pi = jx_core.apply_i_pow(-y_cnt, cr, ci)  # (-i)^y == i^(-y)
    sign = (1 - 2 * par).astype(cr.dtype)
    out_r = (pr[:, None] * ar[None, :] - pi[:, None] * ai[None, :]) * sign
    out_i = (pr[:, None] * ai[None, :] + pi[:, None] * ar[None, :]) * sign
    return bits, out_r.reshape(T * B), out_i.reshape(T * B)


def cleanup_state(bits, ar, ai, n_valid, zero_threshold=None):
    """Deduplicate basis rows, accumulating amplitudes (reuses cleanup_sorted)."""
    zeros = jnp.zeros_like(bits)
    b_o, _, ar_o, ai_o, n = jx_core.cleanup_sorted(
        bits, zeros, ar, ai, n_valid, zero_threshold
    )
    return b_o, ar_o, ai_o, n


def inner_product_sorted(s1, a1r, a1i, n1, s2, a2r, a2i, n2):
    """<bra|ket> for DEDUPLICATED packed states; bra amplitudes pre-conjugated.

    Concatenates both row sets with an origin flag, sorts by row hash, and
    sums products over equal adjacent pairs (each row appears at most once per
    side after dedup, so matching rows are adjacent post-sort).
    Returns (re, im).
    """
    T1, W = s1.shape
    T2 = s2.shape[0]
    rows = jnp.concatenate([s1, s2], axis=0)
    origin = jnp.concatenate(
        [jnp.zeros(T1, jnp.int32), jnp.ones(T2, jnp.int32)]
    )
    valid = jnp.concatenate(
        [jnp.arange(T1) < n1, jnp.arange(T2) < n2]
    )
    ar = jnp.concatenate([a1r, a2r])
    ai = jnp.concatenate([a1i, a2i])

    h1, h2 = jx_core.row_hashes(rows, jnp.zeros_like(rows))
    # sort by (validity, h1, h2, origin): equal rows land adjacent, bra first
    perm = jnp.lexsort(
        (origin.astype(jnp.uint32), h2, h1, (~valid).astype(jnp.uint32))
    )
    rs = rows[perm]
    os_ = origin[perm]
    vs = valid[perm]
    ars = jnp.where(vs, ar[perm], 0)
    ais = jnp.where(vs, ai[perm], 0)

    eq = jnp.all(rs[1:] == rs[:-1], axis=-1) & vs[1:] & vs[:-1]
    pair = eq & (os_[:-1] == 0) & (os_[1:] == 1)
    pr = ars[:-1] * ars[1:] - ais[:-1] * ais[1:]
    pi = ars[:-1] * ais[1:] + ais[:-1] * ars[1:]
    return (
        jnp.sum(jnp.where(pair, pr, 0)),
        jnp.sum(jnp.where(pair, pi, 0)),
    )


def expval(x, z, cr, ci, s, ar, ai, n_basis):
    """Re/Im of <psi|O|psi> for a packed operator and packed state.

    The state must be deduplicated; the operator need not be.
    """
    bits, br, bi = apply_to_ket(x, z, cr, ci, s, ar, ai)
    bits, br, bi, n = cleanup_state(bits, br, bi, bits.shape[0])
    # bra amplitudes = conjugated state amplitudes
    return inner_product_sorted(s, ar, -ai, n_basis, bits, br, bi, n)
