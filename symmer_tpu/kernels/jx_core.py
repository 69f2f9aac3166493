"""Device (XLA/TPU) implementations of the symplectic kernels.

Layout: uint32 bit planes ``x32, z32 : uint32[n_terms, n_words32]`` -- the
little-endian view of the host uint64 planes (see kernels/pack.py).  All
functions here are pure and jit-compiled with *static shapes*: callers pad the
term axis to power-of-two buckets and carry an explicit validity count, the key
divergence from the reference's dynamically-shaped numpy design (SURVEY §7.1).

Kernel inventory (reference counterparts cited):
  - mul_pairs / mul_single : broadcast XOR + popcount phase
      (symmer operators/base.py:764-794)
  - cleanup_sorted : hashed-key lexicographic sort + segment-sum dedup,
      replacing qiskit's Rust ``unordered_unique`` (operators/utils.py:271-279)
  - anticommutes  : GF(2) symplectic inner product (operators/base.py:938-971)
  - clifford_scan : a depth-D sequence of pi/2 rotations applied as one
      ``lax.scan`` -- the TPU-idiomatic replacement for symmer's per-rotation
      Python loop (operators/base.py:1163-1186)
  - rotate_nonclifford : cos/sin split rotation (operators/base.py:1155-1161)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

UINT = jnp.uint32

# multiply-xor mixing constants for the 4x32-bit row hash (collision
# probability ~ n^3 / 2^128 -- and collisions can only ever *split* a
# coefficient group, never merge distinct Pauli terms, since group boundaries
# compare full rows)
_HASH_MULT = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)
_HASH_INIT = (0x811C9DC5, 0x01000193, 0xDEADBEEF, 0x1B873593)


def pc(a: jnp.ndarray) -> jnp.ndarray:
    """Population count -> int32."""
    return lax.population_count(a).astype(jnp.int32)


def y_count(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(pc(x & z), axis=-1)


def parity_and(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """parity(popcount(a & b)) along the word axis -> int32 in {0,1}."""
    return jnp.sum(pc(a & b), axis=-1) & 1


_I4_RE = jnp.array([1.0, 0.0, -1.0, 0.0])
_I4_IM = jnp.array([0.0, 1.0, 0.0, -1.0])


def _i_pow(k: jnp.ndarray, dtype) -> jnp.ndarray:
    """i**k (k int array, mod 4) as a complex array."""
    k = k % 4
    return (_I4_RE[k] + 1j * _I4_IM[k]).astype(dtype)


def mul_phase(x1, z1, x2, z2) -> jnp.ndarray:
    """Phase of the product P1 P2 relative to the XOR'd planes (complex)."""
    xo = x1 ^ x2
    zo = z1 ^ z2
    y_in = y_count(x1, z1) + y_count(x2, z2)
    y_out = y_count(xo, zo)
    sign = 1 - 2 * parity_and(x1, z2)
    return sign * _i_pow(3 * y_in + y_out, jnp.complex64)


def mul_pairs(x1, z1, c1, x2, z2, c2):
    """All-pairs product: returns (x, z, c) with rows ordered i*M2+j."""
    M1, W = x1.shape
    M2 = x2.shape[0]
    xo = x1[:, None, :] ^ x2[None, :, :]
    zo = z1[:, None, :] ^ z2[None, :, :]
    y_in = y_count(x1, z1)[:, None] + y_count(x2, z2)[None, :]
    y_out = jnp.sum(pc(xo & zo), axis=-1)
    sign = 1 - 2 * (jnp.sum(pc(x1[:, None, :] & z2[None, :, :]), axis=-1) & 1)
    phase = sign * _i_pow(3 * y_in + y_out, c1.dtype)
    c = phase * (c1[:, None] * c2[None, :])
    return xo.reshape(M1 * M2, W), zo.reshape(M1 * M2, W), c.reshape(M1 * M2)


def mul_single(x, z, c, xr, zr):
    """Multiply every term by one Pauli (row vectors xr, zr) from the right."""
    xo = x ^ xr[None, :]
    zo = z ^ zr[None, :]
    y_in = y_count(x, z) + y_count(xr[None, :], zr[None, :])[0]
    y_out = y_count(xo, zo)
    sign = 1 - 2 * parity_and(x, zr[None, :])
    phase = sign * _i_pow(3 * y_in + y_out, c.dtype)
    return xo, zo, phase * c


def row_hashes(x: jnp.ndarray, z: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Four independent 32-bit mixes of each packed row."""
    words = jnp.concatenate([x, z], axis=1)  # (T, 2W)
    T, WW = words.shape
    hs = []
    for mult, init in zip(_HASH_MULT, _HASH_INIT):
        h = jnp.full((T,), init, dtype=UINT)

        def body(i, h):
            w = words[:, i]
            h = (h ^ w) * jnp.uint32(mult)
            h = h ^ (h >> 15)
            return h

        h = lax.fori_loop(0, WW, body, h)
        hs.append(h)
    return tuple(hs)


def _rows_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def cleanup_sorted(
    x: jnp.ndarray,
    z: jnp.ndarray,
    c: jnp.ndarray,
    n_valid: jnp.ndarray,
    zero_threshold: Optional[jnp.ndarray] = None,
):
    """Deduplicate terms: sort by hashed keys, segment-sum coefficients.

    Args:
        x, z: uint32[T, W] planes (rows >= n_valid are ignored).
        c: complex[T].
        n_valid: scalar count of valid rows.
        zero_threshold: optional scalar; terms with |coeff| <= threshold are
            dropped (matching symmer cleanup semantics).

    Returns:
        (x_out, z_out, c_out, n_out): compacted arrays of static shape [T, ...]
        with the first ``n_out`` rows valid (remaining rows zeroed).
    """
    T, W = x.shape
    valid = jnp.arange(T) < n_valid
    invalid_flag = (~valid).astype(UINT)
    h1, h2, h3, h4 = row_hashes(x, z)
    perm = jnp.lexsort((h4, h3, h2, h1, invalid_flag))
    xs, zs, cs = x[perm], z[perm], c[perm]
    vs = valid[perm]
    cs = jnp.where(vs, cs, 0)

    joint = jnp.concatenate([xs, zs], axis=1)
    same_as_prev = jnp.concatenate([
        jnp.array([False]),
        _rows_equal(joint[1:], joint[:-1]) & vs[1:] & vs[:-1],
    ])
    boundary = (~same_as_prev) & vs
    seg_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # -1 for leading invalids
    seg_id = jnp.where(vs, seg_id, T - 1)
    n_unique = jnp.sum(boundary.astype(jnp.int32))

    c_sum = jax.ops.segment_sum(cs, seg_id, num_segments=T)
    # representative row per segment (first occurrence in sorted order)
    x_u = jnp.zeros_like(xs).at[seg_id].set(jnp.where(vs[:, None], xs, 0))
    z_u = jnp.zeros_like(zs).at[seg_id].set(jnp.where(vs[:, None], zs, 0))
    in_range = jnp.arange(T) < n_unique
    c_sum = jnp.where(in_range, c_sum, 0)

    if zero_threshold is not None:
        keep = in_range & (jnp.abs(c_sum) > zero_threshold)
        order = jnp.lexsort(((~keep).astype(jnp.int32),))  # stable: kept first
        x_u, z_u, c_sum = x_u[order], z_u[order], c_sum[order]
        n_out = jnp.sum(keep.astype(jnp.int32))
        final = jnp.arange(T) < n_out
        x_u = jnp.where(final[:, None], x_u, 0)
        z_u = jnp.where(final[:, None], z_u, 0)
        c_sum = jnp.where(final, c_sum, 0)
        return x_u, z_u, c_sum, n_out
    return x_u, z_u, c_sum, n_unique


def anticommutes(x1, z1, x2, z2) -> jnp.ndarray:
    """bool[M1, M2]: True where term pairs anticommute."""
    a = jnp.sum(pc(x1[:, None, :] & z2[None, :, :]), axis=-1)
    b = jnp.sum(pc(z1[:, None, :] & x2[None, :, :]), axis=-1)
    return ((a + b) & 1).astype(bool)


def anticommutes_single(x, z, xr, zr) -> jnp.ndarray:
    a = parity_and(x, zr[None, :]) + parity_and(z, xr[None, :])
    return (a & 1).astype(bool)


def clifford_scan(x, z, c, rx, rz, rm):
    """Apply a sequence of Clifford rotations R_k(m_k * pi/2) via lax.scan.

    Args:
        x, z: uint32[T, W]; c: complex[T].
        rx, rz: uint32[D, W] rotation Pauli planes.
        rm: int32[D] pi/2 multiples (mod 4 semantics: 0:+P 1:-iPQ 2:-P 3:+iPQ
            on anticommuting terms).
    Returns:
        rotated (x, z, c) -- term count is preserved (Clifford property).
    """

    def step(carry, rot):
        x, z, c = carry
        xr, zr, m = rot
        ac = anticommutes_single(x, z, xr, zr)
        m4 = m % 4
        xm, zm, cm = mul_single(x, z, c, xr, zr)
        phase = jnp.where(m4 == 1, -1j, 1j).astype(c.dtype)
        swap = ac & ((m4 == 1) | (m4 == 3))
        x_new = jnp.where(swap[:, None], xm, x)
        z_new = jnp.where(swap[:, None], zm, z)
        c_new = jnp.where(
            ac,
            jnp.where((m4 == 1) | (m4 == 3), cm * phase, jnp.where(m4 == 2, -c, c)),
            c,
        )
        return (x_new, z_new, c_new), None

    (x, z, c), _ = lax.scan(step, (x, z, c), (rx, rz, rm))
    return x, z, c


def rotate_nonclifford(x, z, c, xr, zr, angle):
    """Non-Clifford rotation producing 2T rows: [orig terms, PQ terms].

    Commuting terms keep coefficient in the first copy (second copy zeroed);
    anticommuting terms split cos(t)/-i sin(t) across the copies.  Compose with
    cleanup_sorted.
    """
    T, W = x.shape
    ac = anticommutes_single(x, z, xr, zr)
    xm, zm, cm = mul_single(x, z, c, xr, zr)
    cos_t = jnp.cos(angle)
    sin_t = jnp.sin(angle)
    c_first = jnp.where(ac, c * cos_t, c)
    c_second = jnp.where(ac, cm * (-1j * sin_t), 0)
    x_out = jnp.concatenate([x, xm], axis=0)
    z_out = jnp.concatenate([z, zm], axis=0)
    c_out = jnp.concatenate([c_first, c_second], axis=0)
    return x_out, z_out, c_out


def expval_iz_sum(x, z, c, n_valid) -> jnp.ndarray:
    """Sum coefficients of terms composed only of I/Z (X planes all zero).

    This is <0...0| O |0...0> and the final reduction of the Clifford
    simulator (cf. symmer circuit_symmerlator.py:158-166).
    """
    T = x.shape[0]
    is_diag = jnp.all(x == 0, axis=1) & (jnp.arange(T) < n_valid)
    return jnp.sum(jnp.where(is_diag, c, 0))
