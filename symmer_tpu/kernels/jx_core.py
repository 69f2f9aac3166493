"""Device (XLA/TPU) implementations of the symplectic kernels.

Layout: uint32 bit planes ``x32, z32 : uint32[n_terms, n_words32]`` -- the
little-endian view of the host uint64 planes (see kernels/pack.py).

Coefficients are carried as SPLIT real/imaginary float planes ``cr, ci``
(complex dtypes are avoided on the TPU compute path entirely: XLA TPU lowers
complex to re/im pairs anyway, and split planes shard and fuse cleanly).
Pauli phases are powers of i times a sign, so the phase application reduces to
lane swaps and negations -- no transcendental complex arithmetic anywhere.

All functions are pure and jit-compiled with *static shapes*: callers pad the
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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import jx_df

UINT = jnp.uint32

# multiply-xor mixing constants for the 32-bit row-hash lanes.  The default
# cleanup groups rows by the full 4-lane (128-bit) signature: the probability
# that any two of n distinct rows collide is ~ n^2 / 2^129 (~1e-29 at n=2^18,
# far below f32 coefficient noise); cleanup_sorted(exact=True) instead
# compares full rows at group boundaries, where a 2-lane sort-key collision
# can only ever split a group, never merge distinct Pauli terms.
_HASH_MULT = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)
_HASH_INIT = (0x811C9DC5, 0xDEADBEEF, 0x1B873593, 0x165667B1)


def pc(a: jnp.ndarray) -> jnp.ndarray:
    """Population count -> int32."""
    return lax.population_count(a).astype(jnp.int32)


def y_count(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(pc(x & z), axis=-1)


def parity_and(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """parity(popcount(a & b)) along the word axis -> int32 in {0,1}."""
    return jnp.sum(pc(a & b), axis=-1) & 1


def apply_i_pow(k: jnp.ndarray, re: jnp.ndarray, im: jnp.ndarray):
    """(re, im) * i^k for integer array k (broadcastable with re/im)."""
    k = k % 4
    # i^k: 0 -> (re, im); 1 -> (-im, re); 2 -> (-re, -im); 3 -> (im, -re)
    out_re = jnp.where(
        k == 0, re, jnp.where(k == 1, -im, jnp.where(k == 2, -re, im))
    )
    out_im = jnp.where(
        k == 0, im, jnp.where(k == 1, re, jnp.where(k == 2, -im, -re))
    )
    return out_re, out_im


# ---------------------------------------------------------------------------
# coefficient-lane abstraction
#
# A coefficient plane arrives as either a 1-D float array (plain f32/f64) or
# a (..., 2) array of double-float [hi, lo] pairs (see jx_df).  Internally
# every kernel works on a flat tuple of float lanes -- (re, im) plain, or
# (re_h, re_l, im_h, im_l) double-float -- with the helpers below; the shape
# switch happens at trace time, so one jitted entry point serves both
# precisions.
# ---------------------------------------------------------------------------

def c_lanes(cr, ci):
    """Normalise (cr, ci) planes to (lane tuple, is_double_float)."""
    if cr.ndim >= 2 and cr.shape[-1] == 2:
        return (cr[..., 0], cr[..., 1], ci[..., 0], ci[..., 1]), True
    return (cr, ci), False


def c_pack(c, df):
    """Lane tuple -> (cr, ci) planes in the caller's layout."""
    if df:
        return jnp.stack([c[0], c[1]], -1), jnp.stack([c[2], c[3]], -1)
    return c[0], c[1]


def c_add(a, b, df):
    if df:
        rh, rl = jx_df.df_add(a[0], a[1], b[0], b[1])
        ih, il = jx_df.df_add(a[2], a[3], b[2], b[3])
        return (rh, rl, ih, il)
    return (a[0] + b[0], a[1] + b[1])


def c_mul(a, b, df):
    """Complex product of lane tuples (broadcasting)."""
    if df:
        p1 = jx_df.df_mul(a[0], a[1], b[0], b[1])
        p2 = jx_df.df_mul(a[2], a[3], b[2], b[3])
        p3 = jx_df.df_mul(a[0], a[1], b[2], b[3])
        p4 = jx_df.df_mul(a[2], a[3], b[0], b[1])
        rr = jx_df.df_sub(*p1, *p2)
        ii = jx_df.df_add(*p3, *p4)
        return (rr[0], rr[1], ii[0], ii[1])
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def c_scale_exact(c, s):
    """Multiply by an EXACT factor (+-1, 0, powers of two): lanewise, lossless."""
    return tuple(l * s for l in c)


def c_scale_df(c, sv, df):
    """Multiply by a real scalar given as () plain or (2,) double-float."""
    if df:
        sh, sl = sv[0], sv[1]
        rr = jx_df.df_mul(c[0], c[1], sh, sl)
        ii = jx_df.df_mul(c[2], c[3], sh, sl)
        return (rr[0], rr[1], ii[0], ii[1])
    return tuple(l * sv for l in c)


def c_ipow(k, c, df):
    """Multiply by i^k -- exact lane swaps/negations."""
    if df:
        rh, ih = apply_i_pow(k, c[0], c[2])
        rl, il = apply_i_pow(k, c[1], c[3])
        return (rh, rl, ih, il)
    r, i = apply_i_pow(k, c[0], c[1])
    return (r, i)


def c_where(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def c_zeros(c):
    return tuple(jnp.zeros_like(l) for l in c)


def c_mag2_hi(c, df):
    """|c|^2 at working (single-word) precision -- for threshold compares."""
    if df:
        re = c[0] + c[1]
        im = c[2] + c[3]
        return re * re + im * im
    return c[0] * c[0] + c[1] * c[1]


def _wmask(pred, a, b):
    """jnp.where with the predicate broadcast over a trailing [hi, lo] axis."""
    if a.ndim > pred.ndim:
        pred = pred[..., None]
    return jnp.where(pred, a, b)


def mul_pairs(x1, z1, cr1, ci1, x2, z2, cr2, ci2):
    """All-pairs product: returns (x, z, cr, ci) with rows ordered i*M2+j."""
    M1, W = x1.shape
    M2 = x2.shape[0]
    xo = x1[:, None, :] ^ x2[None, :, :]
    zo = z1[:, None, :] ^ z2[None, :, :]
    y_in = y_count(x1, z1)[:, None] + y_count(x2, z2)[None, :]
    y_out = jnp.sum(pc(xo & zo), axis=-1)
    c1, df = c_lanes(cr1, ci1)
    c2, df2 = c_lanes(cr2, ci2)
    assert df == df2, "mixed-precision operands"
    sign = (1 - 2 * (jnp.sum(pc(x1[:, None, :] & z2[None, :, :]), axis=-1) & 1)).astype(c1[0].dtype)
    # c1 * c2 (outer), then * sign * i^(3 y_in + y_out)
    p = c_mul(tuple(l[:, None] for l in c1), tuple(l[None, :] for l in c2), df)
    p = c_scale_exact(p, sign)
    p = c_ipow(3 * y_in + y_out, p, df)
    p = tuple(l.reshape(M1 * M2) for l in p)
    pr, pi = c_pack(p, df)
    return xo.reshape(M1 * M2, W), zo.reshape(M1 * M2, W), pr, pi


def mul_single(x, z, cr, ci, xr, zr):
    """Multiply every term by one Pauli (row vectors xr, zr) from the right."""
    xo = x ^ xr[None, :]
    zo = z ^ zr[None, :]
    y_in = y_count(x, z) + y_count(xr[None, :], zr[None, :])[0]
    y_out = y_count(xo, zo)
    c, df = c_lanes(cr, ci)
    sign = (1 - 2 * parity_and(x, zr[None, :])).astype(c[0].dtype)
    p = c_ipow(3 * y_in + y_out, c_scale_exact(c, sign), df)
    pr, pi = c_pack(p, df)
    return xo, zo, pr, pi


def row_hashes(x: jnp.ndarray, z: jnp.ndarray, lanes: int = 2) -> Tuple[jnp.ndarray, ...]:
    """``lanes`` independent 32-bit mixes of each packed row.

    Two lanes (64 bits) serve as sort keys where group boundaries compare the
    full rows (a collision can only split a group, never merge); four lanes
    (128 bits) serve as the grouping signature of the default cleanup.

    Tabulation-style: each word is keyed by a lane-specific position constant,
    sent through two multiply-xorshift rounds, and XOR-folded along the row.
    Unlike a sequential word chain (a fori_loop of strided column reads, ~4 ms
    at 250k rows x 32 words on TPU) this is one full-bandwidth elementwise
    pass plus a row reduction (~0.3 ms)."""
    words = jnp.concatenate([x, z], axis=1)  # (T, 2W)
    T, WW = words.shape
    hs = []
    for mult, init in zip(_HASH_MULT[:lanes], _HASH_INIT[:lanes]):
        posc = (jnp.arange(WW, dtype=UINT) + UINT(init)) * UINT(0x9E3779B9)
        posc = posc ^ (posc >> UINT(16))
        v = (words ^ posc[None, :]) * jnp.uint32(mult)
        v = (v ^ (v >> UINT(15))) * jnp.uint32(0x85EBCA77)
        v = (v ^ (v >> UINT(13))) * jnp.uint32(0xC2B2AE35)
        v = v ^ (v >> UINT(16))
        h = lax.reduce(v, UINT(init), lax.bitwise_xor, dimensions=(1,))
        hs.append(h)
    return tuple(hs)


def _rows_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def effective_threshold(th, cr, ci, rel_floor):
    """Dtype-aware cleanup threshold: ``max(th, rel_floor * max|c|)``.

    With float32 coefficients, terms that cancel leave O(eps32 * |c|) residue
    -- far above any absolute threshold meaningful at f64 (the reference
    default 1e-15 is below f32 resolution entirely).  Flooring the threshold
    at a small multiple of the largest input magnitude makes the f32 device
    path drop cancellation residue with the same *intent* as the reference's
    absolute cut (symmer operators/utils.py:271-279).  ``rel_floor`` is 0 on
    the f64 path; the double-float path uses a much smaller floor
    (~u_df^2 residue, config.extended_threshold_rel_floor).
    """
    if rel_floor is None:
        return th
    c, df = c_lanes(cr, ci)
    m2 = jnp.max(c_mag2_hi(c, df))
    return jnp.maximum(th, rel_floor * jnp.sqrt(m2))


def cleanup_sorted(
    x: jnp.ndarray,
    z: jnp.ndarray,
    cr: jnp.ndarray,
    ci: jnp.ndarray,
    n_valid: jnp.ndarray,
    zero_threshold: Optional[jnp.ndarray] = None,
    exact: bool = False,
    rel_floor: Optional[jnp.ndarray] = None,
):
    """Deduplicate terms: sort by hashed keys, segment-sum coefficients.

    Args:
        x, z: uint32[T, W] planes (rows >= n_valid are ignored).
        cr, ci: float[T] coefficient planes.
        n_valid: scalar count of valid rows.
        zero_threshold: optional scalar; terms with |coeff| <= threshold are
            dropped (matching symmer cleanup semantics).
        exact: group boundaries compare full rows (slower: the sorted row
            planes must be materialised).  The default groups by the sorted
            128-bit hash signature instead, so the only full-row traffic is
            one gather of the surviving representatives -- at 2^18 rows the
            chance of any signature collision is ~1e-29, far below float
            coefficient noise.
        rel_floor: optional scalar; floors the threshold at
            ``rel_floor * max|c|`` (see :func:`effective_threshold`).

    Returns:
        (x_out, z_out, cr_out, ci_out, n_out): compacted arrays of static
        shape [T, ...] with the first ``n_out`` rows valid (remaining zeroed).
    """
    if zero_threshold is not None and rel_floor is not None:
        valid_c = jnp.arange(x.shape[0]) < n_valid
        zero_threshold = effective_threshold(
            zero_threshold, _wmask(valid_c, cr, jnp.zeros_like(cr)),
            _wmask(valid_c, ci, jnp.zeros_like(ci)), rel_floor,
        )
    T, W = x.shape
    valid = jnp.arange(T) < n_valid
    invalid_flag = (~valid).astype(UINT)
    idx = jnp.arange(T)

    if exact:
        assert cr.ndim == 1, (
            "exact_cleanup_keys is not supported with double-float "
            "coefficient planes (use the default hash-signature cleanup)"
        )
        h1, h2 = row_hashes(x, z)
        perm = jnp.lexsort((h2, h1, invalid_flag))
        xs, zs = x[perm], z[perm]
        vs = valid[perm]
        joint = jnp.concatenate([xs, zs], axis=1)
        same_as_prev = jnp.concatenate([
            jnp.array([False]),
            _rows_equal(joint[1:], joint[:-1]) & vs[1:] & vs[:-1],
        ])
        crs = jnp.where(vs, cr[perm], 0)
        cis = jnp.where(vs, ci[perm], 0)

        boundary = (~same_as_prev) & vs
        seg_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        seg_id = jnp.where(vs, seg_id, T - 1)
        n_unique = jnp.sum(boundary.astype(jnp.int32))

        # exact segment sums via one stacked scatter-add (prefix-sum
        # differences would cancel catastrophically for segments that sum to
        # ~0, precisely the case the zero threshold must detect)
        starts = jnp.full(T + 1, n_valid, dtype=jnp.int32).at[
            jnp.where(boundary, seg_id, T)
        ].min(idx.astype(jnp.int32))
        c_pair = jnp.stack([crs, cis], axis=1)
        c_sum = jax.ops.segment_sum(c_pair, seg_id, num_segments=T)
        cr_sum, ci_sum = c_sum[:, 0], c_sum[:, 1]
        in_range = idx < n_unique
        cr_sum = jnp.where(in_range, cr_sum, 0)
        ci_sum = jnp.where(in_range, ci_sum, 0)

        if zero_threshold is not None:
            keep = in_range & (
                cr_sum * cr_sum + ci_sum * ci_sum
                > zero_threshold * zero_threshold
            )
            dest = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, T)
            n_out = jnp.sum(keep.astype(jnp.int32))
            final = idx < n_out
            kseg = jnp.zeros(T, jnp.int32).at[dest].set(
                jnp.where(keep, idx, 0).astype(jnp.int32)  # idx is i64 under x64
            )
            kseg = jnp.where(final, kseg, 0)
            orig = perm[jnp.clip(starts[kseg], 0, T - 1)]
            x_o = jnp.where(final[:, None], x[orig], 0)
            z_o = jnp.where(final[:, None], z[orig], 0)
            cr_o = jnp.where(final, cr_sum[kseg], 0)
            ci_o = jnp.where(final, ci_sum[kseg], 0)
            return x_o, z_o, cr_o, ci_o, n_out

        orig = perm[jnp.clip(starts[:T], 0, T - 1)]
        x_u = jnp.where(in_range[:, None], x[orig], 0)
        z_u = jnp.where(in_range[:, None], z[orig], 0)
        return x_u, z_u, cr_sum, ci_sum, n_unique

    # ---- fast path: group by the sorted 128-bit signature ------------------
    # Everything is laid out per *sorted row*; segment machinery (seg ids,
    # start tables, per-segment gathers) is replaced by a segmented scan and
    # a sort-based compaction -- scatters AND gathers are avoided entirely:
    # the planes already exist in HBM, so their word columns ride both sorts
    # as payload lanes (see _cleanup_from_hashes on why riding always beats
    # the representative-row gather on TPU).
    h1, h2, h3, h4 = row_hashes(x, z, lanes=4)
    return _cleanup_from_hashes(
        (h1, h2, h3, h4), cr, ci, invalid_flag,
        zero_threshold, lambda orig: (x[orig], z[orig]),
        plane_lanes=_ride_lanes(x, z),
    )


# Widest operator whose plane columns ride the cleanup sorts as payload
# lanes.  Beyond this (ultra-wide, few-term operators: the 100M-qubit regime)
# the per-word lane tuple would explode trace/compile time, and the
# representative-row gather is cheap at small row counts anyway.
_RIDE_MAX_WORDS = 256


def _ride_lanes(x, z):
    """(x_lanes, z_lanes) per-word columns for sort-payload riding, or None
    when the operator is too wide (gather fallback)."""
    W = x.shape[1]
    if W > _RIDE_MAX_WORDS:
        return None
    return (
        tuple(x[:, w] for w in range(W)),
        tuple(z[:, w] for w in range(W)),
    )


def _segmented_inclusive_sum(c, seg_start, df):
    """Inclusive segmented sum of coefficient lanes: each row accumulates its
    segment up to itself, so segment LAST rows carry the totals.

    Hand-rolled Hillis-Steele: log2(T) rounds of shift-by-2^k masked adds.
    ``lax.associative_scan`` computes the same thing but costs 2.25x more on
    TPU (0.90 vs 0.40 ms at 2^18 rows) -- its generic combinator machinery
    emits slice/concat pairs per level that XLA does not fuse away.  The
    segmented form never SUBTRACTS, so segments summing to ~0 (exactly the
    rows the zero threshold must drop) lose no precision to cancellation;
    in double-float mode the adds are compensated (jx_df.df_add).
    """
    T = c[0].shape[0]
    f = seg_start
    d = 1
    while d < T:
        shifted = tuple(
            jnp.concatenate([jnp.zeros(d, l.dtype), l[:-d]]) for l in c
        )
        fs = jnp.concatenate([jnp.ones(d, bool), f[:-d]])
        c = c_where(f, c, c_add(c, shifted, df))
        f = f | fs
        d *= 2
    return c


def _cleanup_from_hashes(hs, cr, ci, invalid_flag, zero_threshold, row_source,
                         rel_floor=None, plane_lanes=None):
    """Shared tail of the hash-signature cleanup.

    ``row_source(orig_idx) -> (x_rows, z_rows)`` materialises the surviving
    representative rows; passing an index-reconstructing closure (e.g. XOR of
    two factor rows for an all-pairs product) means the full product planes
    never need to exist in HBM at all.

    ``plane_lanes`` -- an (x_lane_tuple, z_lane_tuple) of per-word (T,)
    uint32 columns -- instead rides the PLANES through both sorts as payload
    and skips ``row_source`` entirely.  On TPU a gather lowers to serialised
    row DMAs whose cost explodes with row count (measured v5e, W=32 words:
    3.5 ms at 2^17 rows, 39 ms at 2^20) while ``lax.sort`` payload lanes are
    bandwidth-flat (0.6 -> 4 ms for 70 lanes over the same range), so
    callers whose planes already exist in HBM should always ride.

    ``cr, ci`` may be plain 1-D planes or (T, 2) double-float [hi, lo] pairs;
    every coefficient lane rides the sorts as bitcast integer values and the
    segment sums run at the lane tuple's precision.
    """
    c_in, df = c_lanes(cr, ci)
    h1, h2, h3, h4 = hs
    T = h1.shape[0]
    idx = jnp.arange(T)
    fdt = c_in[0].dtype
    ubits = jnp.uint64 if fdt.itemsize == 8 else UINT
    fbits = lambda f: lax.bitcast_convert_type(f, ubits)
    funbits = lambda u: lax.bitcast_convert_type(u, fdt)
    if plane_lanes is not None:
        xl, zl = plane_lanes
        Wx, Wz = len(xl), len(zl)
        sorted_all = lax.sort(
            (invalid_flag, h1, h2, h3, h4)
            + tuple(fbits(l) for l in c_in) + tuple(xl) + tuple(zl),
            num_keys=5,
        )
        invs, h1s, h2s, h3s, h4s = sorted_all[:5]
        nc = len(c_in)
        c_sorted = sorted_all[5 : 5 + nc]
        planes_sorted = sorted_all[5 + nc :]
        perm = None
    else:
        sorted_all = lax.sort(
            (invalid_flag, h1, h2, h3, h4, idx.astype(UINT))
            + tuple(fbits(l) for l in c_in),
            num_keys=5,
        )
        invs, h1s, h2s, h3s, h4s, perm_u = sorted_all[:6]
        perm = perm_u.astype(jnp.int32)
        c_sorted = sorted_all[6:]
    vs = invs == 0
    cs = c_where(vs, tuple(funbits(b) for b in c_sorted),
                 c_zeros(c_in))
    if zero_threshold is not None and rel_floor is not None:
        zero_threshold = effective_threshold(
            zero_threshold, *c_pack(cs, df), rel_floor
        )
    same_as_prev = jnp.concatenate([
        jnp.array([False]),
        (h1s[1:] == h1s[:-1]) & (h2s[1:] == h2s[:-1])
        & (h3s[1:] == h3s[:-1]) & (h4s[1:] == h4s[:-1])
        & vs[1:] & vs[:-1],
    ])
    # Segment sums via a FORWARD segmented inclusive scan (log2(T) masked
    # shift-adds, see _segmented_inclusive_sum): each segment's LAST row ends
    # up carrying the full segment total.  A scatter-add onto the boundary
    # rows computes the same thing but costs ~8 ms at 2^18 rows on TPU --
    # the scan costs ~0.4 ms.
    seg_start = ~same_as_prev
    tot = _segmented_inclusive_sum(cs, seg_start, df)
    is_last = jnp.concatenate([~same_as_prev[1:], jnp.array([True])]) & vs

    if zero_threshold is not None:
        is_out = is_last & (
            c_mag2_hi(tot, df) > zero_threshold * zero_threshold
        )
    else:
        is_out = is_last
    n_out = jnp.sum(is_out.astype(jnp.int32))
    final = idx < n_out
    # Compaction via a second sort rather than a scatter: survivor rows get
    # their position as the key (preserving hash order), dropped rows the
    # max-u32 sentinel, and the representative planes-or-index + summed
    # coefficient bits ride as values.  On TPU the (T, 3)-payload scatter
    # this replaces costs ~2.7 ms at 2^18 rows while the sort costs ~0.9 ms
    # (measured on v5e; the scatter lowers to serialised row DMAs, the sort
    # stays vector).
    key = jnp.where(is_out, idx.astype(UINT), UINT(0xFFFFFFFF))
    if plane_lanes is not None:
        # any row of a segment carries the representative planes (all rows in
        # a segment are the same term); is_out marks segment LAST rows
        sorted_c = lax.sort(
            (key,) + tuple(fbits(l) for l in tot) + tuple(planes_sorted),
            num_keys=1,
        )
        nc = len(c_in)
        x_rows = jnp.stack(sorted_c[1 + nc : 1 + nc + Wx], axis=1)
        z_rows = jnp.stack(sorted_c[1 + nc + Wx :], axis=1)
        c_bits = sorted_c[1 : 1 + nc]
    else:
        sorted_c = lax.sort(
            (key, perm.astype(UINT)) + tuple(fbits(l) for l in tot), num_keys=1
        )
        out_orig = sorted_c[1].astype(jnp.int32)
        x_rows, z_rows = row_source(out_orig)
        c_bits = sorted_c[2:]
    x_o = jnp.where(final[:, None], x_rows, 0)
    z_o = jnp.where(final[:, None], z_rows, 0)
    c_out = c_where(final, tuple(funbits(b) for b in c_bits),
                    c_zeros(c_in))
    cr_o, ci_o = c_pack(c_out, df)
    return x_o, z_o, cr_o, ci_o, n_out


def mul_pairs_cleanup(x1, z1, cr1, ci1, x2, z2, cr2, ci2, zero_threshold=None,
                      rel_floor=None):
    """Fused all-pairs product + cleanup: the (T1*T2, W) product planes never
    reach HBM.

    The hash pass consumes the XOR broadcast on the fly, the sort works on
    hash lanes + coefficients only, and the surviving representative rows are
    reconstructed at the end from their pair index (x1[i] ^ x2[j]) -- the only
    consumer that would otherwise force XLA to materialise the full planes.
    (Semantics identical to mul_pairs followed by cleanup_sorted.)
    """
    T1, W = x1.shape
    T2 = x2.shape[0]
    T = T1 * T2
    xo = x1[:, None, :] ^ x2[None, :, :]
    zo = z1[:, None, :] ^ z2[None, :, :]
    hs = row_hashes(xo.reshape(T, W), zo.reshape(T, W), lanes=4)
    y_in = y_count(x1, z1)[:, None] + y_count(x2, z2)[None, :]
    y_out = jnp.sum(pc(xo & zo), axis=-1)
    c1, df = c_lanes(cr1, ci1)
    c2, _ = c_lanes(cr2, ci2)
    sign = (
        1 - 2 * (jnp.sum(pc(x1[:, None, :] & z2[None, :, :]), axis=-1) & 1)
    ).astype(c1[0].dtype)
    p = c_mul(tuple(l[:, None] for l in c1), tuple(l[None, :] for l in c2), df)
    p = c_scale_exact(p, sign)
    p = c_ipow(3 * y_in + y_out, p, df)
    pr, pi = c_pack(tuple(l.reshape(T) for l in p), df)

    def row_source(orig):
        i, j = orig // T2, orig % T2
        return x1[i] ^ x2[j], z1[i] ^ z2[j]

    return _cleanup_from_hashes(
        hs, pr, pi, jnp.zeros(T, UINT),
        zero_threshold, row_source, rel_floor=rel_floor,
    )


def anticommutes(x1, z1, x2, z2) -> jnp.ndarray:
    """bool[M1, M2]: True where term pairs anticommute."""
    a = jnp.sum(pc(x1[:, None, :] & z2[None, :, :]), axis=-1)
    b = jnp.sum(pc(z1[:, None, :] & x2[None, :, :]), axis=-1)
    return ((a + b) & 1).astype(bool)


def qubitwise_commutes(x1, z1, x2, z2) -> jnp.ndarray:
    """bool[M1, M2]: True where term pairs commute qubit by qubit (difference
    bits masked to joint support vanish)."""
    diff = (
        (x1[:, None, :] ^ x2[None, :, :]) | (z1[:, None, :] ^ z2[None, :, :])
    ) & (x1 | z1)[:, None, :] & (x2 | z2)[None, :, :]
    return ~jnp.any(diff != 0, axis=2)


def anticommutes_single(x, z, xr, zr) -> jnp.ndarray:
    a = parity_and(x, zr[None, :]) + parity_and(z, xr[None, :])
    return (a & 1).astype(bool)


def clifford_scan(x, z, cr, ci, rx, rz, rm):
    """Apply a sequence of Clifford rotations R_k(m_k * pi/2) via lax.scan.

    Args:
        x, z: uint32[T, W]; cr, ci: float[T].
        rx, rz: uint32[D, W] rotation Pauli planes.
        rm: int32[D] pi/2 multiples (mod 4 semantics on anticommuting terms:
            0:+P 1:-iPQ 2:-P 3:+iPQ).
    Returns:
        rotated (x, z, cr, ci) -- term count is preserved (Clifford property).
    """

    def step(carry, rot):
        x, z, cr, ci = carry
        xr, zr, m = rot
        ac = anticommutes_single(x, z, xr, zr)
        m4 = m % 4
        xm, zm, mr, mi = mul_single(x, z, cr, ci, xr, zr)
        # phase: m4==1 -> -i * (PQ product); m4==3 -> +i  (exact lane swaps;
        # mr/mi may carry a trailing [hi, lo] axis in double-float mode)
        pr1, pi1 = mi, -mr     # -i * (mr + i mi)
        pr3, pi3 = -mi, mr     # +i * (mr + i mi)
        swap = ac & ((m4 == 1) | (m4 == 3))
        x_new = jnp.where(swap[:, None], xm, x)
        z_new = jnp.where(swap[:, None], zm, z)
        sel_r = jnp.where(m4 == 1, pr1, pr3)
        sel_i = jnp.where(m4 == 1, pi1, pi3)
        keep_r = jnp.where(m4 == 2, -cr, cr)
        keep_i = jnp.where(m4 == 2, -ci, ci)
        is_swap_phase = (m4 == 1) | (m4 == 3)
        cr_new = _wmask(ac, jnp.where(is_swap_phase, sel_r, keep_r), cr)
        ci_new = _wmask(ac, jnp.where(is_swap_phase, sel_i, keep_i), ci)
        return (x_new, z_new, cr_new, ci_new), None

    # unroll: at small term counts the per-step cost is scan dispatch latency,
    # not arithmetic -- unrolling amortises it across several rotations
    (x, z, cr, ci), _ = lax.scan(step, (x, z, cr, ci), (rx, rz, rm), unroll=8)
    return x, z, cr, ci


def _trig_values(angle, trig, fdt, df):
    """cos/sin for the rotation: either precomputed (``trig``, host-split
    double-float pairs in extended mode -- device f32 cos is only ~1e-7
    accurate) or computed on device from ``angle`` (plain mode)."""
    if trig is not None:
        cos_v, sin_v = trig
    else:
        cos_v = jnp.cos(angle).astype(fdt)
        sin_v = jnp.sin(angle).astype(fdt)
        if df:
            zero = jnp.zeros((), fdt)
            cos_v = jnp.stack([cos_v, zero])
            sin_v = jnp.stack([sin_v, zero])
    return cos_v, sin_v


def _rotate_nc_parts(x, z, cr, ci, xr, zr, angle, trig):
    """Shared body: (anticommute mask, product planes, first/second lanes, df)."""
    c, df = c_lanes(cr, ci)
    ac = anticommutes_single(x, z, xr, zr)
    xm, zm, mr, mi = mul_single(x, z, cr, ci, xr, zr)
    c_m, _ = c_lanes(mr, mi)
    cos_v, sin_v = _trig_values(angle, trig, c[0].dtype, df)
    first = c_where(ac, c_scale_df(c, cos_v, df), c)
    # -i sin(t) * (mr + i mi): i^3 swap (exact) then scale by sin
    second = c_where(
        ac, c_scale_df(c_ipow(3, c_m, df), sin_v, df), c_zeros(c_m)
    )
    return ac, xm, zm, first, second, df


def rotate_nonclifford(x, z, cr, ci, xr, zr, angle, trig=None):
    """Non-Clifford rotation producing 2T rows: [orig terms, PQ terms].

    Commuting terms keep coefficient in the first copy (second copy zeroed);
    anticommuting terms split cos(t)/-i sin(t) across the copies.  Compose with
    cleanup_sorted.
    """
    _, xm, zm, first, second, df = _rotate_nc_parts(
        x, z, cr, ci, xr, zr, angle, trig
    )
    both = tuple(jnp.concatenate([a, b]) for a, b in zip(first, second))
    cr_o, ci_o = c_pack(both, df)
    return (
        jnp.concatenate([x, xm], axis=0),
        jnp.concatenate([z, zm], axis=0),
        cr_o,
        ci_o,
    )


def rotate_nonclifford_cleanup(x, z, cr, ci, xr, zr, angle, n_valid, zero_threshold,
                               rel_floor=None, trig=None):
    """Fused non-Clifford rotation + cleanup in one program.

    Output row i < T is the original term i; row i >= T is term (i-T) times
    the rotation Pauli -- hashes come from two fused passes over the T input
    rows, and the doubled plane columns ride the cleanup sorts as payload
    (gather-free).  Semantics identical to rotate_nonclifford followed by
    cleanup_sorted.
    """
    T, W = x.shape
    _, xm, zm, first, second, df = _rotate_nc_parts(
        x, z, cr, ci, xr, zr, angle, trig
    )
    h_first = row_hashes(x, z, lanes=4)
    h_second = row_hashes(x ^ xr[None, :], z ^ zr[None, :], lanes=4)
    hs = tuple(jnp.concatenate([a, b]) for a, b in zip(h_first, h_second))
    both = tuple(jnp.concatenate([a, b]) for a, b in zip(first, second))
    crs, cis = c_pack(both, df)
    invalid_flag = (
        ~jnp.concatenate([jnp.arange(T) < n_valid] * 2)
    ).astype(UINT)

    # the doubled plane columns ride the cleanup sorts directly (concatenating
    # a word column with its rotated twin is one linear pass; the alternative
    # representative-row gather serialises into row DMAs -- see
    # _cleanup_from_hashes)
    def row_source(orig):
        i = jnp.where(orig < T, orig, orig - T)
        rot = orig >= T
        xw = jnp.where(rot[:, None], xr[None, :], 0)
        zw = jnp.where(rot[:, None], zr[None, :], 0)
        return x[i] ^ xw, z[i] ^ zw

    ride = None
    if W <= _RIDE_MAX_WORDS:
        ride = (
            tuple(jnp.concatenate([x[:, w], xm[:, w]]) for w in range(W)),
            tuple(jnp.concatenate([z[:, w], zm[:, w]]) for w in range(W)),
        )
    return _cleanup_from_hashes(
        hs, crs, cis, invalid_flag, zero_threshold, row_source,
        rel_floor=rel_floor, plane_lanes=ride,
    )


def clifford_project_cleanup(
    x, z, cr, ci, n_valid,
    rx, rz, rm,
    stab_x, stab_z,
    neg_x, neg_z,
    col_keep,
    zero_threshold,
    rel_floor=None,
):
    """Fused stabilizer-subspace projection: Clifford rotation scan, commuting-
    term selection, eigenvalue sign flips, stabilized-column masking and
    cleanup -- one device round trip for the whole flagship taper/CS-VQE
    projection (reference projection/base.py:44-124 runs these as separate
    host passes with an operator transfer between each).

    Args:
        x, z: uint32[T, W] operator planes; cr, ci: float[T]; n_valid scalar.
        rx, rz: uint32[D, W] Clifford rotation planes, rm: int32[D] pi/2
            multiples (D == 0 skips the scan).
        stab_x, stab_z: uint32[S, W] rotated (single-qubit) stabilizer planes.
        neg_x, neg_z: uint32[W] OR of the single-bit masks of stabilizers with
            eigenvalue -1 (x-side / z-side).  A 0 eigenvalue (failed sector
            assignment) behaves as +1, matching the reference's
            ``eigval_assignment[assignment == 0] = 1`` (projection/base.py:67-72)
            -- the caller simply leaves such stabilizers out of the masks.
        col_keep: uint32[W] mask of FREE qubit bits (stabilized columns are
            zeroed before dedup -- equivalent to the reference's column
            deletion for grouping purposes; the caller deletes the columns
            from the compacted host result).
        zero_threshold, rel_floor: as in cleanup_sorted.

    Returns:
        (x_out, z_out, cr_out, ci_out, n_out) with stabilized columns zeroed.
    """
    T, W = x.shape
    if rx.shape[0]:
        x, z, cr, ci = clifford_scan(x, z, cr, ci, rx, rz, rm)
    c, df = c_lanes(cr, ci)
    # drop terms anticommuting with any rotated stabilizer
    keep = ~jnp.any(anticommutes(x, z, stab_x, stab_z), axis=1)
    # eigenvalue sign flips: each stabilizer tests ONE symplectic bit of the
    # term; the product of -1 assignments is a parity over the OR'd masks
    flip = (
        1 - 2 * ((parity_and(x, neg_x[None, :]) + parity_and(z, neg_z[None, :])) & 1)
    ).astype(c[0].dtype)
    live = keep & (jnp.arange(T) < n_valid)
    w = jnp.where(live, flip, 0)
    cr2, ci2 = c_pack(c_scale_exact(c, w), df)
    xm = x & col_keep[None, :]
    zm = z & col_keep[None, :]
    hs = row_hashes(xm, zm, lanes=4)
    return _cleanup_from_hashes(
        hs, cr2, ci2, (~live).astype(UINT), zero_threshold,
        lambda orig: (xm[orig], zm[orig]), rel_floor=rel_floor,
        plane_lanes=_ride_lanes(xm, zm),
    )


def check_noncontextual_adj(adj):
    """Device-resident noncontextuality test on a commutation adjacency
    matrix -- returns a single bool.

    Criterion (reference operators/utils.py:567-589, after arXiv:1904.02260):
    drop "universal" terms (commuting with everything); the rest is
    noncontextual iff the distinct commutation-adjacency rows partition the
    non-universal terms into cliques, i.e. every non-universal column is hit
    by exactly one distinct row.

    Runs entirely on device: the M x M adjacency never crosses to the host
    (an 8000-term adjacency is 64 MB of bools -- seconds through a remote
    PJRT relay; this kernel returns ONE byte).  Row dedup reuses the hash
    machinery: rows are bit-packed on device and grouped by their 128-bit
    signature.  Padding rows (zero planes = identity) commute with everything,
    so they land in the universal class and drop out automatically.
    """
    T = adj.shape[0]
    universal = jnp.all(adj, axis=1)
    # pack adjacency rows to uint32 lanes for hashing: (T, ceil(T/32))
    Wp = -(-T // 32)
    pad = Wp * 32 - T
    bits = jnp.pad(adj, ((0, 0), (0, pad))).reshape(T, Wp, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(jnp.where(bits, weights, 0), axis=2, dtype=UINT)
    h1, h2, h3, h4 = row_hashes(packed, jnp.zeros_like(packed), lanes=4)
    inv = universal.astype(UINT)
    invs, h1s, h2s, h3s, h4s, perm_u = lax.sort(
        (inv, h1, h2, h3, h4, jnp.arange(T, dtype=UINT)), num_keys=5
    )
    vs = invs == 0
    same_as_prev = jnp.concatenate([
        jnp.array([False]),
        (h1s[1:] == h1s[:-1]) & (h2s[1:] == h2s[:-1])
        & (h3s[1:] == h3s[:-1]) & (h4s[1:] == h4s[:-1]) & vs[1:] & vs[:-1],
    ])
    is_rep = (~same_as_prev) & vs
    rep = jnp.zeros(T, bool).at[perm_u.astype(jnp.int32)].set(is_rep)
    counts = jnp.sum(jnp.where(rep[:, None], adj, False), axis=0)
    return jnp.all(jnp.where(universal, True, counts == 1))


def expval_iz_sum(x, cr, ci, n_valid):
    """Sum coefficients of terms composed only of I/Z (X planes all zero).

    This is <0...0| O |0...0> and the final reduction of the Clifford
    simulator (cf. symmer circuit_symmerlator.py:158-166).
    Returns (re, im) -- scalars in plain mode, (2,) double-float pairs in
    extended mode (compensated tree reduction, jx_df.df_sum).
    """
    T = x.shape[0]
    is_diag = jnp.all(x == 0, axis=1) & (jnp.arange(T) < n_valid)
    c, df = c_lanes(cr, ci)
    c = c_where(is_diag, c, c_zeros(c))
    if df:
        re = jx_df.df_sum(c[0], c[1])
        im = jx_df.df_sum(c[2], c[3])
        return jnp.stack(re), jnp.stack(im)
    return jnp.sum(c[0]), jnp.sum(c[1])
