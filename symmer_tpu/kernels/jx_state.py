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

from . import jx_core, jx_df


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
    # (-i)^y * c  then * (-1)^par, outer with state amplitudes (lane-generic:
    # coefficient/amplitude planes may be (.., 2) double-float pairs)
    c, df = jx_core.c_lanes(cr, ci)
    a, _ = jx_core.c_lanes(ar, ai)
    p = jx_core.c_ipow(-y_cnt, c, df)  # (-i)^y == i^(-y)
    sign = (1 - 2 * par).astype(c[0].dtype)
    prod = jx_core.c_mul(
        tuple(l[:, None] for l in p), tuple(l[None, :] for l in a), df
    )
    prod = jx_core.c_scale_exact(prod, sign)
    out_r, out_i = jx_core.c_pack(tuple(l.reshape(T * B) for l in prod), df)
    return bits, out_r, out_i


def apply_to_bra(s, ar, ai, x, z, cr, ci):
    """All (basis, term) pairs of <psi|O: returns (bits, amp_re, amp_im).

    Bra phase: <s|P = (-i)^{|Y|} (-1)^{popcount(s & z)} <s ^ x| (the parity
    uses the ORIGINAL bits, unlike the ket side -- kernels/state_core.py:41).
    Output rows ordered b*T + t, matching the host path.
    """
    B, W = s.shape
    T = x.shape[0]
    bits = (s[:, None, :] ^ x[None, :, :]).reshape(B * T, W)
    y_cnt = jx_core.y_count(x, z)  # (T,)
    par = (
        jnp.sum(jx_core.pc(s[:, None, :] & z[None, :, :]), axis=-1) & 1
    )  # (B, T)
    c, df = jx_core.c_lanes(cr, ci)
    a, _ = jx_core.c_lanes(ar, ai)
    p = jx_core.c_ipow(-y_cnt, c, df)  # (-i)^y * c per term
    sign = (1 - 2 * par).astype(c[0].dtype)
    prod = jx_core.c_mul(
        tuple(l[:, None] for l in a), tuple(l[None, :] for l in p), df
    )
    prod = jx_core.c_scale_exact(prod, sign)
    out_r, out_i = jx_core.c_pack(tuple(l.reshape(B * T) for l in prod), df)
    return bits, out_r, out_i


def cleanup_state(bits, ar, ai, n_valid, zero_threshold=None, rel_floor=None):
    """Deduplicate basis rows, accumulating amplitudes (reuses cleanup_sorted)."""
    zeros = jnp.zeros_like(bits)
    b_o, _, ar_o, ai_o, n = jx_core.cleanup_sorted(
        bits, zeros, ar, ai, n_valid, zero_threshold, rel_floor=rel_floor
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
    c1, df = jx_core.c_lanes(a1r, a1i)
    c2, _ = jx_core.c_lanes(a2r, a2i)
    amp = tuple(jnp.concatenate([l1, l2]) for l1, l2 in zip(c1, c2))

    h1, h2 = jx_core.row_hashes(rows, jnp.zeros_like(rows))
    # sort by (validity, h1, h2, origin): equal rows land adjacent, bra first
    perm = jnp.lexsort(
        (origin.astype(jnp.uint32), h2, h1, (~valid).astype(jnp.uint32))
    )
    rs = rows[perm]
    os_ = origin[perm]
    vs = valid[perm]
    amps = jx_core.c_where(
        vs, tuple(l[perm] for l in amp),
        tuple(jnp.zeros_like(l) for l in amp),
    )

    eq = jnp.all(rs[1:] == rs[:-1], axis=-1) & vs[1:] & vs[:-1]
    pair = eq & (os_[:-1] == 0) & (os_[1:] == 1)
    prod = jx_core.c_mul(
        tuple(l[:-1] for l in amps), tuple(l[1:] for l in amps), df
    )
    prod = jx_core.c_where(pair, prod, jx_core.c_zeros(prod))
    if df:
        re = jx_df.df_sum(prod[0], prod[1])
        im = jx_df.df_sum(prod[2], prod[3])
        return jnp.stack(re), jnp.stack(im)
    return jnp.sum(prod[0]), jnp.sum(prod[1])


def expval(x, z, cr, ci, s, ar, ai, n_basis):
    """Re/Im of <psi|O|psi> for a packed operator and DEDUPLICATED state.

    Matched formulation -- never materialises or sorts the (T*B) product rows:

        <psi|O|psi> = sum_{t,b} c_t phase(t,b) a_b conj(a_{b'})
                      where s_{b'} = s_b ^ x_t  (if such a basis row exists)

    The lookup s_b ^ x_t -> b' goes through three independent 32-bit hashes of
    the rows: sorted lookup on lane 1, then all three lanes compared for the
    WINDOW candidates.  A false match requires a 96-bit hash collision
    (probability ~ T B^2 / 2^96 -- negligible); a true match is missed only if
    more than WINDOW distinct state rows share the lane-1 value.

    The candidate fetch is an MXU one-hot contraction, not a gather: on this
    TPU path a (T, B) gather from a B-sized table costs ~40 ms at 10k x 512
    while the equivalent one-hot matmul costs ~3 ms.  The WINDOW candidates
    share one one-hot matrix by pre-rolling the lookup table: candidate k of
    position p is row (p + k) mod B, so fetching from roll(table, -k) at
    position p.  The modular wrap (instead of a clip) also guarantees the
    WINDOW candidate positions are distinct, so a true match can never be
    double-counted (a clip aliases pos+k >= B onto row B-1 for several k).
    Hash words are compared as two exact 16-bit halves in the float domain.
    """
    T, W = x.shape
    B = s.shape[0]
    WINDOW = min(4, B)  # > B would wrap the roll fully around and re-visit rows
    c, df = jx_core.c_lanes(cr, ci)
    a, df_a = jx_core.c_lanes(ar, ai)
    assert df == df_a, "operator/state precision mismatch"
    fdt = c[0].dtype

    # state-row hashes: lane 1 is the lookup key; all lanes compared on match
    hs = _row_hashes3(s)
    order = jnp.argsort(hs[0])
    hs1_sorted = hs[0][order]

    # per-(t, b) hashes of the target rows s_b ^ x_t, built incrementally so
    # only (T, B) intermediates exist (must mirror _row_hashes3 exactly).
    # The arithmetic no-op mix of x keeps the loop carry's sharding variance
    # consistent when the term axis runs under shard_map (a plain jnp.full
    # carry is "unvarying" while the body output varies over the term axis).
    vary0 = x[:, :1] & jnp.uint32(0)  # (T, 1) of zeros, varying like x
    th = tuple(
        jnp.full((T, B), init, dtype=jnp.uint32) | vary0 for init in _HASH3_INIT
    )
    th = lax.fori_loop(0, 2 * W, lambda w, c: _target_hash_step(w, c, x, s), th)

    # phases: (-i)^{|Y_t|} (-1)^{popcount((s_b ^ x_t) & z_t)} * c_t
    y_cnt = jx_core.y_count(x, z)
    par = jnp.zeros((T, B), jnp.int32) + vary0.astype(jnp.int32)

    def par_body(w, par):
        word = s[None, :, w] ^ x[:, w, None]
        return par + jx_core.pc(word & z[:, w, None])

    par = lax.fori_loop(0, W, par_body, par) & 1
    p = jx_core.c_ipow(-y_cnt, c, df)  # (-i)^y * c per term
    sign = (1 - 2 * par).astype(fdt)
    # (T, B) phase * c_t lanes (sign multiply is exact per lane)
    t_lanes = tuple(l[:, None] * sign for l in p)

    basis_valid = jnp.arange(B) < n_basis

    # lookup table in sorted order, all lanes as exact float 16-bit halves
    # (<= 65535 is exact in f32; invalid rows get the sentinel half 65536,
    # which no real half can equal, and zeroed amplitudes)
    valid_sorted = basis_valid[order]
    sentinel = jnp.asarray(65536.0, fdt)

    def halves(h):
        return (h & jnp.uint32(0xFFFF)).astype(fdt), (h >> jnp.uint32(16)).astype(fdt)

    cols = []
    for lane in range(3):
        lo, hi = halves(hs[lane][order])
        cols.append(jnp.where(valid_sorted, lo, sentinel))
        cols.append(jnp.where(valid_sorted, hi, sentinel))
    for l in a:  # amplitude lanes: 2 plain, 4 double-float
        cols.append(jnp.where(valid_sorted, l[order], 0))
    ncols = len(cols)  # 6 hash halves + amplitude lanes
    table = jnp.stack(cols, axis=1)  # (B, ncols)
    # candidate k = row (pos + k) mod B: pre-roll the table per window slot
    table_wide = jnp.concatenate(
        [jnp.roll(table, -k, axis=0) for k in range(WINDOW)], axis=1
    )  # (B, ncols * WINDOW)

    th_halves = []
    for lane in range(3):
        lo, hi = halves(th[lane])
        th_halves.append((lo, hi))

    ab = tuple(l[None, :] for l in a)
    bvalid = basis_valid[None, :]
    # one-hot fetch + match + contribution, blocked over the term axis so the
    # (Tb, B, B) one-hot stays bounded.  The one-hot itself is built from a
    # monotone compare against the sorted keys (first c with key[c] >= target)
    # rather than jnp.searchsorted -- the binary search's serial gathers cost
    # ~420 ms alone at 10k x 512 on this TPU path, the compare is pure VPU.
    Tb = min(T, 128)
    n_blocks = -(-T // Tb)
    pad = n_blocks * Tb - T

    def pad_t(a, fill=0):
        return jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill) if pad else a

    th0_p = pad_t(th[0])
    th_p = [(pad_t(lo), pad_t(hi)) for lo, hi in th_halves]
    t_p = tuple(pad_t(l) for l in t_lanes)
    n_lanes = len(a)

    def block(carry, i):
        sl = lambda a_: lax.dynamic_slice(a_, (i * Tb, 0), (Tb, B))
        ge = hs1_sorted[None, None, :] >= sl(th0_p)[:, :, None]  # (Tb, B, B)
        # keys sorted => ge monotone in c; the first True is the candidate
        oh = (ge & ~jnp.pad(ge[:, :, :-1], ((0, 0), (0, 0), (1, 0)))).astype(fdt)
        # HIGHEST precision is required: the table carries exact 16-bit
        # integer halves, and the TPU MXU's default bf16 multiply (8 mantissa
        # bits) destroys them -- every hash comparison then fails and the
        # expectation silently evaluates to zero (caught by bench.py --check
        # on hardware; CPU f32 matmuls are exact and never exposed it)
        vals = jnp.einsum(
            "abc,cf->abf", oh, table_wide,
            preferred_element_type=fdt,
            precision=lax.Precision.HIGHEST,
        )  # (Tb, B, ncols * WINDOW)
        tb = tuple(sl(l) for l in t_p)
        m1 = jx_core.c_mul(tb, ab, df)  # phase * c_t * a_b, window-invariant
        out = carry
        for k in range(WINDOW):
            v = vals[:, :, ncols * k : ncols * (k + 1)]
            match = bvalid
            for lane in range(3):
                lo, hi = th_p[lane]
                match = match & (sl(lo) == v[:, :, 2 * lane]) & (
                    sl(hi) == v[:, :, 2 * lane + 1]
                )
            # conj of the fetched amplitude: negate the imaginary lanes
            if df:
                ac = (v[:, :, 6], v[:, :, 7], -v[:, :, 8], -v[:, :, 9])
            else:
                ac = (v[:, :, 6], -v[:, :, 7])
            cf = jx_core.c_mul(m1, ac, df)
            cf = jx_core.c_where(match, cf, jx_core.c_zeros(cf))
            if df:
                rr = jx_df.df_sum(cf[0], cf[1])
                ii = jx_df.df_sum(cf[2], cf[3])
                out = (
                    jx_df.df_add(out[0], out[1], rr[0], rr[1])
                    + jx_df.df_add(out[2], out[3], ii[0], ii[1])
                )
            else:
                out = (out[0] + jnp.sum(cf[0]), out[1] + jnp.sum(cf[1]))
        return out, 0

    zero_vary = jnp.sum(c[0][:1]) * 0  # varying-consistent scalar zero
    init = (zero_vary,) * (4 if df else 2)
    total, _ = lax.scan(block, init, jnp.arange(n_blocks))
    if df:
        return jnp.stack([total[0], total[1]]), jnp.stack([total[2], total[3]])
    return total[0], total[1]


_HASH3_MULT = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D)
_HASH3_INIT = (0x811C9DC5, 0xDEADBEEF, 0x1B873593)


def _row_hashes3(s):
    """Three independent 32-bit mixes of each state row (zero Z plane)."""
    B, W = s.shape
    out = []
    for mult, init in zip(_HASH3_MULT, _HASH3_INIT):
        h = jnp.full((B,), init, dtype=jnp.uint32)

        def body(w, h, mult=mult):
            word = jnp.where(w < W, s[:, w % W], jnp.zeros((), jnp.uint32))
            h = (h ^ word) * jnp.uint32(mult)
            return h ^ (h >> 15)

        out.append(lax.fori_loop(0, 2 * W, body, h))
    return tuple(out)


def _target_hash_step(w, hashes, x, s):
    """One word of the incremental (T, B) target-row hashes.

    Target rows are (s_b ^ x_t | zeros); for w >= W the word is zero, matching
    _row_hashes3 on the state side.
    """
    W = x.shape[1]
    word = jnp.where(
        w < W,
        s[None, :, w % W] ^ x[:, w % W, None],
        jnp.zeros((), jnp.uint32),
    )
    out = []
    for h, mult in zip(hashes, _HASH3_MULT):
        h = (h ^ word) * jnp.uint32(mult)
        out.append(h ^ (h >> 15))
    return tuple(out)
