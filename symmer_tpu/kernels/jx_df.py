"""Double-float ("double-word") arithmetic for TPU coefficient planes.

TPU has no native float64 (XLA rewrites 64-bit element types to 32-bit
pairs), yet BASELINE.md demands 1e-10 energy parity ON the chip.  The
TPU-native answer is error-free transformations: every coefficient is carried
as an unevaluated sum hi + lo of two float32s (~49 effective mantissa bits,
unit roundoff ~2^-48 ≈ 3.6e-15), and the kernels use the classical
TwoSum / Veltkamp-split / TwoProd algorithms (Dekker 1971, Knuth TAOCP v2) so
no information is lost to cancellation.  All operations are branch-free
elementwise float ops -- pure VPU work, ~4x the flops of plain f32 on kernels
that are HBM-bandwidth-bound anyway.

Layout convention at the kernel boundary: a double-float plane has a trailing
axis of length 2, ``a[..., 0] = hi``, ``a[..., 1] = lo``; plain planes are
1-D.  Kernels switch on ``ndim`` at trace time (static shapes), so the same
jitted entry points serve both precisions.

The error-free property requires IEEE-faithful f32 add/sub/mul, which the TPU
VPU provides; XLA's default algebraic simplifier does not reassociate floats,
so the transformations survive compilation (validated on hardware by
``bench.py --check`` at 1e-12 tolerance).

Backend caveat: XLA:CPU's LLVM codegen may CONTRACT multiply-add chains into
FMAs inside fused loops when scalar/broadcast operands are involved, which
degrades df_mul's renormalisation to plain-f32 accuracy (~1e-7) in some
graphs -- observed in the dense VQE engine's evolve step on the CPU-f32 test
configuration; never observed on TPU (bench --check: 1e-13..1e-15), and the
CPU-with-x64 path uses native f64 and is unaffected.  The split uses integer
mantissa masking rather than the arithmetic Veltkamp form specifically to
shrink this attack surface (two_prod is bit-exact on every backend tested).

Reference bar: f64 coefficient semantics of symmer ``operators/base.py:64-74``.
"""
from __future__ import annotations

import jax.numpy as jnp


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth-Moller, 6 flops, no branch)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Truncation split via mantissa masking: a = hi + lo EXACTLY, with both
    halves narrow enough that their pairwise products are exact in the
    working precision (f32: 12+12 significant bits; f64: 26+27).

    Deliberately NOT the arithmetic Veltkamp split (c = a*(2^s+1);
    hi = c - (c - a)): backend compilers may contract the multiply-subtract
    chains into FMAs inside fused loops, which silently destroys the
    error-free property (observed on XLA:CPU with scalar/broadcast operands;
    f32 coefficient noise where 1e-14 was expected).  Integer masking is
    opaque to floating-point rewrites."""
    from jax import lax

    if jnp.dtype(a.dtype).itemsize == 4:
        bits = lax.bitcast_convert_type(a, jnp.uint32)
        hi = lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFF000), a.dtype)
    else:
        bits = lax.bitcast_convert_type(a, jnp.uint64)
        hi = lax.bitcast_convert_type(
            bits & jnp.uint64(0xFFFFFFFFF8000000), a.dtype
        )
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e via Dekker splitting (no FMA required)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(ah, al, bh, bl):
    """(ah+al) + (bh+bl) -> renormalised (h, l).

    Accurate variant (Joldes-Muller-Popescu AccurateDWPlusDW, 20 flops):
    relative error <= 3u^2 EVEN under catastrophic cancellation -- the sloppy
    11-flop variant loses the low-order sum bits and degrades to ~u^2 |a|+|b|
    absolute, which breaks the cleanup's cancellation detection."""
    sh, se = two_sum(ah, bh)
    th, te = two_sum(al, bl)
    c = se + th
    vh, vl = fast_two_sum(sh, c)
    w = te + vl
    return fast_two_sum(vh, w)


def df_neg(ah, al):
    return -ah, -al


def df_sub(ah, al, bh, bl):
    return df_add(ah, al, -bh, -bl)


def df_mul(ah, al, bh, bl):
    """(ah+al) * (bh+bl) -> renormalised (h, l)."""
    ph, pe = two_prod(ah, bh)
    pe = pe + (ah * bl + al * bh)
    if _needs_contraction_guard():
        # XLA:CPU's LLVM codegen may contract the renormalising add
        # s = ph + pe with ph's producing multiply into an FMA
        # (fast_two_sum's correction then measures against the wrong sum);
        # the barrier materialises ph first.  TPU codegen never contracts
        # (bit-exact in testing) and the barrier only splits fusions there.
        from jax import lax

        ph = lax.optimization_barrier(ph)
    return fast_two_sum(ph, pe)


def _needs_contraction_guard() -> bool:
    import jax

    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def df_div(ah, al, bh, bl):
    """(ah+al) / (bh+bl) -> renormalised (h, l), ~full double-word accuracy.

    Long-division form: one working-precision quotient digit, an error-free
    residual via two_prod, then a correction digit (Joldes-Muller-Popescu
    DWDivDW2, relative error ~ 15u^2).  b == 0 yields inf/nan as IEEE does.
    """
    q1 = ah / bh
    th, tl = two_prod(q1, bh)
    rh, rl = df_add(ah, al, -th, -tl)
    rh, rl = df_add(rh, rl, -(q1 * bl), jnp.zeros_like(bl))
    q2 = rh / bh
    return fast_two_sum(q1, q2)


def df_sqrt(ah, al):
    """sqrt(ah+al) -> renormalised (h, l) via one Karp-Markstein-style
    Newton correction on the working-precision root.  Exact at 0; negative
    inputs produce nan as IEEE sqrt does."""
    s1 = jnp.sqrt(ah)
    th, tl = two_prod(s1, s1)
    rh, _ = df_add(ah, al, -th, -tl)
    s2 = jnp.where(s1 > 0, rh / (s1 + s1), jnp.zeros_like(s1))
    return fast_two_sum(s1, s2)


def df_sum(lanes_h, lanes_l):
    """Accurate reduction of a df array (flattened): pairwise tree of df adds.

    jnp.sum on the hi lane alone accumulates O(n eps32) error; the tree keeps
    the compensated representation at every level (log2(n) rounds).
    """
    h, l = lanes_h.reshape(-1), lanes_l.reshape(-1)
    n = h.shape[0]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            h = jnp.concatenate([h, jnp.zeros(pad, h.dtype)])
            l = jnp.concatenate([l, jnp.zeros(pad, l.dtype)])
        h, l = df_add(h[:half], l[:half], h[half:], l[half:])
        n = half
    return h[0], l[0]


# ---------------------------------------------------------------------------
# host-side conversions (numpy)
# ---------------------------------------------------------------------------

def host_split_f64(x):
    """float64 host array -> (hi, lo) float32 pair representing it exactly
    to ~2^-48 relative (numpy)."""
    import numpy as np

    hi = np.asarray(x, np.float64).astype(np.float32)
    lo = (np.asarray(x, np.float64) - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def host_merge_f64(hi, lo):
    import numpy as np

    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def host_split_complex(c):
    """complex host array -> ((..., 2) [hi, lo] re plane, (..., 2) im plane).

    THE defining conversion for the (T, 2) double-float layout that kernels
    detect by shape (jx_core.c_lanes) -- every boundary (dispatch, sharded
    drivers, dense VQE engine) must go through here so the lane convention
    has exactly one implementation.
    """
    import numpy as np

    rh, rl = host_split_f64(np.ascontiguousarray(c.real, np.float64))
    ih, il = host_split_f64(np.ascontiguousarray(c.imag, np.float64))
    return np.stack([rh, rl], axis=-1), np.stack([ih, il], axis=-1)
