"""Distributed term-deduplication over a device mesh.

The single-chip ``jx_core.cleanup_sorted`` is a sort + segment-sum over the
whole term axis; under ``pjit`` with a sharded term axis XLA realises it by
all-gathering the planes onto every device.  That caps the operator size at
one chip's HBM.  This module implements a *distributed* cleanup in which the
term axis never gathers:

1. Each device hashes its local rows (same multiply-xor mix as
   ``jx_core.row_hashes``).
2. ``log2(N)`` rounds of pairwise hash-routed exchange: in round ``k`` each
   device keeps the rows whose hash bit ``k`` matches bit ``k`` of its own
   mesh coordinate and ships the rest to the partner ``rank ^ (1 << k)`` via
   ``lax.ppermute`` (a single-hop ICI transfer).  After all rounds, every
   row sits on the device addressed by the low ``log2(N)`` bits of its hash,
   so all duplicates of a term are co-resident.
3. A purely local ``cleanup_sorted`` per shard merges them.

All shapes are static: each shard carries a fixed-capacity buffer
(``capacity = 2 * T_local`` by default) plus a validity count.  Duplicate
terms are merged locally before every routing round, so duplication skew can
never overflow a capacity-2 buffer; only more *distinct* terms than capacity
hashing to one shard can, which is vanishingly unlikely for a balanced hash
and is *detected* (per-shard ``overflow`` flag returned) rather than
silently dropped -- callers fall back to the gathered path.

This replaces the reference's scatter-gather multiprocessing model
(symmer ``utils/operator_utils.py`` cleanup + ``process_handler.py:25-91``)
with an ICI-native exchange; there is no reference counterpart to cite for
the algorithm itself.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import jx_core

UINT = jnp.uint32


def _compact(mask, *arrays):
    """Stable-compact rows where mask is True to the front; zero the rest.

    Returns (count, compacted arrays)."""
    T = mask.shape[0]
    dest = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, dest, T)  # dropped rows scatter out of range
    n = jnp.sum(mask.astype(jnp.int32))
    outs = []
    for a in arrays:
        pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
        buf = jnp.concatenate([jnp.zeros_like(a), pad], axis=0)
        if a.ndim == 1:
            buf = buf.at[dest].set(jnp.where(mask, a, 0))
        else:
            buf = buf.at[dest].set(jnp.where(mask[:, None], a, 0))
        outs.append(buf[:T])
    return n, outs


def _exchange_round(k: int, state, axis_name):
    """One round of pairwise hash-bit routing (k is a static round index).

    Rows are locally merged (duplicate terms summed) before routing, so at
    any moment a shard holds at most one copy of a term plus at most one
    incoming copy -- duplication skew can therefore never overflow a
    capacity-2 buffer; only >capacity *distinct* terms hashing to one shard
    can (vanishingly unlikely for a balanced hash).
    """
    x, z, cr, ci, n_local = state
    x, z, cr, ci, n_local = jx_core.cleanup_sorted(x, z, cr, ci, n_local, None)
    # the hash plane is recomputed here each round (cleanup_sorted reorders
    # the rows anyway), so it is NOT shipped with the payload -- routing it
    # would cost 4 bytes/row of ICI plus a compact+scatter for data nothing
    # downstream consumes
    h, _ = jx_core.row_hashes(x, z)
    C = x.shape[0]
    rank = lax.axis_index(axis_name)
    idx = jnp.arange(C)
    valid = idx < n_local
    bit = (h >> UINT(k)) & UINT(1)
    my_bit = (rank.astype(UINT) >> UINT(k)) & UINT(1)
    keep = valid & (bit == my_bit)
    send = valid & (bit != my_bit)

    n_keep, (xk, zk) = _compact(keep, x, z)
    _, (crk, cik) = _compact(keep, cr, ci)
    n_send, (xs, zs) = _compact(send, x, z)
    _, (crs, cis) = _compact(send, cr, ci)

    # pairwise swap with the partner: permutation is an involution, one hop
    n_dev = lax.axis_size(axis_name)
    perm = [(r, r ^ (1 << k)) for r in range(n_dev)]
    xr, zr, crr, cir, n_recv = [
        lax.ppermute(a, axis_name, perm) for a in (xs, zs, crs, cis, n_send)
    ]

    # append received rows at offset n_keep
    dest = jnp.where(jnp.arange(C) < n_recv, jnp.arange(C) + n_keep, C)
    ovf = n_keep + n_recv > C

    def _append(kept, recv):
        pad = jnp.zeros((1,) + kept.shape[1:], kept.dtype)
        return jnp.concatenate([kept, pad], axis=0).at[dest].set(recv)[:C]

    x_new = _append(xk, xr)
    z_new = _append(zk, zr)
    cr_new = _append(crk, crr)  # coefficient planes may carry a [hi, lo] axis
    ci_new = _append(cik, cir)
    n_new = jnp.minimum(n_keep + n_recv, C)
    return x_new, z_new, cr_new, ci_new, n_new, ovf


def exchange_merge(x, z, cr, ci, n_local, n_rounds, zero_threshold, axis_name,
                   rel_floor=None):
    """Hash-route rows to their home shard, then merge locally.

    Runs INSIDE shard_map on per-shard buffers; reusable as the tail of any
    distributed term-producing kernel (cleanup, multiply, rotation).  Returns
    (x, z, cr, ci, n_out, overflow) with scalar n_out/overflow per shard.

    ``rel_floor`` mirrors ``jx_core.effective_threshold`` under sharding:
    the floor tracks the CURRENT global max|c| (one pmax) instead of a
    value frozen on the host from the input coefficients — needed wherever
    the kernel changed the coefficients before this merge (non-Clifford
    rotations, the stabilizer-filtered projection).  Relies on the
    invariant that invalid buffer rows carry zero coefficients.
    """
    ovf_any = jnp.zeros((), bool)
    state = (x, z, cr, ci, n_local)
    for k in range(n_rounds):
        *state, ovf = _exchange_round(k, tuple(state), axis_name)
        ovf_any = ovf_any | ovf
    x, z, cr, ci, n_local = state
    if zero_threshold is not None and rel_floor is not None:
        c, dfm = jx_core.c_lanes(cr, ci)
        m2 = lax.pmax(jnp.max(jx_core.c_mag2_hi(c, dfm)), axis_name)
        zero_threshold = jnp.maximum(
            zero_threshold, rel_floor * jnp.sqrt(m2)
        )
    x, z, cr, ci, n_out = jx_core.cleanup_sorted(
        x, z, cr, ci, n_local, zero_threshold
    )
    return x, z, cr, ci, n_out, ovf_any


def _coef_spec(df: bool, axis_name: str):
    """PartitionSpec for a coefficient plane: (T,) plain or (T, 2) double-float."""
    return P(axis_name, None) if df else P(axis_name)


def _local_shard_cleanup(x, z, cr, ci, n_local, zt, fl, n_rounds,
                         has_threshold, axis_name):
    """Body run per shard under shard_map."""
    n_local = n_local[0]  # per-shard view of int32[n_dev] is shape (1,)
    x, z, cr, ci, n_out, ovf_any = exchange_merge(
        x, z, cr, ci, n_local, n_rounds,
        zt if has_threshold else None, axis_name,
        rel_floor=fl if has_threshold else None,
    )
    return x, z, cr, ci, n_out[None], ovf_any[None]


def distributed_cleanup(
    x,
    z,
    cr,
    ci,
    n_valid_per_shard,
    mesh: Mesh,
    zero_threshold: Optional[float] = None,
    capacity_factor: int = 2,
    axis_name: str = "terms",
    rel_floor: float = 0.0,
) -> Tuple[jnp.ndarray, ...]:
    """Deduplicate a term-sharded operator without gathering the term axis.

    Args:
        x, z: uint32[T, W] planes, shard-able along axis 0 over ``mesh``
            (T must be divisible by mesh size).
        cr, ci: float[T] coefficient planes, sharded identically.
        n_valid_per_shard: int32[n_devices] — valid row count of each shard
            (rows beyond the count are ignored).
        mesh: 1-D device mesh; its size must be a power of two.
        zero_threshold: optional |coeff| cut applied in the final local merge.
        capacity_factor: per-shard buffer slack for routing imbalance.

    Returns:
        (x, z, cr, ci, n_out_per_shard, overflow_per_shard) with the same
        sharding; shard d holds exactly the unique terms whose hash low bits
        equal d, compacted to its front.  ``overflow_per_shard[d]`` flags a
        (statistically negligible) routing overflow — results are then
        incomplete and the caller should fall back to the gathered cleanup.
    """
    n_dev = mesh.devices.size
    if n_dev & (n_dev - 1):
        raise ValueError(f"mesh size must be a power of two, got {n_dev}")
    n_rounds = n_dev.bit_length() - 1
    T, W = x.shape
    if T % n_dev:
        raise ValueError(f"term axis {T} not divisible by mesh size {n_dev}")
    T_local = T // n_dev

    # pad each shard's buffer to capacity_factor * T_local.  Host numpy
    # inputs are padded ON THE HOST: an eager jnp.concatenate would stage
    # the full padded operator on the default device before device_put
    # shards it, capping the operator at ONE chip's HBM — the exact limit
    # this module exists to remove
    C = capacity_factor * T_local
    if capacity_factor > 1:
        def _pad_interleave(a):
            lib = np if isinstance(a, np.ndarray) else jnp
            tail = a.shape[1:]
            return lib.concatenate(
                [a.reshape((n_dev, T_local) + tail),
                 lib.zeros((n_dev, C - T_local) + tail, a.dtype)], axis=1
            ).reshape((n_dev * C,) + tail)

        x, z = _pad_interleave(x), _pad_interleave(z)
        cr, ci = _pad_interleave(cr), _pad_interleave(ci)

    has_threshold = zero_threshold is not None
    df = hasattr(cr, "ndim") and cr.ndim == 2
    zt = jnp.asarray(zero_threshold if has_threshold else 0.0, jnp.asarray(cr).dtype)
    fl = jnp.asarray(rel_floor, jnp.asarray(cr).dtype)

    fn = _cleanup_jit(mesh, axis_name, n_rounds, has_threshold, df)
    sh_rows = NamedSharding(mesh, P(axis_name, None))
    sh_vec = NamedSharding(mesh, _coef_spec(df, axis_name))
    x = jax.device_put(x, NamedSharding(mesh, P(axis_name, None)))
    z = jax.device_put(z, NamedSharding(mesh, P(axis_name, None)))
    cr = jax.device_put(cr, sh_vec)
    ci = jax.device_put(ci, sh_vec)
    n_valid_per_shard = jax.device_put(
        jnp.asarray(n_valid_per_shard, jnp.int32),
        NamedSharding(mesh, P(axis_name)),
    )
    return fn(x, z, cr, ci, n_valid_per_shard, zt, fl)


def _local_multiply(x1, z1, cr1, ci1, x2, z2, cr2, ci2, zt, n_rounds, axis_name):
    """Per-shard body: fused local all-pairs product+cleanup (the product
    planes never reach HBM, jx_core.mul_pairs_cleanup), then hash-routed
    exchange so duplicates created *across* shards merge too.

    The LOCAL cleanup runs without a threshold: a term's coefficient can be
    split across shards, and dropping sub-threshold partial sums before the
    cross-shard merge would change the total.  The threshold applies once,
    in the post-exchange merge, where every duplicate is co-resident --
    exactly the single-device semantics."""
    x, z, cr, ci, n = jx_core.mul_pairs_cleanup(
        x1, z1, cr1, ci1, x2, z2, cr2, ci2, None
    )
    x, z, cr, ci, n_out, ovf = exchange_merge(
        x, z, cr, ci, n, n_rounds, zt, axis_name
    )
    return x, z, cr, ci, n_out[None], ovf[None]


@lru_cache(maxsize=None)
def _multiply_jit(mesh: Mesh, axis_name: str, n_rounds: int, df: bool = False):
    spec_rows = P(axis_name, None)
    spec_vec = P(axis_name)
    spec_c = _coef_spec(df, axis_name)
    return jax.jit(
        jax.shard_map(
            partial(_local_multiply, n_rounds=n_rounds, axis_name=axis_name),
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_c, spec_c,
                      P(), P(), P(), P(), P()),
            out_specs=(spec_rows, spec_rows, spec_c, spec_c,
                       spec_vec, spec_vec),
        )
    )


def distributed_multiply_cleanup(
    x1, z1, cr1, ci1, x2, z2, cr2, ci2, mesh: Mesh,
    zero_threshold, axis_name: str = "terms",
):
    """(op1 * op2).cleanup() with op1's term axis sharded over the mesh.

    op2 is replicated (the smaller operand by the reference's
    smaller-operand-left convention, symmer base.py:846-852); each shard owns
    a (T1_local x T2) slab of the product.  The term axis never gathers:
    local fused product+cleanup, then the hash-routed ppermute exchange.

    Args are device/numpy arrays; x1's row count must divide by the mesh size
    (callers pad with zero-coefficient rows -- their products vanish under
    the threshold).  ``zero_threshold`` is required on this path.

    Returns (x, z, cr, ci, n_out_per_shard, overflow_per_shard), sharded.
    """
    assert zero_threshold is not None, "sharded multiply requires a threshold"
    n_dev = mesh.devices.size
    if n_dev & (n_dev - 1):
        raise ValueError(f"mesh size must be a power of two, got {n_dev}")
    n_rounds = n_dev.bit_length() - 1
    T1 = x1.shape[0]
    if T1 % n_dev:
        raise ValueError(f"term axis {T1} not divisible by mesh size {n_dev}")
    df = hasattr(cr1, "ndim") and jnp.asarray(cr1).ndim == 2
    fn = _multiply_jit(mesh, axis_name, n_rounds, df)
    sh_rows = NamedSharding(mesh, P(axis_name, None))
    sh_c = NamedSharding(mesh, _coef_spec(df, axis_name))
    repl = NamedSharding(mesh, P())
    zt = jnp.asarray(zero_threshold, jnp.asarray(cr1).dtype)
    return fn(
        jax.device_put(x1, sh_rows), jax.device_put(z1, sh_rows),
        jax.device_put(cr1, sh_c), jax.device_put(ci1, sh_c),
        jax.device_put(x2, repl), jax.device_put(z2, repl),
        jax.device_put(cr2, repl), jax.device_put(ci2, repl),
        zt,
    )


def _local_rotate_nc(x, z, cr, ci, n_local, xr, zr, tc, ts, zt, fl,
                     n_rounds, axis_name):
    """Per-shard body: fused non-Clifford rotation+cleanup (buffer doubles to
    2C), hash-routed exchange+merge at 2C, then compact back into the C-row
    buffer (overflow-flagged) so the sequence keeps a constant shape.

    As in _local_multiply, the local cleanup is threshold-free; the threshold
    applies only after the exchange has co-located every duplicate.  cos/sin
    arrive precomputed (double-float pairs in extended mode).  The relative
    floor ``fl`` tracks the post-rotation coefficients (exchange_merge pmax),
    matching the per-rotation recomputation of the single-device path."""
    n_local = n_local[0]
    C = x.shape[0]
    xo, zo, cro, cio, n = jx_core.rotate_nonclifford_cleanup(
        x, z, cr, ci, xr, zr, None, n_local, None, trig=(tc, ts)
    )
    xo, zo, cro, cio, n_out, ovf = exchange_merge(
        xo, zo, cro, cio, n, n_rounds, zt, axis_name, rel_floor=fl
    )
    ovf = ovf | (n_out > C)
    return (
        xo[:C], zo[:C], cro[:C], cio[:C],
        jnp.minimum(n_out, C)[None], ovf[None],
    )


@lru_cache(maxsize=None)
def _rotate_nc_jit(mesh: Mesh, axis_name: str, n_rounds: int, df: bool = False):
    spec_rows = P(axis_name, None)
    spec_vec = P(axis_name)
    spec_c = _coef_spec(df, axis_name)
    return jax.jit(
        jax.shard_map(
            partial(_local_rotate_nc, n_rounds=n_rounds, axis_name=axis_name),
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_c, spec_c, spec_vec,
                      P(), P(), P(), P(), P(), P()),
            out_specs=(spec_rows, spec_rows, spec_c, spec_c,
                       spec_vec, spec_vec),
        )
    )


def _local_clifford_project(x, z, cr, ci, n_local, rx, rz, rm,
                            stab_x, stab_z, neg_x, neg_z, col_keep, zt, fl,
                            n_rounds, axis_name):
    """Per-shard body of the distributed fused projection: Clifford scan +
    stabilizer filter + eigenvalue sign flips + column masking + local merge
    (threshold-free -- a term's coefficient can be split across shards), then
    the hash-routed exchange applies the threshold once every duplicate is
    co-resident.  One scatter in, one gather out for the whole flagship
    projection (reference projection/base.py:44-124 runs these as separate
    host passes)."""
    n_local = n_local[0]
    xo, zo, cro, cio, n = jx_core.clifford_project_cleanup(
        x, z, cr, ci, n_local, rx, rz, rm,
        stab_x, stab_z, neg_x, neg_z, col_keep, None,
    )
    # fl tracks the POST-filter coefficients (the largest-|c| term may have
    # been projected out), matching the single-device fused path
    xo, zo, cro, cio, n_out, ovf = exchange_merge(
        xo, zo, cro, cio, n, n_rounds, zt, axis_name, rel_floor=fl
    )
    return xo, zo, cro, cio, n_out[None], ovf[None]


@lru_cache(maxsize=None)
def _clifford_project_jit(mesh: Mesh, axis_name: str, n_rounds: int,
                          df: bool = False):
    spec_rows = P(axis_name, None)
    spec_vec = P(axis_name)
    spec_c = _coef_spec(df, axis_name)
    return jax.jit(
        jax.shard_map(
            partial(_local_clifford_project, n_rounds=n_rounds,
                    axis_name=axis_name),
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_c, spec_c, spec_vec,
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(spec_rows, spec_rows, spec_c, spec_c,
                       spec_vec, spec_vec),
        )
    )


def distributed_clifford_project(
    x, z, cr, ci, n_valid_per_shard,
    rx, rz, rm, stab_x, stab_z, neg_x, neg_z, col_keep,
    mesh: Mesh, zero_threshold, rel_floor: float = 0.0,
    axis_name: str = "terms",
):
    """Fused stabilizer-subspace projection with the term axis sharded.

    Same argument semantics as jx_core.clifford_project_cleanup, with the
    operator planes sharded over ``mesh`` (x row count divisible by the mesh
    size; per-shard routing slack padded BY THE CALLER — there is no
    capacity parameter here).  ``rel_floor`` applies the f32 threshold
    floor against the post-filter coefficients (one pmax).  Returns the
    usual sharded sextet incl. overflow flags.
    """
    n_dev = mesh.devices.size
    if n_dev & (n_dev - 1):
        raise ValueError(f"mesh size must be a power of two, got {n_dev}")
    n_rounds = n_dev.bit_length() - 1
    T = x.shape[0]
    if T % n_dev:
        raise ValueError(f"term axis {T} not divisible by mesh size {n_dev}")
    df = hasattr(cr, "ndim") and jnp.asarray(cr).ndim == 2
    fn = _clifford_project_jit(mesh, axis_name, n_rounds, df)
    sh_rows = NamedSharding(mesh, P(axis_name, None))
    sh_c = NamedSharding(mesh, _coef_spec(df, axis_name))
    sh_vec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    zt = jnp.asarray(zero_threshold, jnp.asarray(cr).dtype)
    fl = jnp.asarray(rel_floor, jnp.asarray(cr).dtype)
    return fn(
        jax.device_put(x, sh_rows), jax.device_put(z, sh_rows),
        jax.device_put(cr, sh_c), jax.device_put(ci, sh_c),
        jax.device_put(jnp.asarray(n_valid_per_shard, jnp.int32), sh_vec),
        jax.device_put(rx, repl), jax.device_put(rz, repl),
        jax.device_put(rm, repl),
        jax.device_put(stab_x, repl), jax.device_put(stab_z, repl),
        jax.device_put(neg_x, repl), jax.device_put(neg_z, repl),
        jax.device_put(col_keep, repl), jax.device_put(zt, repl),
        jax.device_put(fl, repl),
    )


def _local_clifford(x, z, cr, ci, rx, rz, rm):
    """Per-shard Clifford scan: purely term-parallel, no exchange needed
    (a Clifford rotation is a bijection on terms -- a duplicate-free sharded
    operator stays duplicate-free, and invalid zero rows are identities)."""
    return jx_core.clifford_scan(x, z, cr, ci, rx, rz, rm)


@lru_cache(maxsize=None)
def _clifford_jit(mesh: Mesh, axis_name: str, df: bool = False):
    spec_rows = P(axis_name, None)
    spec_c = _coef_spec(df, axis_name)
    return jax.jit(
        jax.shard_map(
            _local_clifford,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_c, spec_c, P(), P(), P()),
            out_specs=(spec_rows, spec_rows, spec_c, spec_c),
        )
    )


@lru_cache(maxsize=None)
def _cleanup_jit(mesh: Mesh, axis_name: str, n_rounds: int, has_threshold: bool,
                 df: bool = False):
    """Cached jitted shard_map for the distributed cleanup (re-building the
    wrapper per call would defeat jax.jit's trace cache)."""
    spec_rows = P(axis_name, None)
    spec_vec = P(axis_name)
    spec_c = _coef_spec(df, axis_name)
    return jax.jit(
        jax.shard_map(
            partial(
                _local_shard_cleanup,
                n_rounds=n_rounds,
                has_threshold=has_threshold,
                axis_name=axis_name,
            ),
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_c, spec_c, spec_vec,
                      P(), P()),
            out_specs=(spec_rows, spec_rows, spec_c, spec_c, spec_vec, spec_vec),
        )
    )
