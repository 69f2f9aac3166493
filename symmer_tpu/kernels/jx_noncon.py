"""Device kernels for the noncontextual brute-force ground-state search.

The classical objective (symmer noncontextual_op.py:533-554) is

    E(nu) = s0(nu) + AC_ev * || s_i(nu) ||_2
    s0    = mS0 . (base * (-1)^{F nu^-}),   s_i = mCi . (...)

and the brute-force solver minimises it over all 2^|free| assignments
(reference streams the nu-matrix through a process pool,
noncontextual_op.py:686-738).  Here the assignments are never materialised on
the host: each device enumerates its slice of the index space from an iota,
contracts a chunk at a time on the MXU, and carries a running (min, argmin)
through a ``lax.fori_loop``.  With a mesh, the index space is split across
devices under ``shard_map`` and the final (min, argmin) is combined with a
single ``pmin`` pair -- the multi-chip fan-out identified in SURVEY §2.3.

Enumeration order matches the host path (``itertools.product([-1, 1],
repeat=free)``): bit ``j`` of index ``k`` (counting from the MSB of the
``free``-bit window) gives grid value ``(k >> (free-1-j)) & 1`` and
``nu_j = 2*grid - 1``, so ``neg_j = 1 - grid``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def _fdt():
    import jax

    return np.float64 if jax.config.jax_enable_x64 else np.float32


def _chunk_min(start, F, fixed_par, base, mS0, mCi, n_free, chunk, search_size):
    """(min energy, argmin index) over indices [start, start + chunk)."""
    import jax.numpy as jnp
    from jax import lax

    fdt = F.dtype
    k = start + lax.iota(jnp.uint32, chunk)
    shifts = (n_free - 1 - lax.iota(jnp.uint32, n_free).astype(jnp.int32)).astype(
        jnp.uint32
    )
    grid = (k[:, None] >> shifts[None, :]) & jnp.uint32(1)
    neg = (1 - grid.astype(jnp.int32)).astype(fdt)          # (chunk, free)
    # HIGHEST matmul precision: on TPU the default bf16 multiply truncates the
    # coefficient mantissas (and would blur energies at ~1e-2 relative); the
    # 0/1 parity contraction happens to be bf16-exact but the signed
    # contractions are not
    hi = dict(precision=lax.Precision.HIGHEST)
    parity = jnp.mod(jnp.matmul(neg, F.T, **hi) + fixed_par[None, :], 2.0)
    signed = (1.0 - 2.0 * parity) * base[None, :]           # (chunk, M)
    s0 = jnp.matmul(signed, mS0, **hi)
    if mCi.shape[0]:
        si = jnp.matmul(signed, mCi.T, **hi)                # (chunk, n_cliques)
        E = s0 - jnp.sqrt(jnp.sum(si * si, axis=1))
    else:
        E = s0
    E = jnp.where(k < search_size, E, jnp.inf)
    j = jnp.argmin(E)
    return E[j], k[j]


def _fold_min(e1, k1, e2, k2):
    """Combine two (min, argmin) pairs; ties resolve to the smaller index
    (matching the host np.argmin first-minimum convention, since enumeration
    order equals index order)."""
    import jax.numpy as jnp

    better = (e2 < e1) | ((e2 == e1) & (k2 < k1))
    return jnp.where(better, e2, e1), jnp.where(better, k2, k1)


def _scan_slice(offset, stride, n_steps, chunk, F, fixed_par, base, mS0, mCi,
                n_free, search_size, axis_name=None):
    """Running (min, argmin) over n_steps chunks starting at ``offset``,
    advancing by ``stride`` per step (stride = chunk * n_devices so the
    devices interleave superchunks)."""
    import jax.numpy as jnp
    from jax import lax

    fdt = F.dtype

    def body(i, carry):
        e_best, k_best = carry
        start = offset + i.astype(jnp.uint32) * jnp.uint32(stride)
        e, kk = _chunk_min(
            start, F, fixed_par, base, mS0, mCi, n_free, chunk, search_size
        )
        return _fold_min(e_best, k_best, e, kk)

    init = (jnp.asarray(jnp.inf, fdt), jnp.asarray(0, jnp.uint32))
    if axis_name is not None:
        # under shard_map the body output varies over the mesh axis (it
        # depends on the device's offset); the init carry must match
        init = tuple(lax.pvary(v, (axis_name,)) for v in init)
    return lax.fori_loop(0, n_steps, body, init)


def brute_force_minimise(
    F_free: np.ndarray,
    fixed_parity: np.ndarray,
    base: np.ndarray,
    mS0: np.ndarray,
    mCi: np.ndarray,
    n_free: int,
    mesh=None,
    axis_name: Optional[str] = None,
    chunk: Optional[int] = None,
) -> Tuple[float, int]:
    """Minimise E over all 2**n_free assignments on device; returns
    (best energy, best enumeration index).

    Args:
        F_free: {0,1}[M, n_free] -- (G_indices == 1) restricted to free columns.
        fixed_parity: {0,1}[M] -- parity contribution of the fixed assignments.
        base: float[M] -- Re(coeff * pauli_mult_signs).
        mS0: float[M] symmetry-only mask; mCi: float[n_cliques, M] clique masks.
        n_free: number of free nu entries (1..31).
        mesh: optional 1-D jax Mesh; the index space is split across it.
        chunk: assignments contracted per step per device.  Default: sized so
            the (chunk, M) intermediates stay at ~64 MB f32 -- host memory is
            flat in the search size either way.
    """
    import jax
    import jax.numpy as jnp

    assert 1 <= n_free <= 31, f"free assignment count {n_free} not in [1, 31]"
    fdt = _fdt()
    search_size = 1 << n_free
    M = len(base)
    if chunk is None:
        chunk = max(1 << 10, min(1 << 14, (1 << 24) // max(M, 1)))
    chunk = min(chunk, 1 << max(3, n_free))

    F = jnp.asarray(np.asarray(F_free, fdt))
    fp = jnp.asarray(np.asarray(fixed_parity, fdt))
    b = jnp.asarray(np.asarray(base, fdt))
    m0 = jnp.asarray(np.asarray(mS0, fdt))
    mc = jnp.asarray(np.asarray(mCi, fdt).reshape(-1, len(base)))

    n_dev = 1 if mesh is None else int(mesh.devices.size)
    n_steps = max(1, -(-search_size // (chunk * n_dev)))

    if mesh is None or n_dev == 1:
        fn = jax.jit(
            partial(
                _scan_slice,
                np.uint32(0), chunk, n_steps, chunk,
                n_free=n_free, search_size=search_size,
            )
        )
        e, k = fn(F, fp, b, m0, mc)
        return float(e), int(k)

    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis_name is None:
        axis_name = mesh.axis_names[0]  # shard over the mesh's leading axis

    def per_device(F, fp, b, m0, mc):
        rank = lax.axis_index(axis_name)
        offset = rank.astype(jnp.uint32) * jnp.uint32(chunk)
        e, k = _scan_slice(
            offset, chunk * n_dev, n_steps, chunk, F, fp, b, m0, mc,
            n_free=n_free, search_size=search_size, axis_name=axis_name,
        )
        # global (min, argmin): pmin the energy, then pmin the index of the
        # devices attaining it (ties -> smallest index, as on the host)
        ge = lax.pmin(e, axis_name)
        gk = lax.pmin(jnp.where(e == ge, k, jnp.uint32(0xFFFFFFFF)), axis_name)
        return ge[None], gk[None]

    fn = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(axis_name), P(axis_name)),
        )
    )
    repl = NamedSharding(mesh, P())
    args = [jax.device_put(a, repl) for a in (F, fp, b, m0, mc)]
    e, k = fn(*args)
    return float(np.asarray(e)[0]), int(np.asarray(k)[0])


def nu_from_index(index: int, n_free: int) -> np.ndarray:
    """Free-entry nu vector for an enumeration index (host-side, tiny)."""
    grid = (index >> np.arange(n_free - 1, -1, -1)) & 1
    return 2 * grid - 1
