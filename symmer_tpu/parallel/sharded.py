"""Host-boundary drivers for mesh-sharded operator kernels.

These are what ``kernels.dispatch`` routes through when ``config.mesh`` is set
(``symmer_tpu.use_mesh``): host uint64 planes + complex coefficients in, the
same out, with the term axis sharded over the mesh in between and never
gathered on device (parallel/distributed.py).  Overflow of the hash-routing
buffers is detected, retried at doubled capacity, and finally falls back to
the single-device gathered path by returning ``None`` -- the caller keeps the
usual semantics either way.

This is the layer that turns the distributed kernels from a demo into the
product: the reference wires its process pool into the same operator call
sites (symmer process_handler.py:100-115 used at base.py:811,
noncontextual_op.py:733); here the call sites are PauliwordOp.cleanup /
__mul__ / perform_rotations via kernels/dispatch.py.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..kernels import pack
from ..kernels.dispatch import (
    _coeff_dtype, _df_mode, _merge_coeff_host, _rel_floor, _trig_split,
    is_clifford_angle,
)
from . import distributed

Planes = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _split_c(c: np.ndarray):
    """complex host coeffs -> (re, im) planes: (T,) plain or (T, 2)
    double-float [hi, lo] in extended mode (jx_df)."""
    dt = _coeff_dtype()
    if _df_mode():
        from ..kernels import jx_df

        return jx_df.host_split_complex(c)
    return (
        np.ascontiguousarray(c.real, dtype=dt),
        np.ascontiguousarray(c.imag, dtype=dt),
    )


def _pad_rows(a: np.ndarray, rows: int):
    if rows <= a.shape[0]:
        return a
    widths = [(0, rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, widths)


def _interleave(a: np.ndarray, n_dev: int, L: int, C: int):
    """(n_dev * L, ...) -> (n_dev * C, ...): each shard's rows padded to C.

    MUST stay layout-identical to the in-device capacity expansion inside
    distributed.distributed_cleanup (shard-local rows first, padding after,
    per shard) -- both sides address shard s at rows [s*C, s*C + n_s)."""
    if C == L:
        return a
    shp = (n_dev, C - L) + a.shape[1:]
    return np.concatenate(
        [a.reshape((n_dev, L) + a.shape[1:]), np.zeros(shp, a.dtype)], axis=1
    ).reshape((n_dev * C,) + a.shape[1:])


def _gather(x32, z32, cr, ci, ns) -> Planes:
    """Collect per-shard valid prefixes into host planes (one batched fetch)."""
    import jax

    x32, z32, cr, ci, ns = jax.device_get((x32, z32, cr, ci, ns))
    x32, z32, cr, ci, ns = (np.asarray(a) for a in (x32, z32, cr, ci, ns))
    n_dev = len(ns)
    C = x32.shape[0] // n_dev
    xs, zs, cs = [], [], []
    for d in range(n_dev):
        n = int(ns[d])
        xs.append(x32[d * C : d * C + n])
        zs.append(z32[d * C : d * C + n])
        cs.append(_merge_coeff_host(cr[d * C : d * C + n], ci[d * C : d * C + n]))
    x64 = pack.from_u32(np.concatenate(xs, axis=0))
    z64 = pack.from_u32(np.concatenate(zs, axis=0))
    c = np.concatenate(cs)
    if len(c) == 0:  # fully cancelled operator: keep one explicit zero row
        x64 = np.zeros((1, x64.shape[1] or 1), np.uint64)
        z64 = np.zeros_like(x64)
        c = np.zeros(1, complex)
    return x64, z64, c


def _usable(mesh) -> bool:
    """The exchange needs a power-of-two mesh of at least 2 devices; anything
    else falls back to the single-device path (returning None upstream)."""
    n = int(mesh.devices.size)
    return n >= 2 and not (n & (n - 1))


def cleanup(x, z, c, zero_threshold, mesh, axis_name: str = "terms") -> Optional[Planes]:
    """Mesh-sharded deduplication of host planes; None -> caller falls back."""
    if not _usable(mesh):
        return None
    n_dev = int(mesh.devices.size)
    T = x.shape[0]
    Tp = -(-T // n_dev) * n_dev
    x32 = pack.to_u32(_pad_rows(x, Tp))
    z32 = pack.to_u32(_pad_rows(z, Tp))
    cr, ci = _split_c(_pad_rows(c, Tp))
    L = Tp // n_dev
    n_local = np.minimum(np.maximum(T - L * np.arange(n_dev), 0), L).astype(np.int32)
    th = _effective_host_threshold(zero_threshold, c)
    for capacity_factor in (2, 4):
        xo, zo, cro, cio, ns, ovf = distributed.distributed_cleanup(
            x32, z32, cr, ci, n_local, mesh,
            zero_threshold=th, capacity_factor=capacity_factor,
            axis_name=axis_name,
        )
        if not np.asarray(ovf).any():
            return _gather(xo, zo, cro, cio, ns)
    return None


def multiply_cleanup(
    x1, z1, c1, x2, z2, c2, zero_threshold, mesh, axis_name: str = "terms"
) -> Optional[Planes]:
    """Mesh-sharded (op1 * op2).cleanup() of host planes; None -> fall back."""
    if not _usable(mesh):
        return None
    n_dev = int(mesh.devices.size)
    T1 = x1.shape[0]
    Tp = -(-T1 // n_dev) * n_dev
    x1p = pack.to_u32(_pad_rows(x1, Tp))
    z1p = pack.to_u32(_pad_rows(z1, Tp))
    cr1, ci1 = _split_c(_pad_rows(c1, Tp))
    cr2, ci2 = _split_c(c2)
    # product coefficients scale as |c1| * |c2|: the f32 floor must use the
    # product magnitude, mirroring jx_core.effective_threshold on the fused
    # single-device path
    scale = np.array([np.max(np.abs(c1)) * np.max(np.abs(c2))]) if len(c1) and len(c2) else np.array([0.0])
    th = _effective_host_threshold(zero_threshold, scale)
    xo, zo, cro, cio, ns, ovf = distributed.distributed_multiply_cleanup(
        x1p, z1p, cr1, ci1,
        pack.to_u32(x2), pack.to_u32(z2), cr2, ci2,
        mesh, zero_threshold=th, axis_name=axis_name,
    )
    if np.asarray(ovf).any():
        return None
    return _gather(xo, zo, cro, cio, ns)


def perform_rotations(
    x, z, c,
    rotations: Sequence[Tuple[np.ndarray, np.ndarray, Optional[float]]],
    zero_threshold, mesh, axis_name: str = "terms",
    capacity_factor: int = 2,
) -> Optional[Planes]:
    """Mesh-sharded rotation sequence: one scatter, one gather.

    Clifford runs execute as purely local sharded scans; each non-Clifford
    rotation doubles the per-shard buffer, exchange-merges, and compacts back
    to the fixed capacity.  Overflow anywhere -> None (caller falls back).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not _usable(mesh):
        return None
    n_dev = int(mesh.devices.size)
    n_rounds = n_dev.bit_length() - 1
    T = x.shape[0]
    Tp = -(-T // n_dev) * n_dev
    L = Tp // n_dev
    C = capacity_factor * L
    # base absolute threshold; the f32 relative floor tracks the CURRENT
    # coefficients per rotation inside the kernels (exchange_merge pmax),
    # matching the single-device per-rotation recomputation
    th_val = float(zero_threshold) if zero_threshold is not None else 0.0
    fl_val = float(_rel_floor()) if zero_threshold is not None else 0.0

    x32 = _interleave(pack.to_u32(_pad_rows(x, Tp)), n_dev, L, C)
    z32 = _interleave(pack.to_u32(_pad_rows(z, Tp)), n_dev, L, C)
    cr, ci = _split_c(_pad_rows(c, Tp))
    cr = _interleave(cr, n_dev, L, C)
    ci = _interleave(ci, n_dev, L, C)
    ns = np.minimum(np.maximum(T - L * np.arange(n_dev), 0), L).astype(np.int32)

    sh_rows = NamedSharding(mesh, P(axis_name, None))
    sh_c = NamedSharding(mesh, distributed._coef_spec(_df_mode(), axis_name))
    sh_vec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    dx = jax.device_put(jnp.asarray(x32), sh_rows)
    dz = jax.device_put(jnp.asarray(z32), sh_rows)
    dcr = jax.device_put(jnp.asarray(cr), sh_c)
    dci = jax.device_put(jnp.asarray(ci), sh_c)
    dns = jax.device_put(jnp.asarray(ns), sh_vec)
    dt = _coeff_dtype()
    zt = jnp.asarray(th_val, dt)
    fl = jnp.asarray(fl_val, dt)
    overflowed = False

    df = _df_mode()
    clifford_fn = distributed._clifford_jit(mesh, axis_name, df)
    rot_fn = distributed._rotate_nc_jit(mesh, axis_name, n_rounds, df)

    from ..kernels.dispatch import segment_rotations

    for seg in segment_rotations(rotations):
        if seg[0] == "clifford":
            _, rxs, rzs, ms = seg
            dx, dz, dcr, dci = clifford_fn(
                dx, dz, dcr, dci,
                jax.device_put(jnp.asarray(rxs), repl),
                jax.device_put(jnp.asarray(rzs), repl),
                jax.device_put(jnp.asarray(ms), repl),
            )
        else:
            _, xr, zr, angle = seg
            tc, ts = _trig_split(angle)
            dx, dz, dcr, dci, dns, ovf = rot_fn(
                dx, dz, dcr, dci, dns,
                jax.device_put(jnp.asarray(pack.to_u32(xr.reshape(1, -1))[0]), repl),
                jax.device_put(jnp.asarray(pack.to_u32(zr.reshape(1, -1))[0]), repl),
                jax.device_put(tc, repl), jax.device_put(ts, repl),
                zt, fl,
            )
            if np.asarray(ovf).any():
                overflowed = True
                break

    if overflowed:
        return None
    xo, zo, cro, cio, ns_o, ovf = distributed.distributed_cleanup(
        dx, dz, dcr, dci, dns, mesh, zero_threshold=th_val,
        capacity_factor=1, axis_name=axis_name, rel_floor=fl_val,
    )
    if np.asarray(ovf).any():
        return None
    return _gather(xo, zo, cro, cio, ns_o)


def clifford_rotate_project(
    x, z, c,
    rotations,
    stab_x, stab_z, stab_signs,
    free_qubit_mask: np.ndarray,
    zero_threshold: float,
    mesh, axis_name: str = "terms",
) -> Optional[Planes]:
    """Mesh-sharded fused flagship projection (taper / CS-VQE): Clifford
    rotations + stabilizer filter + sign flips + column masking + cross-shard
    merge in ONE scatter and ONE gather.  None -> caller falls back to the
    single-device fused path (reference flow projection/base.py:44-124).
    """
    if not _usable(mesh):
        return None
    n_dev = int(mesh.devices.size)
    T = x.shape[0]
    Tp = -(-T // n_dev) * n_dev
    L = Tp // n_dev

    from ..kernels.dispatch import projection_prep

    rx, rz, ms, neg_x, neg_z, col_keep = projection_prep(
        rotations, stab_x, stab_z, stab_signs, free_qubit_mask, x.shape[1]
    )
    row32 = lambda a: pack.to_u32(a.reshape(1, -1))[0]

    # base threshold; the f32 floor applies against the POST-filter
    # coefficients inside the kernel (the largest-|c| term may be projected
    # out), mirroring the single-device fused path
    th = float(zero_threshold) if zero_threshold is not None else 0.0
    fl_val = float(_rel_floor()) if zero_threshold is not None else 0.0
    ns = np.minimum(np.maximum(T - L * np.arange(n_dev), 0), L).astype(np.int32)
    import jax.numpy as jnp

    for capacity_factor in (2, 4):
        C = capacity_factor * L
        x32 = _interleave(pack.to_u32(_pad_rows(x, Tp)), n_dev, L, C)
        z32 = _interleave(pack.to_u32(_pad_rows(z, Tp)), n_dev, L, C)
        cr, ci = _split_c(_pad_rows(c, Tp))
        cr = _interleave(cr, n_dev, L, C)
        ci = _interleave(ci, n_dev, L, C)
        xo, zo, cro, cio, ns_o, ovf = distributed.distributed_clifford_project(
            jnp.asarray(x32), jnp.asarray(z32),
            jnp.asarray(cr), jnp.asarray(ci), ns,
            jnp.asarray(rx), jnp.asarray(rz), jnp.asarray(ms),
            jnp.asarray(pack.to_u32(stab_x)), jnp.asarray(pack.to_u32(stab_z)),
            jnp.asarray(row32(neg_x)), jnp.asarray(row32(neg_z)),
            jnp.asarray(row32(col_keep)),
            mesh, zero_threshold=th, rel_floor=fl_val,
            axis_name=axis_name,
        )
        if not np.asarray(ovf).any():
            return _gather(xo, zo, cro, cio, ns_o)
    return None


def expval(x, z, c, s_pack, amps, mesh, axis_name: str = "terms"):
    """Mesh-sharded <psi|O|psi>: term axis split across devices, one psum.

    A pure reduction -- no exchange, so any mesh size >= 2 works (the
    power-of-two restriction applies only to the hash-routed kernels).  Each
    device runs the matched-formulation expval kernel (jx_state.expval) on
    its term shard against the replicated state and the partial sums combine
    with a single collective.  This is the multi-chip analog of the
    reference's parallelized expval call site (symmer base.py:811-815).
    Returns None when the mesh is unusable (caller falls back).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..kernels import jx_state

    n_dev = int(mesh.devices.size)
    if n_dev < 2:
        return None
    # the state replicates to every device: a large-support reference state
    # would multiply HBM by n_dev -- fall back to the single-device path
    # (which holds one copy) rather than risk OOM across the mesh
    state_bytes = s_pack.nbytes + 2 * amps.nbytes
    if state_bytes * n_dev > (1 << 30):
        import warnings

        warnings.warn(
            f"mesh expval skipped: replicating a {state_bytes >> 20} MiB state "
            f"across {n_dev} devices; using the single-device path"
        )
        return None
    T = x.shape[0]
    Tp = -(-T // n_dev) * n_dev
    # padding rows carry zero coefficients: every (term, basis) contribution
    # is scaled by c_t, so they add exactly 0 to the reduction
    x32 = pack.to_u32(_pad_rows(x, Tp))
    z32 = pack.to_u32(_pad_rows(z, Tp))
    cr, ci = _split_c(_pad_rows(c, Tp))
    s32 = pack.to_u32(s_pack)
    ar, ai = _split_c(amps)
    df = cr.ndim == 2

    sh_rows = NamedSharding(mesh, P(axis_name, None))
    sh_c = NamedSharding(mesh, distributed._coef_spec(df, axis_name))
    repl = NamedSharding(mesh, P())
    dx = jax.device_put(jnp.asarray(x32), sh_rows)
    dz = jax.device_put(jnp.asarray(z32), sh_rows)
    dcr = jax.device_put(jnp.asarray(cr), sh_c)
    dci = jax.device_put(jnp.asarray(ci), sh_c)
    ds = jax.device_put(jnp.asarray(s32), repl)
    dar = jax.device_put(jnp.asarray(ar), repl)
    dai = jax.device_put(jnp.asarray(ai), repl)

    re, im = _expval_jit(mesh, axis_name, df)(dx, dz, dcr, dci, ds, dar, dai)
    from ..kernels.dispatch import _scalar_from_dev

    return _scalar_from_dev(np.asarray(re), np.asarray(im))


@lru_cache(maxsize=None)
def _expval_jit(mesh, axis_name: str, df: bool):
    """Cached jitted shard_map for the expval reduction — a fresh closure
    per call would retrace + recompile every expectation value (jit caches
    on function identity), which a VQE energy loop pays per iteration."""
    import jax
    import jax.numpy as jnp

    from ..kernels import jx_df, jx_state

    def _shard(xs, zs, crs, cis, s, a_r, a_i):
        # jx_state.expval requires a DEDUPLICATED state (windowed hash
        # match); user states may carry duplicate rows
        s, a_r, a_i, n_b = jx_state.cleanup_state(s, a_r, a_i, s.shape[0])
        re, im = jx_state.expval(xs, zs, crs, cis, s, a_r, a_i, n_b)
        if df:
            # re/im are (2,) double-float [hi, lo] pairs: a componentwise
            # psum would sum the hi lanes in plain f32 and capture the
            # cross-device rounding in no lo lane, degrading extended mode
            # to ~f32 when partial sums cancel.  Gather the n_dev pairs and
            # fold them with compensated df adds instead.
            re_all = jax.lax.all_gather(re, axis_name)  # (n_dev, 2)
            im_all = jax.lax.all_gather(im, axis_name)
            reh, rel = jx_df.df_sum(re_all[:, 0], re_all[:, 1])
            imh, iml = jx_df.df_sum(im_all[:, 0], im_all[:, 1])
            return jnp.stack([reh, rel]), jnp.stack([imh, iml])
        return (
            jax.lax.psum(re, axis_name),
            jax.lax.psum(im, axis_name),
        )

    return jax.jit(partial_shard_map_expval(mesh, axis_name, df)(_shard))


def partial_shard_map_expval(mesh, axis_name, df=False):
    """shard_map decorator for the expval reduction (terms sharded, state
    replicated, scalar out; coefficient planes may carry a [hi, lo] axis)."""
    from functools import partial

    import jax
    from jax.sharding import PartitionSpec as P

    spec_c = distributed._coef_spec(df, axis_name)
    return partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), spec_c,
                  spec_c, P(), P(), P()),
        out_specs=(P(), P()),
        # the df branch folds all-gathered [hi, lo] pairs identically on
        # every device; the VMA checker cannot statically infer that
        # replication (psum it can), so the check is disabled here
        check_vma=False,
    )


def _effective_host_threshold(zero_threshold, *coeff_vecs) -> float:
    """Apply the f32 relative floor on the host side (the sharded kernels take
    one static threshold; computing the max on host keeps semantics identical
    to jx_core.effective_threshold on the single-device path).

    Keep the floor rule in lockstep with jx_core.effective_threshold --
    a change applied to only one of the two desynchronizes the sharded and
    single-device cleanup semantics.  The sharded drivers follow the
    configured device precision (double-float planes in extended mode)."""
    fl = float(_rel_floor())
    if fl == 0.0 or zero_threshold is None:
        return zero_threshold if zero_threshold is not None else 0.0
    m = max(float(np.max(np.abs(cv))) if len(cv) else 0.0 for cv in coeff_vecs)
    return max(float(zero_threshold), fl * m)


def distributed_wide_multiply(left, right, mesh=None):
    """Single-term Pauli product with the packed WORD axis sharded — the
    qubit-axis scaling dimension of SURVEY §2.3 (reference regime: two
    100,000,000-qubit single terms, symmer README.md:54).

    Beyond one chip's HBM the PLANES are the memory, not the terms: the
    product's XOR is elementwise in words, so each device holds only its
    word shard, and the phase — two popcount totals (Y counts, the
    (-1)^{x1.z2} sign) — rides one ``psum``.  Output planes stay sharded on
    device; this host-boundary driver gathers them back into a standard
    ``PauliwordOp``.

    Both operands must be single-term (the reference's wide regime); raises
    ValueError otherwise.  Falls back to ``None`` (caller uses the local
    path) when the padded word axis cannot split over the mesh.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..kernels import jx_core
    from ..operators.base import PauliwordOp

    if mesh is None:
        from ..config import config

        mesh = config.mesh
    if mesh is None:
        return None
    if left.n_terms != 1 or right.n_terms != 1:
        raise ValueError(
            "distributed_wide_multiply handles single-term operands; use the "
            "term-sharded product for many-term operators"
        )
    if left.n_qubits != right.n_qubits:
        raise ValueError(
            f"operand widths differ ({left.n_qubits} vs {right.n_qubits} "
            "qubits); tensor-pad to a common width first"
        )
    ax = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)

    x1, z1 = pack.to_u32(left.x_pack)[0], pack.to_u32(left.z_pack)[0]
    x2, z2 = pack.to_u32(right.x_pack)[0], pack.to_u32(right.z_pack)[0]
    W = x1.shape[0]
    Wp = -(-W // n_dev) * n_dev
    if Wp != W:
        padf = lambda a: np.concatenate([a, np.zeros(Wp - W, a.dtype)])
        x1, z1, x2, z2 = map(padf, (x1, z1, x2, z2))

    def local(x1s, z1s, x2s, z2s):
        xo = x1s ^ x2s
        zo = z1s ^ z2s
        pc = jx_core.pc
        partial = jnp.stack([
            jnp.sum(pc(x1s & z1s)) + jnp.sum(pc(x2s & z2s)),  # y_in
            jnp.sum(pc(xo & zo)),                             # y_out
            jnp.sum(pc(x1s & z2s)),                           # x1.z2
        ])
        total = lax.psum(partial, ax)  # ONE collective for the whole phase
        k = (3 * total[0] + total[1]) % 4
        sign = 1 - 2 * (total[2] & 1)
        re, im = jx_core.apply_i_pow(k, sign, jnp.zeros_like(sign))
        return xo, zo, re, im

    rep = NamedSharding(mesh, P(ax))
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax)),
        out_specs=(P(ax), P(ax), P(), P()),
    )(*(jax.device_put(a, rep) for a in (x1, z1, x2, z2)))
    xo32 = np.asarray(out[0])[:W]
    zo32 = np.asarray(out[1])[:W]
    phase = complex(int(out[2]), int(out[3]))
    coeff = left.coeff_vec[0] * right.coeff_vec[0] * phase
    return PauliwordOp.from_planes(
        pack.from_u32(xo32[None, :]),
        pack.from_u32(zo32[None, :]),
        np.array([coeff], complex),
        left.n_qubits,
    )


def distributed_wide_commutes(left, right, mesh=None):
    """Do two ultra-wide single-term Paulis commute? Word-axis-sharded
    symplectic form: parity(x1.z2) == parity(z1.x2), reduced by one
    ``psum`` of two integers (companion of ``distributed_wide_multiply``).
    Returns None when no mesh is configured."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..kernels import jx_core

    if mesh is None:
        from ..config import config

        mesh = config.mesh
    if mesh is None:
        return None
    if left.n_terms != 1 or right.n_terms != 1:
        raise ValueError("distributed_wide_commutes handles single terms")
    if left.n_qubits != right.n_qubits:
        raise ValueError(
            f"operand widths differ ({left.n_qubits} vs {right.n_qubits} "
            "qubits); tensor-pad to a common width first"
        )
    ax = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    x1, z1 = pack.to_u32(left.x_pack)[0], pack.to_u32(left.z_pack)[0]
    x2, z2 = pack.to_u32(right.x_pack)[0], pack.to_u32(right.z_pack)[0]
    W = x1.shape[0]
    Wp = -(-W // n_dev) * n_dev
    if Wp != W:
        padf = lambda a: np.concatenate([a, np.zeros(Wp - W, a.dtype)])
        x1, z1, x2, z2 = map(padf, (x1, z1, x2, z2))

    def local(x1s, z1s, x2s, z2s):
        pc = jx_core.pc
        partial = jnp.stack(
            [jnp.sum(pc(x1s & z2s)), jnp.sum(pc(z1s & x2s))]
        )
        total = lax.psum(partial, ax)
        return ((total[0] ^ total[1]) & 1) == 0

    rep = NamedSharding(mesh, P(ax))
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(),
    )(*(jax.device_put(a, rep) for a in (x1, z1, x2, z2)))
    return bool(out)
