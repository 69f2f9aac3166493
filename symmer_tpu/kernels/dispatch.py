"""Host/device dispatch for the symplectic kernels.

Every hot operation exists twice -- packed-numpy (np_core) and XLA (jx_core)
with identical semantics.  The functions here take host uint64 planes and
complex coefficients and dispatch on problem size via
:data:`symmer_tpu.config.config`: below the threshold, XLA dispatch latency
dominates and the host path wins; above it the device path (TPU) wins by
orders of magnitude.

Boundary conventions:
  - planes: host uint64 -> device uint32 via the lossless little-endian view;
  - coefficients: host complex -> split (re, im) float planes on device
    (complex dtypes never cross onto the device -- XLA TPU has no native
    complex and some PJRT transports cannot transfer them at all);
  - device calls use power-of-two padded term buckets so jit compile caches
    are reused across the dynamically-shaped operator algebra.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import config
from ..profiling import kernel_stats
from . import np_core, pack

Planes = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _next_bucket(n: int) -> int:
    if n <= 8:
        return 8
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=None)
def _jx():
    import jax

    from . import jx_core

    return jax, jx_core


def _exact_keys() -> bool:
    """Honour ``config.exact_cleanup_keys`` where supported: the exact
    multi-word compare only exists for plain (non-double-float) coefficient
    planes; under extended precision it falls back to the 128-bit hashed
    grouping with a one-time warning."""
    if not config.exact_cleanup_keys:
        return False
    if _df_mode():
        global _WARNED_EXACT_KEYS
        if not _WARNED_EXACT_KEYS:
            import warnings

            warnings.warn(
                "exact_cleanup_keys is not supported with extended "
                "(double-float) device precision; using the hashed cleanup"
            )
            _WARNED_EXACT_KEYS = True
        return False
    return True


_WARNED_EXACT_KEYS = False


@functools.lru_cache(maxsize=None)
def _jitted(exact: bool = False):
    jax, jx = _jx()
    return {
        "cleanup_t": jax.jit(
            lambda x, z, cr, ci, n, th, fl: jx.cleanup_sorted(
                x, z, cr, ci, n, th, exact=exact, rel_floor=fl
            )
        ),
        "cleanup": jax.jit(
            lambda x, z, cr, ci, n: jx.cleanup_sorted(
                x, z, cr, ci, n, None, exact=exact
            )
        ),
        "mul_cleanup": jax.jit(
            lambda x1, z1, cr1, ci1, x2, z2, cr2, ci2, th, fl: jx.mul_pairs_cleanup(
                x1, z1, cr1, ci1, x2, z2, cr2, ci2, th, rel_floor=fl
            )
        ),
        # zero_threshold=None must mean dedup-only (exact zeros KEPT), as on
        # the host path -- passing th=0.0 to the traced kernel would drop
        # exactly-cancelled terms and desynchronise the two backends
        "mul_cleanup_nt": jax.jit(
            lambda x1, z1, cr1, ci1, x2, z2, cr2, ci2: jx.mul_pairs_cleanup(
                x1, z1, cr1, ci1, x2, z2, cr2, ci2, None
            )
        ),
        "rot_nc_cleanup_nt": jax.jit(
            lambda x, z, cr, ci, xr, zr, tc, ts, n: jx.rotate_nonclifford_cleanup(
                x, z, cr, ci, xr, zr, None, n, None, trig=(tc, ts)
            )
        ),
        "anticommutes": jax.jit(jx.anticommutes),
        "clifford_scan": jax.jit(jx.clifford_scan),
        "rot_nc_cleanup": jax.jit(
            lambda x, z, cr, ci, xr, zr, tc, ts, n, th, fl: jx.rotate_nonclifford_cleanup(
                x, z, cr, ci, xr, zr, None, n, th, rel_floor=fl, trig=(tc, ts)
            )
        ),
    }


def _coeff_dtype(allow_upgrade: bool = True):
    """Device float dtype for coefficient planes.

    ``allow_upgrade=False`` makes this a PURE query: it reports the dtype
    the CPU-extended fence WILL select without flipping the process-global
    ``jax_enable_x64`` itself -- for read-only probes (e.g. solver
    selection) that must not mutate precision state; the effectful upgrade
    then happens at the first real kernel dispatch.  Do not build device
    arrays from a pure-query result.

    float64 iff x64 is enabled AND the backend supports it: XLA TPU rewrites
    every 64-bit element type to 32-bit pairs and has no lowering for the
    u64 bitcasts the cleanup sort uses -- and TPU f64 arithmetic would be
    silently downcast regardless, so on a TPU backend the device path always
    runs float32 (the host path keeps full f64 semantics).

    ``device_precision='f32'`` means plain float32 planes unconditionally
    (previously it silently ran f64 whenever x64 was on, making f32-mode
    checks vacuous on CPU hosts)."""
    import jax

    if config.device_precision == "f32":
        return np.float32
    if not jax.config.jax_enable_x64:
        if (
            config.device_precision == "extended"
            and config.cpu_extended_mode == "x64"
            and jax.default_backend() == "cpu"
        ):
            # CPU has native float64: emulating it with double-float [hi, lo]
            # planes there is strictly worse -- XLA:CPU's FMA contraction
            # floors df_mul at ~1e-7 and long df chains compile superlinearly
            # (jx_df docstring).  Fence the production-default config by
            # auto-upgrading to x64; 'f32' precision is honoured as asked.
            if not allow_upgrade:
                return np.float64
            global _WARNED_CPU_X64_UPGRADE
            if not _WARNED_CPU_X64_UPGRADE:
                import warnings

                warnings.warn(
                    "device_precision='extended' on the CPU backend: "
                    "enabling x64 and running native float64 coefficient "
                    "planes (double-float emulation is only for backends "
                    "without native f64, i.e. TPU). This flips the "
                    "process-global jax_enable_x64 at first kernel use; "
                    "call symmer_tpu.enable_x64() at startup to choose the "
                    "moment yourself, or set config.cpu_extended_mode='df' "
                    "to keep the emulation."
                )
                _WARNED_CPU_X64_UPGRADE = True
            from ..config import enable_x64

            enable_x64(True)
            return np.float64
        return np.float32
    if jax.default_backend() == "tpu":
        global _WARNED_TPU_F64
        if not _WARNED_TPU_F64:
            import warnings

            warnings.warn(
                "x64 is enabled but the TPU backend has no native float64: "
                "device kernels run float32 (host kernels stay float64)."
            )
            _WARNED_TPU_F64 = True
        return np.float32
    return np.float64


_WARNED_TPU_F64 = False
_WARNED_CPU_X64_UPGRADE = False


def _df_mode() -> bool:
    """True when device coefficients run as double-float [hi, lo] planes
    (extended precision on a float32-only backend, see jx_df)."""
    return config.device_precision == "extended" and _coeff_dtype() == np.float32


def _rel_floor():
    """Relative threshold floor for the device cleanup (0.0 disables).

    Nonzero only on float32 backends, where cancellation residue sits above
    the absolute threshold of the f64 host semantics: ~2e-6 relative in plain
    f32, ~1e-12 in extended (double-float) mode (see
    config.f32_threshold_rel_floor / extended_threshold_rel_floor and
    jx_core.effective_threshold)."""
    dt = _coeff_dtype()
    df = _df_mode()
    if dt != np.float32:
        fl = 0.0
    elif df:
        fl = config.extended_threshold_rel_floor
    else:
        fl = config.f32_threshold_rel_floor
    return np.asarray(fl, dt)


def _to_dev(x64: np.ndarray, pad_rows: int = 0):
    import jax.numpy as jnp

    a = pack.to_u32(x64)
    if pad_rows > a.shape[0]:
        a = np.pad(a, [(0, pad_rows - a.shape[0]), (0, 0)])
    return jnp.asarray(a)


def _coeff_to_dev(c: np.ndarray, pad_rows: int = 0, df: Optional[bool] = None):
    """complex host coeffs -> (re, im) device planes.

    In extended mode each plane is a (T, 2) double-float [hi, lo] pair that
    represents the host float64 exactly to ~2^-48 relative; kernels detect
    the layout by shape (jx_core.c_lanes)."""
    import jax.numpy as jnp

    dt = _coeff_dtype()
    if df is None:
        df = _df_mode()
    if df and dt == np.float32:
        from . import jx_df

        cr, ci = jx_df.host_split_complex(c)
        if pad_rows > c.shape[0]:
            cr = np.pad(cr, [(0, pad_rows - c.shape[0]), (0, 0)])
            ci = np.pad(ci, [(0, pad_rows - c.shape[0]), (0, 0)])
        return jnp.asarray(cr), jnp.asarray(ci)
    cr = np.ascontiguousarray(c.real, dtype=dt)
    ci = np.ascontiguousarray(c.imag, dtype=dt)
    if pad_rows > c.shape[0]:
        cr = np.pad(cr, (0, pad_rows - c.shape[0]))
        ci = np.pad(ci, (0, pad_rows - c.shape[0]))
    return jnp.asarray(cr), jnp.asarray(ci)


def _trig_split(angle: float):
    """Host-side cos/sin of a rotation angle for the device kernels: exact
    f64 evaluation split into double-float pairs in extended mode (device f32
    cos is only ~1e-7 accurate), plain scalars otherwise."""
    import jax.numpy as jnp

    a = float(complex(angle).real)
    dt = _coeff_dtype()
    if _df_mode():
        from . import jx_df

        ch, cl = jx_df.host_split_f64(np.float64(np.cos(a)))
        sh, sl = jx_df.host_split_f64(np.float64(np.sin(a)))
        return (
            jnp.asarray(np.stack([ch, cl])), jnp.asarray(np.stack([sh, sl]))
        )
    return jnp.asarray(np.cos(a), dt), jnp.asarray(np.sin(a), dt)


def _merge_coeff_host(crh, cih) -> np.ndarray:
    """Device coefficient planes (plain or [hi, lo]) -> host complex128."""
    crh = np.asarray(crh)
    cih = np.asarray(cih)
    if crh.ndim >= 2 and crh.shape[-1] == 2:
        from . import jx_df

        return jx_df.host_merge_f64(crh[..., 0], crh[..., 1]) + 1j * jx_df.host_merge_f64(
            cih[..., 0], cih[..., 1]
        )
    return crh.astype(np.float64) + 1j * cih.astype(np.float64)


def _scalar_from_dev(re, im) -> complex:
    """Device scalar pair -> complex; (2,) arrays are double-float pairs."""
    re = np.asarray(re)
    im = np.asarray(im)
    if re.ndim == 1:
        return complex(
            float(re[0]) + float(re[1]), float(im[0]) + float(im[1])
        )
    return complex(float(re), float(im))


def _planes_from_dev(x, z, cr, ci, n_out: int) -> Planes:
    """Download result planes in ONE batched fetch.

    Separate ``np.asarray`` calls each pay a full host<->device round trip
    (~30 ms on a remote-attached TPU) and transfer the ENTIRE padded buffer;
    slicing on device first and batching through ``jax.device_get`` makes
    this one round trip moving only the valid rows."""
    import jax

    xh, zh, crh, cih = jax.device_get(
        (x[:n_out], z[:n_out], cr[:n_out], ci[:n_out])
    )
    xo = pack.from_u32(np.asarray(xh))
    zo = pack.from_u32(np.asarray(zh))
    return xo, zo, _merge_coeff_host(crh, cih)


def _try_mesh(kind: str, T: int, runner):
    """Route through the mesh-sharded path when a mesh is configured and the
    problem is large enough; returns host planes or None (caller continues
    on the single-device path -- also the overflow fallback)."""
    if config.mesh is None or T < config.mesh_threshold:
        return None
    out = runner(config.mesh)
    if out is not None:
        kernel_stats.record(kind, device=True, mesh=True)
    return out


def cleanup(x, z, c, zero_threshold: Optional[float]) -> Planes:
    T, W = x.shape
    if zero_threshold is not None:
        from ..parallel import sharded

        out = _try_mesh(
            "cleanup", T,
            lambda mesh: sharded.cleanup(x, z, c, zero_threshold, mesh),
        )
        if out is not None:
            return out
    row_bytes = 16 * W + 16
    if not config.use_device_io(
        T * W / config.host_cleanup_rate,
        up_bytes=T * row_bytes, down_bytes=T * row_bytes, n_syncs=2,
    ):
        kernel_stats.record("cleanup", device=False)
        return np_core.cleanup(x, z, c, zero_threshold)
    kernel_stats.record("cleanup", device=True)
    import jax.numpy as jnp

    Tp = _next_bucket(T)
    jx_, jz_ = _to_dev(x, Tp), _to_dev(z, Tp)
    jcr, jci = _coeff_to_dev(c, Tp)
    jf = _jitted(_exact_keys())
    if zero_threshold is None:
        ox, oz, ocr, oci, n = jf["cleanup"](jx_, jz_, jcr, jci, T)
    else:
        ox, oz, ocr, oci, n = jf["cleanup_t"](
            jx_, jz_, jcr, jci, T,
            jnp.asarray(zero_threshold, _coeff_dtype()), _rel_floor(),
        )
    return _planes_from_dev(ox, oz, ocr, oci, int(n))


def multiply_cleanup(x1, z1, c1, x2, z2, c2, zero_threshold: Optional[float]) -> Planes:
    M1, W = x1.shape
    M2 = x2.shape[0]
    if zero_threshold is not None:
        from ..parallel import sharded

        # the sharded axis is op1's terms but the produced term count (the
        # thing worth sharding) is the full M1 * M2 product
        out = _try_mesh(
            "multiply", M1 * M2,
            lambda mesh: sharded.multiply_cleanup(
                x1, z1, c1, x2, z2, c2, zero_threshold, mesh
            ),
        )
        if out is not None:
            return out
    row_bytes = 16 * W + 16
    P = M1 * M2
    if not config.use_device_io(
        P * W / config.host_cleanup_rate,
        up_bytes=(M1 + M2) * row_bytes,
        # the download moves the POST-cleanup rows; the true count is unknown
        # before running, so assume a modest 4x dedup (pre-dedup P as the
        # estimate made the device path unreachable over slow transports)
        down_bytes=P * row_bytes // 4,
        n_syncs=2,
    ):
        kernel_stats.record("multiply", device=False)
        return np_core.multiply_cleanup_host(
            x1, z1, c1, x2, z2, c2, zero_threshold
        )
    kernel_stats.record("multiply", device=True)
    import jax.numpy as jnp

    if zero_threshold is None:
        # dedup-only semantics: exact zeros kept, as on the host path
        cr1, ci1 = _coeff_to_dev(c1)
        cr2, ci2 = _coeff_to_dev(c2)
        ox, oz, ocr, oci, n = _jitted()["mul_cleanup_nt"](
            _to_dev(x1), _to_dev(z1), cr1, ci1,
            _to_dev(x2), _to_dev(z2), cr2, ci2,
        )
    else:
        # pow2-bucket the operand shapes so the operator-algebra loop reuses
        # compiled programs across varying term counts (module convention;
        # DeviceOperator.multiply established the pattern).  Padded rows are
        # identity terms with coefficient 0: they dedup into one row that
        # the positive threshold drops -- which is why the None
        # (dedup-only) branch above must NOT pad.
        M1p, M2p = _next_bucket(M1), _next_bucket(M2)
        cr1, ci1 = _coeff_to_dev(c1, M1p)
        cr2, ci2 = _coeff_to_dev(c2, M2p)
        th = jnp.asarray(zero_threshold, _coeff_dtype())
        ox, oz, ocr, oci, n = _jitted()["mul_cleanup"](
            _to_dev(x1, M1p), _to_dev(z1, M1p), cr1, ci1,
            _to_dev(x2, M2p), _to_dev(z2, M2p), cr2, ci2, th, _rel_floor(),
        )
    return _planes_from_dev(ox, oz, ocr, oci, int(n))


def anticommutes(x1, z1, x2, z2) -> np.ndarray:
    M1, W = x1.shape
    M2 = x2.shape[0]
    # host-in/host-out: the M1 x M2 bool result must cross the transport, so
    # the decision weighs measured bandwidth against the native host kernel
    if not config.use_device_io(
        host_s=M1 * M2 * W / config.host_adjacency_rate,
        up_bytes=(M1 + M2) * W * 16,
        down_bytes=M1 * M2,
    ):
        kernel_stats.record("anticommutes", device=False)
        return np_core.anticommutes(x1, z1, x2, z2)
    kernel_stats.record("anticommutes", device=True)
    # the XLA broadcast materialises TWO (M1, M2, 2W) uint32 intermediates
    # (x1&z2 and z1&x2): above budget, route to the VMEM-tiled Pallas kernel
    # instead of risking a device OOM (same guard as is_noncontextual)
    broadcast_too_big = 2 * (M1 * M2 * (2 * W) * 4) > (1 << 31)
    if config.pallas_anticommutes or broadcast_too_big:
        from . import pallas_gf2

        out = pallas_gf2.anticommutes_tiled(
            _to_dev(x1), _to_dev(z1), _to_dev(x2), _to_dev(z2)
        )
        return np.asarray(out)
    out = _jitted()["anticommutes"](_to_dev(x1), _to_dev(z1), _to_dev(x2), _to_dev(z2))
    return np.asarray(out)


def qubitwise_commutes(x1, z1, x2, z2) -> np.ndarray:
    """Termwise QWC adjacency with host/device dispatch (hot for
    clique_cover('QWC') measurement grouping)."""
    M1, W = x1.shape
    M2 = x2.shape[0]
    if not config.use_device_io(
        host_s=M1 * M2 * W / config.host_adjacency_rate,
        up_bytes=(M1 + M2) * W * 16,
        down_bytes=M1 * M2,
    ):
        kernel_stats.record("qubitwise_commutes", device=False)
        return np_core.qubitwise_commutes(x1, z1, x2, z2)
    kernel_stats.record("qubitwise_commutes", device=True)
    # the device broadcast materialises (chunk, M2, 2W) u32 intermediates;
    # chunk the row axis to bound HBM (pow-2 chunks reuse the jit cache)
    budget_rows = max(8, (1 << 27) // max(1, 3 * M2 * (2 * W) * 4))
    Ic = 1 << (budget_rows.bit_length() - 1)
    if Ic >= M1:
        out = _jitted_qwc()(_to_dev(x1), _to_dev(z1), _to_dev(x2), _to_dev(z2))
        return np.asarray(out)
    dx2, dz2 = _to_dev(x2), _to_dev(z2)
    parts = []
    for i0 in range(0, M1, Ic):
        # padded rows are identity terms (QWC with everything); sliced off below
        parts.append(_jitted_qwc()(
            _to_dev(x1[i0 : i0 + Ic], Ic), _to_dev(z1[i0 : i0 + Ic], Ic), dx2, dz2
        ))
    import jax

    host = jax.device_get(parts)
    out = np.concatenate([np.asarray(p) for p in host], axis=0)
    return out[:M1]


@functools.lru_cache(maxsize=None)
def _jitted_qwc():
    jax, jx = _jx()
    return jax.jit(jx.qubitwise_commutes)


def is_clifford_angle(angle, tol: float = None):
    """Return the pi/2 multiple m if the angle is Clifford, else None.

    The tolerance (default ``config.clifford_angle_tol``) is on the MULTIPLE,
    not the angle: an exact multiple accumulated in f64 (e.g. 250*pi/2)
    carries ~1e-14 of rounding, and misclassifying it breaks Clifford-run
    batching AND the fused device projection — a silent multi-round-trip
    perf cliff on the flagship taper flow."""
    if angle is None:
        return 1
    if tol is None:
        tol = config.clifford_angle_tol
    angle = complex(angle).real
    multiple = angle * 2 / np.pi
    m = round(multiple)
    return m if abs(m - multiple) <= tol else None


def segment_rotation_indices(rotations):
    """Yield ('clifford', i, j, multiples) index ranges for maximal Clifford
    runs and ('nonclifford', k, None, None) singles, in order.  The ONE
    run-breaking rule shared by the single-device loop, the mesh driver and
    the packed-host path (packing is done by each consumer) — keeping
    multiple copies of this while-loop desynchronised them in the past."""
    i, n = 0, len(rotations)
    while i < n:
        if is_clifford_angle(rotations[i][2]) is not None:
            j, ms = i, []
            while j < n:
                mj = is_clifford_angle(rotations[j][2])
                if mj is None:
                    break
                ms.append(mj)
                j += 1
            yield ("clifford", i, j, ms)
            i = j
        else:
            yield ("nonclifford", i, None, None)
            i += 1


def segment_rotations(rotations):
    """Device-packed view of :func:`segment_rotation_indices`:
    ('clifford', rx_rows_u32, rz_rows_u32, multiples_i32) /
    ('nonclifford', xr, zr, angle)."""
    for kind, i, j, ms in segment_rotation_indices(rotations):
        if kind == "clifford":
            yield (
                "clifford",
                np.array([
                    pack.to_u32(rotations[k][0].reshape(1, -1))[0]
                    for k in range(i, j)
                ]),
                np.array([
                    pack.to_u32(rotations[k][1].reshape(1, -1))[0]
                    for k in range(i, j)
                ]),
                np.array(ms, np.int32),
            )
        else:
            xr, zr, angle = rotations[i]
            yield ("nonclifford", xr, zr, angle)


def perform_rotations(
    x, z, c,
    rotations: Sequence[Tuple[np.ndarray, np.ndarray, Optional[float]]],
    zero_threshold: Optional[float] = 1e-15,
) -> Planes:
    """Apply a sequence of single-Pauli rotations (xr, zr, angle) left-to-right.

    Clifford runs are batched into one lax.scan on the device path; the
    sequence is broken at non-Clifford rotations, which grow the term count
    and trigger a cleanup (mirrors symmer base.py:1163-1186 semantics, where
    a cleanup follows every rotation -- Clifford rotations cannot create
    duplicates so deferring their cleanup is exact).
    """
    T, W = x.shape
    if zero_threshold is not None:
        from ..parallel import sharded

        out = _try_mesh(
            "perform_rotations", T,
            lambda mesh: sharded.perform_rotations(
                x, z, c, rotations, zero_threshold, mesh
            ),
        )
        if out is not None:
            return out
    # transport-aware: the sequence uploads the operator once and downloads
    # the survivors once; each non-Clifford step adds a bucket-resize sync
    R = max(1, len(rotations))
    n_nc = sum(
        1 for _, _, a in rotations if is_clifford_angle(a) is None
    )
    row_bytes = 16 * W + 16
    host_s = (
        R * T * W / config.host_rotate_rate + T * W / config.host_cleanup_rate
    )
    use_dev = config.use_device_io(
        host_s, up_bytes=T * row_bytes, down_bytes=T * row_bytes,
        n_syncs=2 + n_nc,
    )
    kernel_stats.record("perform_rotations", device=use_dev)
    if not use_dev:
        # batch consecutive Clifford runs into ONE native sequence call
        # (term-count preserving, no intermediate cleanup); non-Clifford
        # steps run the fused native rotate+dedup.  Run-breaking rule shared
        # with the device/mesh paths via segment_rotation_indices.
        for kind, i, j, ms in segment_rotation_indices(rotations):
            if kind == "nonclifford":
                xr, zr, angle = rotations[i]
                x, z, c = np_core.rotate_single_cleanup(
                    x, z, c, xr, zr, angle, zero_threshold
                )
            else:
                rx = np.asarray([rotations[k][0] for k in range(i, j)])
                rz = np.asarray([rotations[k][1] for k in range(i, j)])
                x, z, c = np_core.clifford_sequence(
                    x, z, c, rx, rz,
                    np.asarray([m % 4 for m in ms], np.int64),
                )
        return np_core.cleanup(x, z, c, zero_threshold)

    Tp = _next_bucket(T)
    dx, dz = _to_dev(x, Tp), _to_dev(z, Tp)
    dcr, dci = _coeff_to_dev(c, Tp)
    dx, dz, dcr, dci, n_valid = device_rotation_loop(
        dx, dz, dcr, dci, T, rotations, zero_threshold
    )
    return _planes_from_dev(dx, dz, dcr, dci, n_valid)


def device_rotation_loop(dx, dz, dcr, dci, n_valid, rotations, zero_threshold):
    """Device-resident rotation sequence on ALREADY-UPLOADED planes.

    Every Clifford run executes as one lax.scan, every non-Clifford rotation
    as a fused rotate+cleanup; after each non-Clifford step the buffers are
    re-bucketed by a device-side slice (only the scalar survivor count
    crosses to the host, to pick the static bucket shape).  A final cleanup
    compacts the result.  Shared by the host-boundary dispatch and the
    device-resident DeviceOperator pipeline.

    Returns (dx, dz, dcr, dci, n_valid) device arrays + host count.
    """
    import jax.numpy as jnp

    jitted = _jitted()
    dt = _coeff_dtype()
    th = jnp.asarray(
        zero_threshold if zero_threshold is not None else 0.0, dt
    )
    fl = _rel_floor() if zero_threshold is not None else np.asarray(0.0, dt)
    for seg in segment_rotations(rotations):
        if seg[0] == "clifford":
            # maximal Clifford run -> one lax.scan on device
            _, rxs, rzs, ms = seg
            dx, dz, dcr, dci = jitted["clifford_scan"](
                dx, dz, dcr, dci,
                jnp.asarray(rxs), jnp.asarray(rzs), jnp.asarray(ms),
            )
        else:
            _, xr, zr, angle = seg
            tc, ts = _trig_split(angle)
            if zero_threshold is None:
                # dedup-only: exact zeros kept (host-path semantics)
                ox, oz, ocr, oci, n = jitted["rot_nc_cleanup_nt"](
                    dx, dz, dcr, dci,
                    _to_dev(xr.reshape(1, -1))[0],
                    _to_dev(zr.reshape(1, -1))[0],
                    tc, ts, n_valid,
                )
            else:
                ox, oz, ocr, oci, n = jitted["rot_nc_cleanup"](
                    dx, dz, dcr, dci,
                    _to_dev(xr.reshape(1, -1))[0],
                    _to_dev(zr.reshape(1, -1))[0],
                    tc, ts, n_valid, th, fl,
                )
            n_valid = max(int(n), 1)
            Tp = _next_bucket(n_valid)
            dx, dz, dcr, dci = ox[:Tp], oz[:Tp], ocr[:Tp], oci[:Tp]
    if zero_threshold is None:
        ox, oz, ocr, oci, n = jitted["cleanup"](dx, dz, dcr, dci, n_valid)
    else:
        ox, oz, ocr, oci, n = jitted["cleanup_t"](dx, dz, dcr, dci, n_valid, th, fl)
    n_valid = int(n)
    Tp = _next_bucket(max(n_valid, 1))
    return ox[:Tp], oz[:Tp], ocr[:Tp], oci[:Tp], n_valid


@functools.lru_cache(maxsize=None)
def _jitted_noncon_check():
    jax, jx = _jx()

    def _check(x, z):
        adj = ~jx.anticommutes(x, z, x, z)
        return jx.check_noncontextual_adj(adj)

    return jax.jit(_check), jax.jit(jx.check_noncontextual_adj)


def is_noncontextual(x, z) -> Optional[bool]:
    """Device-resident noncontextuality check; returns None below the size
    threshold (caller falls back to the host adjacency + C++ dedup path).

    Only ONE byte crosses back from the device -- the host path's adjacency
    download alone is M^2 bools (seconds through a remote PJRT relay at
    M ~ 10^4, reference behaviour operators/base.py:1074-1088).
    """
    M, W = x.shape
    # the device check pays ~2 dispatch round trips; the packed C++ host
    # path handles mid sizes in tens of ms, so under 'auto' the device only
    # wins once the O(M^2) host adjacency work itself is the bottleneck
    # (an explicit backend='device' honors smaller operators)
    min_rows = 1024 if config.backend == "device" else 4096
    if M < min_rows or not config.use_device_io(
        M * M * W / config.host_adjacency_rate,
        up_bytes=M * (16 * W), down_bytes=8, n_syncs=2,
    ):
        return None
    kernel_stats.record("is_noncontextual", device=True)
    xd, zd = _to_dev(x), _to_dev(z)
    check_fused, check_adj = _jitted_noncon_check()
    # the XLA broadcast materialises TWO (M, M, 2W) uint32 intermediates
    # (x1&z2 and z1&x2): guard on the u32 word count, not the host u64 planes
    if 2 * (M * M * (2 * W) * 4) > (1 << 31):
        # the broadcast anticommutation intermediate would be multi-GB:
        # build the adjacency with the VMEM-tiled Pallas kernel
        from . import pallas_gf2

        adj = ~pallas_gf2.anticommutes_tiled(xd, zd, xd, zd)
        return bool(check_adj(adj))
    return bool(check_fused(xd, zd))


@functools.lru_cache(maxsize=None)
def _jitted_project():
    jax, jx = _jx()
    return jax.jit(jx.clifford_project_cleanup, static_argnames=())


def clifford_rotate_project(
    x, z, c,
    rotations: Sequence[Tuple[np.ndarray, np.ndarray, Optional[float]]],
    stab_x, stab_z, stab_signs,
    free_qubit_mask: np.ndarray,
    zero_threshold: float,
) -> Planes:
    """Fused flagship projection: Clifford rotations + stabilizer projection +
    cleanup in ONE device round trip (one upload, one download, one sync).

    The unfused path (perform_rotations -> commutes_termwise ->
    host sign flip -> cleanup) moves the full operator host<->device four
    times; on a remote-attached TPU the transfers dominate the flagship
    taper flow entirely.  Callers must have verified every rotation angle is
    Clifford (is_clifford_angle).

    Args:
        x, z, c: host uint64 planes + complex coefficients.
        rotations: (xr, zr, angle) with angle a pi/2 multiple (None = +1).
        stab_x, stab_z: uint64[S, w] single-qubit rotated stabilizer planes.
        stab_signs: float[S] eigenvalue assignments in {+1, -1, 0}.
        free_qubit_mask: bool[n_qubits], True at columns to keep.
        zero_threshold: cleanup threshold.

    Returns host planes with stabilized columns ZEROED (not deleted) --
    the caller deletes the columns, cf. reference projection/base.py:75-77.
    """
    import jax.numpy as jnp

    T, W64 = x.shape
    if config.mesh is not None and T >= config.mesh_threshold:
        from ..parallel import sharded

        out = sharded.clifford_rotate_project(
            x, z, c, rotations, stab_x, stab_z, stab_signs,
            free_qubit_mask, zero_threshold, config.mesh,
        )
        if out is not None:
            kernel_stats.record("clifford_rotate_project", device=True, mesh=True)
            return out
    kernel_stats.record("clifford_rotate_project", device=True)
    Tp = _next_bucket(T)
    dt = _coeff_dtype()
    rx, rz, ms, neg_x, neg_z, col_keep = projection_prep(
        rotations, stab_x, stab_z, stab_signs, free_qubit_mask, W64
    )
    jcr, jci = _coeff_to_dev(c, Tp)
    row = lambda a: _to_dev(a.reshape(1, -1))[0]
    ox, oz, ocr, oci, n = _jitted_project()(
        _to_dev(x, Tp), _to_dev(z, Tp), jcr, jci, T,
        jnp.asarray(rx), jnp.asarray(rz), jnp.asarray(ms),
        _to_dev(stab_x), _to_dev(stab_z),
        row(neg_x), row(neg_z), row(col_keep),
        jnp.asarray(zero_threshold, dt), _rel_floor(),
    )
    return _planes_from_dev(ox, oz, ocr, oci, int(n))


def stabilizer_masks(stab_x, stab_z, stab_signs, free_qubit_mask):
    """OR masks of the rotated single-qubit stabilizers, the ONE definition
    of the projection's sign/filter semantics (device, host-fused and native
    paths all consume it): (zmask, xmask) for the packed one-XOR commute
    filter, (neg_x, neg_z) for the -1-eigenvalue sign-flip parity (a 0
    assignment behaves as +1, reference base.py:67-72), and the packed
    free-column keep mask."""
    W = stab_x.shape[1]
    zmask = np.bitwise_or.reduce(stab_z, axis=0)
    xmask = np.bitwise_or.reduce(stab_x, axis=0)
    neg = np.real(np.asarray(stab_signs)) < 0
    if neg.any():
        neg_x = np.bitwise_or.reduce(stab_x[neg], axis=0)
        neg_z = np.bitwise_or.reduce(stab_z[neg], axis=0)
    else:
        neg_x = np.zeros(W, np.uint64)
        neg_z = np.zeros(W, np.uint64)
    col_keep = pack.pack_bits(np.asarray(free_qubit_mask).reshape(1, -1))[0]
    return zmask, xmask, neg_x, neg_z, col_keep


def projection_prep(rotations, stab_x, stab_z, stab_signs, free_qubit_mask, W64):
    """Shared host-side prep for the fused projection (single-device and
    mesh drivers MUST agree on these semantics -- dryrun asserts parity):
    packed Clifford rotation planes + pi/2 multiples, plus the
    ``stabilizer_masks`` sign/column masks."""
    rxs, rzs, ms = [], [], []
    for xr, zr, angle in rotations:
        m = is_clifford_angle(angle)
        assert m is not None, "fused projection requires Clifford angles"
        rxs.append(pack.to_u32(xr.reshape(1, -1))[0])
        rzs.append(pack.to_u32(zr.reshape(1, -1))[0])
        ms.append(m)
    W32 = 2 * W64
    rx = np.asarray(rxs, np.uint32).reshape(len(rxs), W32)
    rz = np.asarray(rzs, np.uint32).reshape(len(rzs), W32)
    _, _, neg_x, neg_z, col_keep = stabilizer_masks(
        stab_x, stab_z, stab_signs, free_qubit_mask
    )
    return rx, rz, np.asarray(ms, np.int32), neg_x, neg_z, col_keep


def expval(x, z, c, s_pack, amps) -> complex:
    """<psi|O|psi> with host/device dispatch (device above the size threshold).

    Under ``symmer_tpu.use_mesh`` and above ``config.mesh_threshold`` terms,
    the term axis shards over the mesh with a single psum (the multi-chip
    analog of the reference's parallelized expval, base.py:811-815)."""
    from . import state_core

    T, W = x.shape
    B = s_pack.shape[0]
    if config.mesh is not None and T >= config.mesh_threshold:
        from ..parallel import sharded

        out = sharded.expval(x, z, c, s_pack, amps, config.mesh)
        if out is not None:
            kernel_stats.record("expval", device=True, mesh=True)
            return out
    row_bytes = 16 * W + 16
    if not config.use_device_io(
        T * B * W / config.host_cleanup_rate,
        up_bytes=(T + B) * row_bytes, down_bytes=64, n_syncs=1,
    ):
        kernel_stats.record("expval", device=False)
        return state_core.expval(x, z, c, s_pack, amps)
    kernel_stats.record("expval", device=True)
    import jax

    # the kernel carries several (T, B) float planes; bound HBM by chunking
    # the term axis (expval is linear in the operator's terms) -- the chunk
    # results stay on device and one device_get syncs them all.  Both axes
    # are pow2-bucketed (padding rows carry zero coefficients / sit beyond
    # n_basis, contributing exactly 0), so every distinct (T, B) does NOT
    # trigger a fresh trace+compile -- the module's bucket convention
    Bp = _next_bucket(B)
    max_elems = 1 << 25
    if T * Bp > max_elems:
        # Tc may drop below the usual bucket floor for huge states: the HBM
        # bound must win (Tc is fixed for the whole loop, so it still costs
        # exactly one compile per (Tc, Bp))
        Tc = max(1, max_elems // Bp)
        ar, ai = _coeff_to_dev(amps, pad_rows=Bp)
        sd = _to_dev(s_pack, pad_rows=Bp)
        parts = []
        for t0 in range(0, T, Tc):
            t1 = min(T, t0 + Tc)
            cr, ci = _coeff_to_dev(c[t0:t1], pad_rows=Tc)
            parts.append(_jitted_expval()(
                _to_dev(x[t0:t1], pad_rows=Tc), _to_dev(z[t0:t1], pad_rows=Tc),
                cr, ci, sd, ar, ai, B
            ))
        host = jax.device_get(parts)
        return sum(_scalar_from_dev(p[0], p[1]) for p in host)

    Tp = _next_bucket(T)
    cr, ci = _coeff_to_dev(c, pad_rows=Tp)
    ar, ai = _coeff_to_dev(amps, pad_rows=Bp)
    re, im = _jitted_expval()(
        _to_dev(x, pad_rows=Tp), _to_dev(z, pad_rows=Tp), cr, ci,
        _to_dev(s_pack, pad_rows=Bp), ar, ai, B
    )
    re_h, im_h = jax.device_get((re, im))
    return _scalar_from_dev(re_h, im_h)


@functools.lru_cache(maxsize=None)
def _jitted_expval():
    import jax

    from . import jx_state

    def _ev(x, z, cr, ci, s, ar, ai, n_b):
        # jx_state.expval's contract requires a DEDUPLICATED state (its
        # windowed hash match pairs at most one row per side); user states
        # may carry duplicates, so dedup on device first, exactly as
        # _jitted_inner_product does
        s, ar, ai, n_b = jx_state.cleanup_state(s, ar, ai, n_b)
        return jx_state.expval(x, z, cr, ci, s, ar, ai, n_b)

    return jax.jit(_ev)


@functools.lru_cache(maxsize=None)
def _jitted_apply_state():
    import jax

    from . import jx_state

    def _apply(x, z, cr, ci, s, ar, ai, th, fl):
        bits, br, bi = jx_state.apply_to_ket(x, z, cr, ci, s, ar, ai)
        return jx_state.cleanup_state(bits, br, bi, bits.shape[0], th, rel_floor=fl)

    return jax.jit(_apply)


@functools.lru_cache(maxsize=None)
def _jitted_apply_bra():
    import jax

    from . import jx_state

    def _apply(s, ar, ai, x, z, cr, ci, th, fl):
        bits, br, bi = jx_state.apply_to_bra(s, ar, ai, x, z, cr, ci)
        return jx_state.cleanup_state(bits, br, bi, bits.shape[0], th, rel_floor=fl)

    return jax.jit(_apply)


@functools.lru_cache(maxsize=None)
def _jitted_inner_product():
    import jax

    from . import jx_state

    def _ip(s1, a1r, a1i, s2, a2r, a2i):
        # states may carry duplicate rows: dedup on device first (the sorted
        # merge pairs equal adjacent rows and needs at most one row per side)
        s1, a1r, a1i, n1 = jx_state.cleanup_state(s1, a1r, a1i, s1.shape[0])
        s2, a2r, a2i, n2 = jx_state.cleanup_state(s2, a2r, a2i, s2.shape[0])
        return jx_state.inner_product_sorted(s1, a1r, a1i, n1, s2, a2r, a2i, n2)

    return jax.jit(_ip)


def apply_bra(s_pack, amps, x, z, c, zero_threshold):
    """<psi|O (packed planes in, deduplicated packed bra out) with host/device
    dispatch -- the device path mirrors apply_state for the bra side
    (reference treats bra algebra as first-class, base.py:1800-1819)."""
    from . import state_core

    T, W = x.shape
    B = s_pack.shape[0]
    row_bytes = 16 * W + 16
    # the download moves the POST-dedup state: one bit plane + amplitude per
    # surviving basis state, bounded by min(T*B/4, 2^n) rows (same modest
    # 4x dedup assumption as multiply_cleanup -- estimating the pre-dedup
    # T*B product made the device path unreachable over slow transports,
    # defeating the kernel's whole point)
    out_rows = max(1, min(T * B // 4, 1 << min(W * 64, 62)))
    if not config.use_device_io(
        T * B * W / config.host_cleanup_rate,
        up_bytes=(T + B) * row_bytes,
        down_bytes=out_rows * (8 * W + 16),
        n_syncs=2,
    ):
        kernel_stats.record("apply_bra", device=False)
        bits, out = state_core.apply_to_bra(s_pack, amps, x, z, c)
        return state_core.cleanup_state(bits, out, zero_threshold)
    kernel_stats.record("apply_bra", device=True)
    cr, ci = _coeff_to_dev(c)
    ar, ai = _coeff_to_dev(amps)
    th = np.asarray(zero_threshold, _coeff_dtype())
    b_o, ar_o, ai_o, n = _jitted_apply_bra()(
        _to_dev(s_pack), ar, ai, _to_dev(x), _to_dev(z), cr, ci, th, _rel_floor()
    )
    n = int(n)
    import jax

    b_h, ar_h, ai_h = jax.device_get((b_o[:n], ar_o[:n], ai_o[:n]))
    bits = pack.from_u32(np.asarray(b_h))
    return bits, _merge_coeff_host(ar_h, ai_h)


def inner_product(s_bra, amp_bra, s_ket, amp_ket) -> complex:
    """<bra|ket> with host/device dispatch (bra amplitudes pre-conjugated,
    reference convention base.py:1800-1817)."""
    from . import state_core

    B1, W = s_bra.shape
    B2 = s_ket.shape[0]
    if not config.use_device((B1 + B2) * W * 16):
        kernel_stats.record("inner_product", device=False)
        return state_core.inner_product(s_bra, amp_bra, s_ket, amp_ket)
    kernel_stats.record("inner_product", device=True)
    a1r, a1i = _coeff_to_dev(amp_bra)
    a2r, a2i = _coeff_to_dev(amp_ket)
    re, im = _jitted_inner_product()(
        _to_dev(s_bra), a1r, a1i, _to_dev(s_ket), a2r, a2i
    )
    import jax

    re_h, im_h = jax.device_get((re, im))
    return _scalar_from_dev(re_h, im_h)


def apply_state(x, z, c, s_pack, amps, zero_threshold):
    """O|psi> (packed planes in, deduplicated packed state out) with
    host/device dispatch -- the device path never materialises the (T*B)
    product rows on the host (reference base.py:832-876 new_basis_action)."""
    from . import state_core

    T, W = x.shape
    B = s_pack.shape[0]
    row_bytes = 16 * W + 16
    # post-dedup download estimate (see apply_bra)
    out_rows = max(1, min(T * B // 4, 1 << min(W * 64, 62)))
    if not config.use_device_io(
        T * B * W / config.host_cleanup_rate,
        up_bytes=(T + B) * row_bytes,
        down_bytes=out_rows * (8 * W + 16),
        n_syncs=2,
    ):
        kernel_stats.record("apply_state", device=False)
        bits, out = state_core.apply_to_ket(x, z, c, s_pack, amps)
        return state_core.cleanup_state(bits, out, zero_threshold)
    kernel_stats.record("apply_state", device=True)
    cr, ci = _coeff_to_dev(c)
    ar, ai = _coeff_to_dev(amps)
    th = np.asarray(zero_threshold, _coeff_dtype())
    b_o, ar_o, ai_o, n = _jitted_apply_state()(
        _to_dev(x), _to_dev(z), cr, ci, _to_dev(s_pack), ar, ai, th, _rel_floor()
    )
    n = int(n)
    import jax

    b_h, ar_h, ai_h = jax.device_get((b_o[:n], ar_o[:n], ai_o[:n]))
    bits = pack.from_u32(np.asarray(b_h))
    return bits, _merge_coeff_host(ar_h, ai_h)
