"""Global configuration for symmer-tpu.

The reference (symmer) scatters per-class strategy attributes around the code
base (e.g. ``process.method``, ``PauliwordOp.sigfig``); here we centralise the
knobs that govern *where* and *how* the symplectic kernels execute.

Backends
--------
``host``    packed-uint64 numpy kernels (fast for tiny operators -- XLA
            dispatch latency dominates below ~10^4 term-words).
``device``  jitted XLA/Pallas kernels on the default JAX backend (TPU).
``auto``    pick per-call based on problem size (term count x word count).

Precision
---------
Coefficients follow the dtype of the arrays the user supplies.  Tests enable
float64 (via ``jax.config.update('jax_enable_x64', True)`` in ``enable_x64``)
for 1e-10 energy parity with the reference; the benchmark path uses complex64
on TPU where f64 is software-emulated.
"""
from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass, field


@dataclass
class SymmerTPUConfig:
    # 'auto' | 'host' | 'device'
    backend: str = "auto"
    # number of term-words above which 'auto' dispatches to the device path
    device_threshold: int = 1 << 16
    # number of significant figures when printing operators/states
    sigfig: int = 3
    # zero threshold used by cleanup when not explicitly specified
    zero_threshold: float = 1e-15
    # use exact multi-word sort keys in the explicit device cleanup instead
    # of 128-bit hashed keys (slower, but collision-free by construction).
    # Applies to PauliwordOp.cleanup's device path with plain coefficient
    # planes; the fused product/rotation cleanups and the extended
    # (double-float) mode always use the hashed grouping.
    exact_cleanup_keys: bool = False
    # |angle*2/pi - round(...)| below this counts as a Clifford rotation
    # (batched into the term-count-preserving scan / fused projection).
    # 1e-10 absorbs accumulated f64 rounding of exact multiples while still
    # treating genuinely different angles (e.g. float32(pi/2), 4e-8 off) as
    # non-Clifford; raise it if your angles come from f32 sources.
    clifford_angle_tol: float = 1e-10
    # optional jax.sharding.Mesh (set via symmer_tpu.use_mesh): large operator
    # kernels shard the term axis over it and the noncontextual brute-force
    # search shards the assignment axis; None = single-device execution
    mesh: object = None
    # minimum term count before a mesh-sharded kernel is preferred over the
    # single-device path (below this, collective latency dominates)
    mesh_threshold: int = 1 << 15
    # route large anticommutation/adjacency matrices through the Pallas
    # VMEM-tiled kernel (kernels/pallas_gf2.py) instead of the XLA broadcast;
    # the XLA path materialises the (M1, M2, W) broadcast in HBM, the Pallas
    # kernel streams (256, 256) output tiles through VMEM
    pallas_anticommutes: bool = False
    # host brute-force search: nu-assignments evaluated per chunk of this many
    # rows, so forcing backend='host' on a large search keeps memory bounded
    brute_force_host_chunk: int = 1 << 20
    # float32 device path only: floor the cleanup threshold at
    # rel * max|coeff| so cancellation residue (O(eps32 * |c|) ~ 1e-7
    # relative) is dropped even though the absolute threshold (1e-15)
    # is below f32 resolution.  Set to 0.0 to disable the floor.
    f32_threshold_rel_floor: float = 2e-6
    # device coefficient precision on float32 backends (TPU):
    #   'extended'  double-float [hi, lo] planes (~49 mantissa bits, error-
    #               free transformations, jx_df) -- 1e-10 energy parity ON
    #               the chip at ~2-3x arithmetic cost on memory-bound kernels
    #   'f32'       plain float32 planes (fastest; ~1e-7 relative residue)
    # ignored when the backend supports native f64 (CPU with x64 enabled)
    device_precision: str = "extended"
    # what 'extended' precision means on a CPU backend WITHOUT x64 enabled:
    #   'x64'  (production default) auto-enable x64 and run native float64 --
    #          CPU double-float is strictly worse (XLA:CPU FMA contraction
    #          floors df_mul at ~1e-7; long df chains compile superlinearly)
    #   'df'   keep the double-float emulation (diagnostic/parity testing of
    #          the TPU df kernels on a CPU host)
    cpu_extended_mode: str = "x64"
    # extended mode's cancellation-residue floor: double-float segment sums
    # leave O(u_df * |c|max) ~ 4e-15 relative residue; the floor drops it the
    # same way f32_threshold_rel_floor does for plain f32
    extended_threshold_rel_floor: float = 1e-12
    # largest qubit count for which QubitSubspaceManager's auto-reference
    # uses the exact on-chip Lanczos (utils.exact_gs_energy_device) instead
    # of DMRG when an accelerator is attached; 18 qubits = a 1 MiB-amplitude
    # statevector and a diagonal table comfortably inside the 2 GiB budget
    lanczos_ref_max_qubits: int = 18
    # transport-aware auto dispatch: when True, host-in/host-out kernel calls
    # compare an estimated host time against measured device round-trip cost
    # (kernels/transport.py probe) instead of the fixed element-count
    # threshold -- essential on remote-attached chips where a sync costs
    # ~30 ms and bandwidth can be tens of MB/s
    transport_aware: bool = True
    # calibrated host-kernel throughputs for the transport-aware estimates
    # (conservative defaults for one modern core; env-tunable deployments can
    # overwrite the attributes directly)
    host_adjacency_rate: float = 4e8   # native qwc/anticommutes pair-words/s
    host_cleanup_rate: float = 3e7     # packed cleanup words/s
    host_rotate_rate: float = 4e7      # rotate+cleanup words/s per rotation (native C++)
    host_dense_rate: float = 5e8       # dense float contraction MACs/s (BLAS)
    # extra env-derived switches
    _x64_enabled: bool = field(default=False, repr=False)

    def use_device(self, work_items: int) -> bool:
        if self.backend == "device":
            return True
        if self.backend == "host":
            return False
        return work_items >= self.device_threshold

    def use_device_io(self, host_s: float, up_bytes: float, down_bytes: float,
                      n_syncs: int = 1, dev_s: float = 0.0) -> bool:
        """Auto dispatch for host-in/host-out calls: device wins only when the
        measured transport cost + device compute beats the host estimate."""
        if self.backend == "device":
            return True
        if self.backend == "host":
            return False
        if not self.transport_aware:
            return host_s > 5e-3
        # cheap short-circuit: no transport is faster than ~50 us of dispatch
        # latency, so a sub-millisecond host job never needs the (lazily
        # probed, potentially JAX-initialising) transport profile at all
        if host_s < n_syncs * 5e-5:
            return False
        from .kernels import transport

        p = transport.profile()
        return p.device_time(up_bytes, down_bytes, n_syncs, dev_s) < host_s


config = SymmerTPUConfig()


@contextlib.contextmanager
def use_mesh(mesh=None, n_devices: int = None, axis_name: str = "terms"):
    """Route large operator kernels through a device mesh within the block.

    ``with symmer_tpu.use_mesh():`` shards over all available devices;
    pass an explicit ``jax.sharding.Mesh`` or ``n_devices`` to restrict.
    The reference's analogue is the ``process.method`` switch
    (symmer process_handler.py:15-23) -- here the "cluster" is a TPU mesh
    and the collectives ride ICI instead of a Ray object store.
    """
    if mesh is None:
        from .parallel.mesh import get_mesh

        mesh = get_mesh(n_devices, axis_name)
    prev = config.mesh
    config.mesh = mesh
    try:
        yield mesh
    finally:
        config.mesh = prev


def enable_x64(enable: bool = True) -> None:
    """Enable float64/complex128 inside JAX (needed for 1e-10 energy parity).

    Must be called before any JAX computation is traced. Tests call this from
    conftest; library users on TPU will typically leave x64 off and work in
    complex64 for speed.
    """
    import jax

    jax.config.update("jax_enable_x64", enable)
    config._x64_enabled = enable


def _accelerator_plugin_registered() -> bool:
    """Whether a non-CPU PJRT backend factory is registered, WITHOUT
    initializing any backend (plugin registration -- e.g. a sitecustomize
    hook loading a TPU plugin -- populates the factory table at import time;
    initialization only happens on first use).

    Primary probe is the factory registry (private: ``jax._src.xla_bridge.
    _backend_factories``; its presence is pinned by
    tests/test_io_profiling.py::test_accelerator_probe_attribute so a JAX
    rename fails loudly in CI instead of silently changing behaviour).  If
    the attribute ever disappears, fall back to PUBLIC signals only --
    installed ``jax_plugins`` entry points or a non-CPU ``JAX_PLATFORMS`` --
    so plain CPU processes keep the compile cache (and its AOT-loader log
    spam) disabled rather than conservatively re-enabling it."""
    try:
        from jax._src import xla_bridge

        factories = xla_bridge._backend_factories
    except (ImportError, AttributeError):
        factories = None
    if factories is not None:
        return any(
            name not in ("cpu", "interpreter") for name in factories
        )
    try:
        from importlib.metadata import entry_points

        if list(entry_points(group="jax_plugins")):
            return True
    except Exception:
        pass
    want = os.environ.get("JAX_PLATFORMS", "")
    return any(p and p not in ("cpu", "interpreter") for p in want.split(","))


def enable_compile_cache(cache_dir: str = None, min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/symmer_tpu_jax``); no-op on CPU-only processes.  On
    remote-attached TPUs a cold compile of the extended-precision kernels
    runs minutes; with the cache enabled every subsequent process starts
    warm.  Returns the directory used ('' when skipped).  Safe to call at
    any time (affects compiles traced afterwards)."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "symmer_tpu_jax"
        )
    # The cache exists for ACCELERATOR compiles (a remote TPU compile of the
    # extended-precision kernels runs minutes); XLA:CPU compiles take seconds
    # AND the XLA:CPU AOT loader spams machine-feature error logs even for
    # same-host entries (its validator rejects tuning pseudo-features like
    # +prefer-no-scatter that never appear in host cpuinfo), so CPU backends
    # skip persistence entirely.  The platform is read from configuration
    # (env / jax.config), NOT jax.default_backend(): that call
    # force-initializes the backend, which would break the documented
    # multi-host ordering (distributed_init runs before any backend init).
    platforms = (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS", "")
        or ""
    )
    if platforms.split(",")[0] == "cpu":
        return ""
    if not platforms and not _accelerator_plugin_registered():
        # nothing configured AND no accelerator plugin registered: this is a
        # plain CPU-only process -- same skip as an explicit 'cpu' config
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return cache_dir


if os.environ.get("SYMMER_TPU_X64", "0") == "1":  # pragma: no cover
    enable_x64(True)
