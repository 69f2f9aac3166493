"""Device-mesh management and term-axis sharding.

The reference has no inter-worker communication: Ray/multiprocessing simply
scatter-gathers chunks (symmer ``process_handler.py:25-91``).  The TPU-native
replacement places the packed symplectic planes on a 1-D ``jax.sharding.Mesh``
over the *term* axis -- XLA then inserts the ICI collectives (all-gathers for
the cleanup sort, psums for reductions) automatically.

On the noncontextual brute-force solve the mesh is instead laid over the
2^|G| nu-assignment axis (see operators/noncontextual_op.py), the natural
multi-chip fan-out identified in SURVEY §2.3.
"""
from __future__ import annotations

import contextlib
import functools
from typing import Optional


@functools.lru_cache(maxsize=None)
def get_mesh(n_devices: Optional[int] = None, axis_name: str = "terms"):
    """A 1-D mesh over up to n_devices (default: all available)."""
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_terms(arr, mesh=None, axis_name: str = "terms"):
    """Place an array on the mesh, sharded along axis 0 (the term axis)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(arr, mesh=None, axis_name: str = "terms"):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    return jax.device_put(arr, NamedSharding(mesh, P()))


@contextlib.contextmanager
def mesh_context(n_devices: Optional[int] = None, axis_name: str = "terms"):
    mesh = get_mesh(n_devices, axis_name)
    with mesh:
        yield mesh


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> int:
    """Initialise multi-host (DCN) execution; returns the global device count.

    The multi-host analog of the reference's Ray/SLURM cluster recipe
    (``/root/reference/docs/source/HPC.rst``): one Python process per host,
    each seeing its local chips; after initialisation ``jax.devices()``
    spans every host and ``symmer_tpu.use_mesh()`` builds the global mesh, so
    the sharded kernels run unchanged with the exchange collectives riding
    ICI within a slice and DCN across slices.

    On managed TPU pods (GKE/queued resources) every argument is discovered
    from the environment -- call ``symmer_tpu.distributed_init()`` with no
    arguments at the top of the per-host script.  For manual clusters pass
    ``coordinator_address='host0:8476'``, ``num_processes`` and
    ``process_id`` explicitly (forwarded to ``jax.distributed.initialize``,
    which this wraps).  Single-process environments (no coordinator, one
    host) skip initialisation and return the local device count -- the call
    is safe to leave in single-host scripts.
    """
    import jax

    explicit = coordinator_address is not None or (num_processes or 1) > 1
    if explicit or _multihost_env():
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
        except Exception:
            if explicit:
                raise  # a requested cluster that cannot form is an error
            # auto-detection found launcher-ish env vars but no usable
            # coordinator: treat as single-process (safe no-op contract)
    get_mesh.cache_clear()  # meshes must span the (possibly new) device set
    return len(jax.devices())


def _multihost_env() -> bool:
    """True when a managed multi-host launcher's env is present."""
    import os

    return any(
        os.environ.get(k)
        for k in (
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
        )
    )
