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
