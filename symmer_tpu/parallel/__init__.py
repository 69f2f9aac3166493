"""Parallel execution layer.

The reference parallelises embarrassingly-parallel maps over OS processes or a
Ray cluster (symmer ``process_handler.py``).  On TPU the same workloads are
either (a) already vectorised inside a single XLA program (vmap/batched
kernels) or (b) sharded across a device mesh (see :mod:`symmer_tpu.parallel.mesh`).

``process`` is retained as an API-compatible singleton: ``@process.parallelize``
decorates a ``f(item, shared)`` function into ``f(iterable, shared)``.  Methods:

  - 'vectorised' (default): plain host loop -- the packed kernels make
    per-item work so cheap that process pools lose; heavy batched paths are
    vectorised at the kernel level instead.
  - 'mp': a multiprocessing pool (chunked, order-preserving) for coarse
    host-side workloads.
  - 'single_thread': alias of the loop, for parity with the reference.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable

from .mesh import get_mesh, mesh_context, shard_terms  # noqa: F401


class ProcessHandler:
    method = "vectorised"
    verbose = False

    def __init__(self):
        self.n_logical_cores = os.cpu_count()

    def _process_loop(self, func, iterable, shared):
        return [func(i, shared) for i in iterable]

    def _process_mp(self, func, iterable, shared):
        from concurrent.futures import ProcessPoolExecutor

        items = list(iterable)
        with ProcessPoolExecutor(max_workers=self.n_logical_cores) as ex:
            return list(ex.map(func, items, [shared] * len(items)))

    def parallelize(self, func: Callable):
        def wrapper(iterable: Iterable, shared):
            if self.method in ("vectorised", "single_thread"):
                return self._process_loop(func, iterable, shared)
            elif self.method == "mp":
                return self._process_mp(func, iterable, shared)
            raise ValueError(
                f"Invalid processing method {self.method}, "
                "must be vectorised, mp or single_thread."
            )

        return wrapper


process = ProcessHandler()
