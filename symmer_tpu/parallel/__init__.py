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
from .distributed import distributed_cleanup  # noqa: F401


class ProcessHandler:
    method = "vectorised"
    verbose = False

    def __init__(self):
        self.n_logical_cores = os.cpu_count()

    def _process_loop(self, func, iterable, shared):
        return [func(i, shared) for i in iterable]

    def prepare_chunks(self, iterable):
        """Split an iterable into at most ``n_logical_cores`` chunks
        (API parity with reference process_handler.py:25-33)."""
        items = list(iterable)
        if not items:
            return
        self.n_chunks = min(len(items), self.n_logical_cores)
        chunk_size = -(-len(items) // self.n_chunks)
        for i in range(0, len(items), chunk_size):
            yield items[i : i + chunk_size]

    def _process_mp(self, func, iterable, shared):
        """Fork-based chunked pool with order restoration.

        Fork (not spawn) so locally-defined decorated functions work without
        pickling, exactly as the reference's mp backend
        (symmer process_handler.py:64-91).
        """
        import multiprocessing as mp

        items = list(iterable)
        if not items:
            return []
        ctx = mp.get_context("fork")
        n_chunks = min(len(items), self.n_logical_cores)
        chunk_size = -(-len(items) // n_chunks)
        chunks = [
            items[i : i + chunk_size] for i in range(0, len(items), chunk_size)
        ]
        queue = ctx.Queue(len(chunks))

        def worker(chunk, order):
            queue.put((order, [func(i, shared) for i in chunk]))

        procs = []
        for order, chunk in enumerate(chunks):
            p = ctx.Process(target=worker, args=(chunk, order))
            p.start()
            procs.append(p)
        data = [queue.get() for _ in range(len(chunks))]
        for p in procs:
            p.join()
        _, data = zip(*sorted(data))
        return [a for b in data for a in b]

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
