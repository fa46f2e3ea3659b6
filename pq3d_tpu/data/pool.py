"""Shared spawn-pool machinery for the multi-worker batch loaders.

One place for the process-pool protocol used by both InstSegLoader and
UnifiedTaskLoader: a lazily-created, epoch-persistent spawn pool (fork
after XLA init can deadlock; spawn startup re-imports the module graph, so
paying it once per loader instead of once per epoch matters on this
1-core box), the dataset pickled once per worker via the initializer, and
an order-preserving bounded in-flight window so device-side backpressure
caps host memory.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, Tuple


class BatchPool:
    """Reusable spawn pool yielding ``worker_fn(*job)`` results in order."""

    def __init__(self, num_workers: int, initializer: Callable,
                 initargs: Tuple):
        self.num_workers = num_workers
        self._initializer = initializer
        self._initargs = initargs
        self._pool = None

    def _ensure(self):
        if self._pool is None:
            import concurrent.futures as cf
            import multiprocessing as mp
            self._pool = cf.ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context("spawn"),
                initializer=self._initializer, initargs=self._initargs)
        return self._pool

    def run(self, worker_fn: Callable, jobs: Iterable[Tuple]) -> Iterator:
        pool = self._ensure()
        window = self.num_workers + 2
        pending: deque = deque()
        for job in jobs:
            pending.append(pool.submit(worker_fn, *job))
            if len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass
