"""Shared persistent thread pools for the block-parallel host paths.

The threaded frame/block paths (frame compress/decompress, batched host
encode) previously created a fresh ``ThreadPoolExecutor`` per call; thread
spawn costs ~0.6 ms per call on this VM class — ~8% of a 16 MiB threaded
frame decode (measured, PERFORMANCE.md round 5).  Executors here persist
for the process lifetime, keyed by worker count (ctypes codec calls drop
the GIL, so the same pool serves any payload size).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

_pools: dict[int, ThreadPoolExecutor] = {}
_lock = threading.Lock()


def shared_pool(n_workers: int) -> ThreadPoolExecutor:
    """Process-lifetime executor with ``n_workers`` threads (n_workers >= 2)."""
    pool = _pools.get(n_workers)
    if pool is None:
        with _lock:
            pool = _pools.get(n_workers)
            if pool is None:
                pool = ThreadPoolExecutor(n_workers)
                _pools[n_workers] = pool
    return pool
