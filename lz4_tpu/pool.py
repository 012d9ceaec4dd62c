"""Shared persistent thread pools for the block-parallel host paths.

The threaded frame/block paths (frame compress/decompress, batched host
encode) previously created a fresh ``ThreadPoolExecutor`` per call; thread
spawn costs ~0.6 ms per call on this VM class — ~8% of a 16 MiB threaded
frame decode (measured, PERFORMANCE.md round 5).  Executors here persist
for the process lifetime, keyed by worker count (ctypes codec calls drop
the GIL, so the same pool serves any payload size).

Two lifetime rules (round-5 review findings):

- ``map_all`` ALWAYS joins every submitted task before returning or
  unwinding.  The codec workers write through raw buffer ADDRESSES (zero
  copy), so an exception must not free the target buffer while workers
  are still running — a scoped ``with ThreadPoolExecutor(...)`` used to
  guarantee that join via shutdown(wait=True); the shared pools guarantee
  it here instead.
- The pool registry clears itself in forked children: a child inherits
  executor objects whose worker THREADS do not exist, so reusing them
  would deadlock the first threaded call.  Clearing lets the child lazily
  build fresh pools.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor, wait

_pools: dict[int, ThreadPoolExecutor] = {}
_lock = threading.Lock()

def _after_fork_in_child():
    # a child inherits (a) executors whose worker threads died with the
    # fork and (b) possibly a LOCKED _lock if another thread was inside
    # shared_pool() at fork time — reset both so the child can lazily
    # build fresh pools
    global _lock
    _lock = threading.Lock()
    _pools.clear()


if hasattr(os, "register_at_fork"):  # POSIX
    os.register_at_fork(after_in_child=_after_fork_in_child)


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


def map_all(n_workers: int, fn, items):
    """Run ``fn`` over ``items`` on the shared pool and return the results
    in order.  On ANY failure, cancels what has not started, JOINS every
    running task, then re-raises — see the module docstring for why the
    join is load-bearing."""
    ex = shared_pool(n_workers)
    futs = [ex.submit(fn, it) for it in items]
    try:
        return [f.result() for f in futs]
    except BaseException:
        for f in futs:
            f.cancel()
        wait(futs)
        raise
