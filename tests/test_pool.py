"""Shared-pool lifetime semantics (round-5 review findings).

The threaded codec paths write caller/result buffers through RAW
addresses, so the pool layer must (a) join every running worker before an
exception unwinds — the scoped-executor guarantee the shared pools
replaced — and (b) not hand a forked child an executor whose worker
threads died with the fork.
"""

import threading
import time

import pytest

from lz4_tpu import pool as P


def test_map_all_joins_running_workers_before_raising():
    started = threading.Barrier(4, timeout=5)
    finished = []

    def task(i):
        if i == 0:
            started.wait()
            raise ValueError("boom")
        started.wait()
        time.sleep(0.05)  # still running when task 0's error surfaces
        finished.append(i)

    with pytest.raises(ValueError):
        P.map_all(4, task, range(4))
    # the join-before-unwind guarantee: every started worker completed
    # BEFORE map_all re-raised (no background writer outlives the call)
    assert sorted(finished) == [1, 2, 3]


def test_map_all_returns_in_order():
    assert P.map_all(3, lambda x: x * x, range(7)) == [
        0, 1, 4, 9, 16, 25, 36
    ]


def test_shared_pool_reused_and_fork_hook_registered():
    a = P.shared_pool(3)
    assert P.shared_pool(3) is a
    # the registry must clear in forked children (inherited executors have
    # no worker threads); the hook is registered at import on POSIX
    import os

    assert hasattr(os, "register_at_fork")
    # simulate the child side: after clearing, a FRESH pool is built
    P._pools.clear()
    b = P.shared_pool(3)
    assert b is not a
    assert P.map_all(3, lambda x: x + 1, [1, 2]) == [2, 3]


def test_threaded_decompress_malformed_block_raises_cleanly():
    """A malformed block among several valid ones in a threaded frame
    decode must raise a typed error with every worker joined (the
    use-after-free regression: workers write the fresh result object
    through its raw address)."""
    import struct

    from lz4_tpu import frame, native
    from lz4_tpu.frame.descriptor import EncoderSettings

    if not native.available():
        pytest.skip("native engine unavailable")
    data = (b"abcdefgh" * 40000)[: 5 * (1 << 16)]
    s = EncoderSettings(chain_blocks=False, block_size=1 << 16)
    blob = bytearray(frame.compress(data, settings=s, workers=8))
    # find the second block's length word and replace its payload with
    # 0xFF bytes: token 0xFF demands a literal run past the input end —
    # deterministically malformed
    pos = 7  # frame header (no content size): magic 4 + FLG/BD/HC 3
    (w0,) = struct.unpack_from("<I", blob, pos)
    first_len = w0 & 0x7FFFFFFF
    pos2 = pos + 4 + first_len
    (w1,) = struct.unpack_from("<I", blob, pos2)
    blk_len = w1 & 0x7FFFFFFF
    assert not (w1 >> 31), "expected a compressed block"
    blob[pos2 + 4 : pos2 + 4 + blk_len] = b"\xff" * blk_len
    for _ in range(5):  # repeat: shake any scheduling dependence
        with pytest.raises(Exception) as ei:
            frame.decompress(bytes(blob), workers=8)
        assert "LZ4" in type(ei.value).__name__ or "lz4" in str(ei.value), (
            ei.value
        )
    # the pool remains healthy for subsequent work
    assert frame.decompress(frame.compress(data, settings=s, workers=8),
                            workers=8) == data


def test_concurrent_threaded_frame_calls():
    """The shared pools serve CONCURRENT frame calls from multiple user
    threads: results must be correct and isolated (per-call scratch, no
    cross-talk through the reused executors)."""
    import threading

    from lz4_tpu import frame, native
    from lz4_tpu.frame.descriptor import EncoderSettings

    if not native.available():
        pytest.skip("native engine unavailable")
    s = EncoderSettings(chain_blocks=False, block_size=1 << 16)
    payloads = [
        (bytes([65 + i]) * 150_000 + bytes(range(256)) * ((i + 1) * 40))
        for i in range(6)
    ]
    errors = []

    def worker(i):
        try:
            for _ in range(3):
                blob = frame.compress(payloads[i], settings=s, workers=4)
                assert frame.decompress(blob, workers=4) == payloads[i]
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append((i, repr(e)))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert not errors, errors
