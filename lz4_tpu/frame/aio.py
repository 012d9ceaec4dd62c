"""Async frame facades.

The reference generates a full async API surface from its sync templates
(`Frames/LZ4FrameWriter.async.cs`, SURVEY.md §1-B item 3).  Python's analog:
asyncio wrappers that run the (CPU/TPU-bound) codec in the default executor
so event loops stay responsive.
"""

from __future__ import annotations

import asyncio
import functools

from . import api as _api


async def compress(data, settings=None, backend: str = "auto", **kw) -> bytes:
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        None,
        functools.partial(
            _api.compress, data, settings=settings, backend=backend, **kw
        ),
    )


async def decompress(data, settings=None, backend: str = "auto", **kw) -> bytes:
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        None,
        functools.partial(
            _api.decompress, data, settings=settings, backend=backend, **kw
        ),
    )


class AsyncFrameWriter:
    """Async streaming compressor over an object with ``async write()``."""

    def __init__(self, sink, settings=None, backend: str = "auto"):
        import io

        self._buf = io.BytesIO()
        self._writer = _api.FrameWriter(self._buf, settings, backend=backend)
        self._sink = sink
        # serialize write/close: a second task's encoder appending to
        # _buf between another task's getvalue() and truncate() would be
        # silently DISCARDED (corrupt frame, no error) — round-5 review
        self._lock = asyncio.Lock()

    async def _drain(self):
        data = self._buf.getvalue()
        if data:
            self._buf.seek(0)
            self._buf.truncate()
            await self._sink.write(data)

    async def write(self, data) -> int:
        async with self._lock:
            loop = asyncio.get_running_loop()
            n = await loop.run_in_executor(None, self._writer.write, data)
            await self._drain()
            return n

    async def close(self):
        async with self._lock:
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, self._writer.close)
            await self._drain()

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        await self.close()
        return False


class _SyncOverAsyncSource:
    """Blocking ``read(n)`` adapter over an async source.

    FrameReader pulls synchronously; each pull is forwarded to the async
    source on the event loop via ``run_coroutine_threadsafe``.  Must only be
    called from a worker thread (never the loop thread itself).
    """

    def __init__(self, source, loop):
        self._source = source
        self._loop = loop
        self._buf = b""

    def read(self, n: int) -> bytes:
        if self._buf:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        fut = asyncio.run_coroutine_threadsafe(self._source.read(n), self._loop)
        chunk = bytes(fut.result() or b"")
        if len(chunk) > n:  # over-returning source: keep the excess buffered
            self._buf = chunk[n:]
            chunk = chunk[:n]
        return chunk


class AsyncFrameReader:
    """Async streaming decompressor over an object with ``async read(n)``.

    Truly incremental: compressed bytes are pulled from the async source one
    block at a time as output is consumed (the reference's async frame reader
    behaves the same way, `Frames/LZ4FrameReader.async.cs`) — unbounded
    streams work in O(block size) memory.
    """

    def __init__(self, source, dictionary: bytes = b"", backend: str = "auto"):
        self._source = source
        self._backend = backend
        self._dictionary = dictionary
        self._reader = None

    def _ensure(self, loop):
        if self._reader is None:
            self._reader = _api.FrameReader(
                _SyncOverAsyncSource(self._source, loop),
                dictionary=self._dictionary,
                backend=self._backend,
            )

    async def read(self, n: int = -1) -> bytes:
        loop = asyncio.get_running_loop()
        self._ensure(loop)
        return await loop.run_in_executor(None, self._reader.read, n)

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        return False
