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

    async def _drain(self):
        data = self._buf.getvalue()
        if data:
            self._buf.seek(0)
            self._buf.truncate()
            await self._sink.write(data)

    async def write(self, data) -> int:
        loop = asyncio.get_running_loop()
        n = await loop.run_in_executor(None, self._writer.write, data)
        await self._drain()
        return n

    async def close(self):
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, self._writer.close)
        await self._drain()

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        await self.close()
        return False


class AsyncFrameReader:
    """Async streaming decompressor over an object with ``async read(n)``."""

    def __init__(self, source, dictionary: bytes = b"", backend: str = "auto"):
        self._source = source
        self._backend = backend
        self._dictionary = dictionary
        self._reader = None
        self._chunks: list[bytes] = []

    async def _ensure(self):
        if self._reader is None:
            import io

            data = await self._source.read(-1)
            self._reader = _api.FrameReader(
                io.BytesIO(data), dictionary=self._dictionary, backend=self._backend
            )

    async def read(self, n: int = -1) -> bytes:
        await self._ensure()
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, self._reader.read, n)

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        return False
