"""lz4net varint-chunk stream format.

Wire format (reference `Legacy/LZ4Stream.cs:209-295`): each chunk is
``varint flags, varint originalLength, [varint compressedLength], payload``
where varints are LSB-first 7-bit groups with a continuation bit, flag bit 0
= compressed, bit 1 = high-compression marker, bits 2-4 = passes (must be 0).
Incompressible chunks are stored raw (no compressedLength field).
"""

from __future__ import annotations

import io

from ..block import api as block_api
from ..block.hostref import LZ4Error
from ..constants import LZ4Level
from ..constants import _as_bytes

__all__ = ["LegacyStreamWriter", "LegacyStreamReader", "encode", "decode"]

_FLAG_COMPRESSED = 0x01
_FLAG_HC = 0x02
_FLAG_PASSES = 0x1C


def _write_varint(sink, value: int):
    while True:
        b = value & 0x7F
        value >>= 7
        sink.write(bytes([b | (0x80 if value else 0)]))
        if not value:
            return


def _read_varint(read) -> int | None:
    """None on clean EOF at a chunk boundary."""
    shift = 0
    value = 0
    first = True
    while True:
        b = read(1)
        if not b:
            if first:
                return None
            raise LZ4Error("truncated varint")
        first = False
        value |= (b[0] & 0x7F) << shift
        if not (b[0] & 0x80):
            return value
        shift += 7
        if shift > 63:
            raise LZ4Error("varint too long")


class LegacyStreamWriter:
    """Chunked lz4net-format compressor over a ``write(bytes)`` sink."""

    def __init__(
        self,
        sink,
        high_compression: bool = False,
        block_size: int = 1024 * 1024,
        backend: str = "auto",
    ):
        self._sink = sink
        self._level = (
            int(LZ4Level.L09_HC) if high_compression else int(LZ4Level.L00_FAST)
        )
        self._hc = high_compression
        self._block_size = block_size
        self._backend = backend
        self._pending = bytearray()
        self._closed = False

    def _write_chunk(self, raw: bytes):
        comp = block_api.encode(raw, level=self._level, backend=self._backend)
        compressed = comp is not None and len(comp) < len(raw)
        flags = (_FLAG_COMPRESSED if compressed else 0) | (
            _FLAG_HC if self._hc else 0
        )
        _write_varint(self._sink, flags)
        _write_varint(self._sink, len(raw))
        if compressed:
            _write_varint(self._sink, len(comp))
            self._sink.write(comp)
        else:
            self._sink.write(raw)

    def write(self, data) -> int:
        if self._closed:
            raise ValueError("writer is closed")
        data = _as_bytes(data)
        self._pending += data
        while len(self._pending) >= self._block_size:
            chunk = bytes(self._pending[: self._block_size])
            del self._pending[: self._block_size]
            self._write_chunk(chunk)
        return len(data)

    def flush(self):
        if self._pending:
            chunk = bytes(self._pending)
            self._pending.clear()
            self._write_chunk(chunk)
        if hasattr(self._sink, "flush"):
            self._sink.flush()

    def close(self):
        if self._closed:
            return
        if self._pending:
            chunk = bytes(self._pending)
            self._pending.clear()
            self._write_chunk(chunk)
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class LegacyStreamReader:
    """Chunked lz4net-format decompressor over a ``read(n)`` source."""

    def __init__(self, source, backend: str = "auto"):
        self._source = source
        self._backend = backend
        self._buffer = bytearray()
        self._eof = False

    def _read_exact(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            chunk = self._source.read(n - len(out))
            if not chunk:
                break
            out += chunk
        return bytes(out)

    def _next_chunk(self) -> bool:
        if self._eof:
            return False
        flags = _read_varint(self._source.read)
        if flags is None:
            self._eof = True
            return False
        if flags & _FLAG_PASSES:
            raise LZ4Error("multi-pass legacy chunks are not supported")
        compressed = bool(flags & _FLAG_COMPRESSED)
        original = _read_varint(self._source.read)
        if original is None:
            raise LZ4Error("truncated legacy chunk header")
        stored = (
            _read_varint(self._source.read) if compressed else original
        )
        if stored is None:
            raise LZ4Error("truncated legacy chunk header")
        if stored > original:
            raise LZ4Error("corrupted legacy chunk (stored > original)")
        # allocation-amplification guards (the frame reader's analog,
        # frame/reader.py): LZ4's worst-case expansion is < 256x, so a
        # compressed chunk claiming more is provably corrupt; and no
        # single chunk may demand a multi-GB buffer from a 12-byte
        # header (lz4net writers emit MB-scale chunks)
        if compressed and original > stored * 255 + 64:
            raise LZ4Error(
                "corrupted legacy chunk (impossible expansion ratio)"
            )
        if original > (1 << 30) or stored > (1 << 30):
            raise LZ4Error("legacy chunk exceeds the 1 GiB sanity bound")
        payload = self._read_exact(stored)
        if len(payload) < stored:
            raise LZ4Error("truncated legacy chunk payload")
        if compressed:
            raw = block_api.decode(
                payload, target_length=original, backend=self._backend
            )
        else:
            raw = payload
        self._buffer += raw
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            while self._next_chunk():
                pass
            out = bytes(self._buffer)
            self._buffer.clear()
            return out
        while len(self._buffer) < n and self._next_chunk():
            pass
        out = bytes(self._buffer[:n])
        del self._buffer[:n]
        return out

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def encode(
    data,
    high_compression: bool = False,
    block_size: int = 1024 * 1024,
    backend: str = "auto",
) -> bytes:
    """One-shot legacy-stream compression (reference `LZ4Legacy.Encode`)."""
    sink = io.BytesIO()
    w = LegacyStreamWriter(sink, high_compression, block_size, backend)
    w.write(_as_bytes(data))
    w.close()
    return sink.getvalue()


def decode(data, backend: str = "auto") -> bytes:
    """One-shot legacy-stream decompression (reference `LZ4Legacy.Decode`)."""
    r = LegacyStreamReader(io.BytesIO(_as_bytes(data)), backend)
    return r.read()
