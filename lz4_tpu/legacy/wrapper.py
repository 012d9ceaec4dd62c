"""lz4net "wrap" blob format: 8-byte header [u32 originalLength][u32
storedLength] followed by the (possibly compressed) payload; stored when
compression does not help (reference `LZ4Wrapper.cs:10-100`)."""

from __future__ import annotations

import struct

from ..block import api as block_api
from ..block.hostref import LZ4Error
from ..constants import LZ4Level
from ..constants import _as_bytes

__all__ = ["wrap", "wrap_hc", "unwrap"]

_HEADER = 8


def _wrap(data: bytes, level: int, backend: str) -> bytes:
    n = len(data)
    if n == 0:
        return bytes(_HEADER)
    comp = block_api.encode(data, level=level, backend=backend)
    if comp is None or len(comp) >= n:
        return struct.pack("<II", n, n) + data
    return struct.pack("<II", n, len(comp)) + comp


def wrap(data, backend: str = "auto") -> bytes:
    """Compress + wrap (reference `LZ4Legacy.Wrap`)."""
    return _wrap(_as_bytes(data), int(LZ4Level.L00_FAST), backend)


def wrap_hc(data, backend: str = "auto") -> bytes:
    """High-compression wrap (reference `LZ4Legacy.WrapHC`)."""
    return _wrap(_as_bytes(data), int(LZ4Level.L09_HC), backend)


def unwrap(data, backend: str = "auto") -> bytes:
    """Unwrap + decompress (reference `LZ4Legacy.Unwrap`)."""
    data = _as_bytes(data)
    if len(data) < _HEADER:
        raise LZ4Error("wrapped blob too short")
    original, stored = struct.unpack_from("<II", data, 0)
    payload = data[_HEADER : _HEADER + stored]
    if len(payload) < stored:
        raise LZ4Error("wrapped blob truncated")
    if stored >= original:
        # reference `LZ4Wrapper.Unwrap` semantics (`LZ4Wrapper.cs:130-136`):
        # any stored >= original means the payload was stored verbatim —
        # tolerant producers may emit stored > original, so accept it
        return payload
    return block_api.decode(payload, target_length=original, backend=backend)
