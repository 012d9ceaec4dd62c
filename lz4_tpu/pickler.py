"""Pickler — self-contained one-shot compressed blobs.

Wire-format compatible with the reference's `LZ4Pickler` V0 format
(`LZ4Pickler.pickle.cs:161-228`, `LZ4Pickler.unpickle.cs:110+`):

- header byte: bits 0-2 = version (0), bits 6-7 = code for the byte-width of
  the size-diff field (0, 1, 2 bytes, or code 3 = 4 bytes);
- compressed payload: ``diff = original_length - compressed_length`` stored
  little-endian in that many bytes, then the LZ4 block;
- incompressible payload: single zero header byte then the raw bytes.

(The format is read from the reference's public documentation/tests, the
implementation is clean-room.)
"""

from __future__ import annotations

from .block import api as block_api
from .constants import LZ4Level
from .constants import _as_bytes

__all__ = [
    "pickle", "pickle_into", "unpickle", "unpickle_into",
    "unpickled_size", "PickleError",
]


class PickleError(ValueError):
    """Malformed pickle blob (analog of the reference's corrupted-header
    exceptions)."""


def _size_width(value: int) -> int:
    if value < 0 or value > 0xFFFF:
        return 4
    if value > 0xFF:
        return 2
    return 1


_WIDTH_TO_CODE = {0: 0, 1: 1, 2: 2, 4: 3}
_CODE_TO_WIDTH = {0: 0, 1: 1, 2: 2, 3: 4}


def pickle(
    data,
    level: int | LZ4Level = LZ4Level.L00_FAST,
    backend: str = "auto",
) -> bytes:
    """Compress ``data`` into a self-describing blob (reference
    `LZ4Pickler.Pickle`, `LZ4Pickler.pickle.cs:51-106`)."""
    data = _as_bytes(data)
    if not data:
        return b""
    comp = block_api.encode(data, level=level, backend=backend)
    if comp is None or len(comp) >= len(data):
        return b"\x00" + data
    diff = len(data) - len(comp)
    width = _size_width(diff)
    header = bytes([(_WIDTH_TO_CODE[width] & 0x3) << 6])
    return header + diff.to_bytes(width, "little") + comp


def pickle_into(
    data,
    dest,
    level: int | LZ4Level = LZ4Level.L00_FAST,
    backend: str = "auto",
) -> int:
    """Pickle ``data`` into a caller-provided writable buffer.

    Fills the span-target gap next to the reference's `IBufferWriter`
    overload (`LZ4Pickler.pickle.cs:155`, which grows its target and has
    no too-small case — the reference has no Span-target Pickle).  The
    NEGATIVE return on a too-small ``dest`` is this repo's convention,
    borrowed from `block.encode_into`, not a reference behavior: it
    returns -(total bytes needed) so the caller can resize and retry.

    When ``dest`` has `compress_bound` room the block is encoded directly
    into it past a pessimistic header reservation (the reference's
    `PickleWithBuffer` shape) — no intermediate blob allocation."""
    from .constants import compress_bound

    view = memoryview(dest).cast("B")
    raw = _as_bytes(data)
    if not raw:
        return 0
    wmax = _size_width(len(raw))  # diff <= len(raw)
    reserve = 1 + wmax
    if len(view) >= reserve + compress_bound(len(raw)):
        n = block_api.encode_into(
            raw, view[reserve:], level=level, backend=backend
        )
        if n <= 0 or n >= len(raw):  # incompressible -> stored format
            # always fits: this branch required compress_bound room, and
            # compress_bound(n) >= n + 16 > 1 + n
            view[0] = 0
            view[1 : 1 + len(raw)] = raw
            return 1 + len(raw)
        diff = len(raw) - n
        width = _size_width(diff)
        hdr = bytes([(_WIDTH_TO_CODE[width] & 0x3) << 6]) + diff.to_bytes(
            width, "little"
        )
        if len(hdr) < reserve:  # shift payload left onto the real header
            view[len(hdr) : len(hdr) + n] = bytes(view[reserve : reserve + n])
        view[: len(hdr)] = hdr
        return len(hdr) + n
    blob = pickle(raw, level=level, backend=backend)
    if len(blob) > len(view):
        return -len(blob)
    view[: len(blob)] = blob
    return len(blob)


def _decode_header(blob: bytes) -> tuple[int, int, int]:
    """Returns (data_offset, data_length, result_length)."""
    if not blob:
        raise PickleError("empty pickle")
    b0 = blob[0]
    version = b0 & 0x07
    if version != 0:
        raise PickleError(f"unsupported pickle version {version}")
    width = _CODE_TO_WIDTH[(b0 >> 6) & 0x3]
    if len(blob) < 1 + width:
        raise PickleError("truncated pickle header")
    diff = int.from_bytes(blob[1 : 1 + width], "little") if width else 0
    data_offset = 1 + width
    data_length = len(blob) - data_offset
    return data_offset, data_length, data_length + diff


def unpickled_size(blob) -> int:
    """Decoded size without decompressing (reference `UnpickledSize`)."""
    blob = _as_bytes(blob)
    if not blob:
        return 0
    return _decode_header(blob)[2]


def unpickle(blob, backend: str = "auto") -> bytes:
    """Decompress a pickled blob (reference `LZ4Pickler.Unpickle`)."""
    blob = _as_bytes(blob)
    if not blob:
        return b""
    off, dlen, rlen = _decode_header(blob)
    payload = blob[off:]
    if rlen == dlen:  # stored
        return payload
    try:
        out = block_api.decode(payload, target_length=rlen, backend=backend)
    except Exception as e:
        # the module's exception contract (reference CorruptedPickle
        # analog): corruption surfaces as PickleError, not the inner
        # block decoder's error type
        raise PickleError(f"corrupted pickle payload: {e}") from e
    if len(out) != rlen:
        raise PickleError(f"unpickled size {len(out)} != expected {rlen}")
    return out


def unpickle_into(blob, dest, backend: str = "auto") -> int:
    """Unpickle into a caller-provided writable buffer.

    The analog of the reference's `Unpickle(source, Span<byte> output)`
    (`LZ4Pickler.unpickle.cs:100-107`), relaxed on size: the reference
    throws unless the target length EXACTLY equals the decoded size; this
    accepts any ``dest`` with room (>= decoded size) and returns the
    decoded length, raising `PickleError` only when ``dest`` is too small
    (call `unpickled_size` first to size it exactly)."""
    view = memoryview(dest).cast("B")
    blob = _as_bytes(blob)
    if not blob:
        return 0
    off, dlen, rlen = _decode_header(blob)
    if rlen > len(view):
        raise PickleError(
            f"unpickled size {rlen} exceeds destination {len(view)}"
        )
    payload = blob[off:]
    if rlen == dlen:  # stored
        view[:rlen] = payload
        return rlen
    try:
        n = block_api.decode_into(payload, view[:rlen], backend=backend)
    except Exception as e:
        raise PickleError(f"corrupted pickle payload: {e}") from e
    if n != rlen:
        raise PickleError(f"unpickled size {n} != expected {rlen}")
    return n
