"""LZ4 frame reader.

Decodes interoperable `.lz4` frames — capability analog of the reference's
`LZ4FrameReader<,>` (`Frames/LZ4FrameReader.cs:13-283`): header parse +
validation, block loop with stored blocks, checksum verification, chained
dictionary carry, partial (interactive) drains, multi-frame streams and
skippable frames.  Also decodes the lz4 CLI *legacy* format (magic
0x184C2102), which the reference does not.
"""

from __future__ import annotations

import struct

from ..block import api as block_api
from ..block.incremental import create_decoder
from ..xxh32 import XXH32, xxh32
from .descriptor import FrameDescriptor
from .header import LZ4FormatError, parse_header

__all__ = ["FrameReader", "LZ4FormatError"]

_UNCOMPRESSED_FLAG = 0x80000000
_LEGACY_BLOCK_SIZE = 8 * 1024 * 1024


class FrameReader:
    """Streaming LZ4 frame decompressor over a ``read(n)`` source.

    ``read(n)`` returns up to n decompressed bytes (b"" at EOF); ``read_all``
    drains everything.  Concatenated frames and skippable frames are handled
    transparently.
    """

    def __init__(
        self,
        source,
        dictionary: bytes = b"",
        backend: str = "auto",
        extra_memory: int = 0,
    ):
        self._source = source
        self._backend = backend
        self._extra_memory = extra_memory
        self._preset_dict = bytes(dictionary)
        self._descriptor: FrameDescriptor | None = None
        self._legacy = False
        self._decoder = None
        self._content_hash: XXH32 | None = None
        self._content_length: int | None = None
        self._produced_in_frame = 0
        self._buffer = bytearray()  # decoded, not yet drained
        self._eof = False
        self._in_frame = False
        self._bytes_read = 0

    # -- plumbing -----------------------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            chunk = self._source.read(n - len(out))
            if not chunk:
                break
            out += chunk
        self._bytes_read += len(out)
        return bytes(out)

    @property
    def bytes_read(self) -> int:
        """Raw compressed bytes consumed (reference `GetBytesRead`)."""
        return self._bytes_read

    @property
    def frame_descriptor(self) -> FrameDescriptor | None:
        return self._descriptor

    def frame_length(self) -> int | None:
        """Content size from the frame header, when present (reference
        `GetFrameLength`, honored at `LZ4FrameReader.blocking.cs:88`)."""
        self._ensure_frame()
        return self._content_length

    # -- frame state machine --------------------------------------------------

    def _ensure_frame(self) -> bool:
        """Enter the next frame if not inside one.  False at clean EOF."""
        while not self._in_frame and not self._eof:
            info = parse_header(self._read_exact)
            if info is None:
                self._eof = True
                return False
            if info.kind == "skippable":
                skipped = self._read_exact(info.skip_length)
                if len(skipped) < info.skip_length:
                    raise LZ4FormatError("truncated skippable frame")
                continue
            if info.kind == "legacy":
                self._legacy = True
                self._descriptor = FrameDescriptor(
                    block_chaining=False, block_size=_LEGACY_BLOCK_SIZE
                )
                self._content_length = None
            else:
                self._legacy = False
                self._descriptor = info.descriptor
                self._content_length = info.descriptor.content_length
            self._in_frame = True
            self._produced_in_frame = 0
            self._decoder = create_decoder(
                self._descriptor.block_chaining,
                self._descriptor.block_size,
                self._preset_dict,
                self._backend,
            )
            self._content_hash = (
                XXH32()
                if (not self._legacy and self._descriptor.content_checksum)
                else None
            )
        return self._in_frame

    def _finish_frame(self):
        if not self._legacy and self._descriptor.content_checksum:
            cs = self._read_exact(4)
            if len(cs) < 4:
                raise LZ4FormatError("truncated content checksum")
            (expected,) = struct.unpack("<I", cs)
            actual = self._content_hash.digest()
            if actual != expected:
                raise LZ4FormatError(
                    f"content checksum mismatch 0x{actual:08X} != 0x{expected:08X}"
                )
        if (
            self._content_length is not None
            and self._produced_in_frame != self._content_length
        ):
            raise LZ4FormatError(
                f"content length mismatch: {self._produced_in_frame} != "
                f"{self._content_length}"
            )
        self._in_frame = False

    def _next_block(self) -> bool:
        """Decode one block into the buffer.  False when the frame ended."""
        if self._legacy:
            # legacy: u32 compressed length (or next magic / EOF ends frame);
            # _read_exact loops so dribbling sources (sockets) work
            head = self._read_exact(4)
            if len(head) == 0:
                self._in_frame = False
                self._eof = True
                return False
            if len(head) < 4:
                raise LZ4FormatError("truncated legacy block header")
            (word,) = struct.unpack("<I", head)
            from .header import parse_magic

            if parse_magic(word) is not None:
                # next frame begins; legacy frames have no end mark
                self._in_frame = False
                return self._reenter_after_legacy(word)
            if word > block_api.compress_bound(_LEGACY_BLOCK_SIZE):
                # same allocation-amplification bound the non-legacy path
                # enforces: a crafted length word must fail fast, not
                # buffer gigabytes from a slow source
                raise LZ4FormatError(
                    f"legacy block length {word} exceeds the 8 MiB "
                    "legacy block bound"
                )
            data = self._read_exact(word)
            if len(data) < word:
                raise LZ4FormatError("truncated legacy block")
            raw = block_api.decode(
                data, backend=self._backend, capacity=_LEGACY_BLOCK_SIZE
            )
            self._buffer += raw
            self._produced_in_frame += len(raw)
            return True

        head = self._read_exact(4)
        if len(head) < 4:
            raise LZ4FormatError("truncated block length")
        (word,) = struct.unpack("<I", head)
        if word == 0:  # EndMark
            self._finish_frame()
            return False
        stored = bool(word & _UNCOMPRESSED_FLAG)
        length = word & ~_UNCOMPRESSED_FLAG
        limit = self._descriptor.block_size_limit
        if length > (limit if stored else block_api.compress_bound(limit)):
            raise LZ4FormatError(f"block length {length} exceeds block size limit")
        data = self._read_exact(length)
        if len(data) < length:
            raise LZ4FormatError("truncated block data")
        if self._descriptor.block_checksum:
            cs = self._read_exact(4)
            if len(cs) < 4:
                raise LZ4FormatError("truncated block checksum")
            (expected,) = struct.unpack("<I", cs)
            actual = xxh32(data)
            if actual != expected:
                raise LZ4FormatError(
                    f"block checksum mismatch 0x{actual:08X} != 0x{expected:08X}"
                )
        if stored:
            raw = self._decoder.inject_block(data)
        else:
            raw = self._decoder.decode_block(data)
            if len(raw) > self._descriptor.block_size_limit:
                raise LZ4FormatError("decoded block exceeds block size limit")
        if self._content_hash is not None:
            self._content_hash.update(raw)
        self._buffer += raw
        self._produced_in_frame += len(raw)
        return True

    def _reenter_after_legacy(self, magic_word: int) -> bool:
        """A legacy frame ends when another magic appears; re-dispatch it."""
        rest = struct.pack("<I", magic_word)
        # chain the magic bytes back in front of the source
        src = self._source

        class _Chain:
            def __init__(self, head: bytes, tail):
                self._head = head
                self._tail = tail

            def read(self, n):
                if self._head:
                    out, self._head = self._head[:n], self._head[n:]
                    return out
                return self._tail.read(n)

        self._source = _Chain(rest, src)
        self._bytes_read -= 4
        return False

    # -- public drain API -----------------------------------------------------

    def read(self, n: int = -1) -> bytes:
        """Read up to ``n`` decompressed bytes (all remaining if n < 0)."""
        if n is None or n < 0:
            return self.read_all()
        while len(self._buffer) < n:
            if not self._ensure_frame():
                break
            if not self._next_block():
                continue  # frame ended; maybe another frame follows
        out = bytes(self._buffer[:n])
        del self._buffer[:n]
        return out

    def read_all(self) -> bytes:
        while True:
            if not self._ensure_frame():
                break
            while self._next_block():
                pass
        out = bytes(self._buffer)
        self._buffer.clear()
        return out

    def read1(self, n: int = -1) -> bytes:
        """Interactive read: return available bytes as soon as ANY are
        ready (the reference's `ReadManyBytes(..., interactive: true)`,
        `Frames/LZ4FrameReader.blocking.cs:157-179`: fill up to the
        caller's byte budget but never block for more once something is
        available).  ``n`` is that budget (< 0: everything buffered after
        one block); surplus stays buffered for the next call.
        ``extra_memory`` buys read-ahead blocks per pull — the analog of
        the reference's ExtraMemory -> bigger decoder ring
        (`Extensions.cs:18-19`)."""
        while not self._buffer:
            if not self._ensure_frame():
                break
            if not self._next_block():
                continue
        if self._buffer and self._extra_memory and self._in_frame:
            extra = self._extra_memory // max(self._descriptor.block_size, 1)
            for _ in range(extra):
                if not self._in_frame or not self._next_block():
                    break
        if n is None or n < 0 or n >= len(self._buffer):
            out = bytes(self._buffer)
            self._buffer.clear()
            return out
        out = bytes(self._buffer[:n])
        del self._buffer[:n]
        return out

    def peek(self, n: int = -1) -> bytes:
        """Return up to ``n`` decoded bytes without consuming them (the
        analog of the reference decoder's `Peek`,
        `Encoders/ILZ4Decoder.cs:8-54`).  Decodes at most one block when
        the buffer is empty."""
        if not self._buffer:
            if self._ensure_frame():
                self._next_block()
        if n is None or n < 0:
            return bytes(self._buffer)
        return bytes(self._buffer[:n])

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __iter__(self):
        while True:
            chunk = self.read1()
            if not chunk:
                return
            yield chunk
