"""LZ4 frame writer.

Produces interoperable `.lz4` frames (magic 0x184D2204) — the capability
analog of the reference's `LZ4FrameWriter<,>` (`Frames/LZ4FrameWriter.cs:14-339`):
header emit, block loop with stored-block fallback, optional block checksums,
EndMark and optional content checksum.  Exceeds the reference by also
*writing* content size and dictionary ID (the reference throws
NotImplementedException there, `Frames/LZ4FrameWriter.cs:89-95`).

The writer drives the block codec through ``lz4_tpu.block.api`` — the TPU
kernels for large blocks, host codec for small tails.
"""

from __future__ import annotations

import os
import struct

from ..block.incremental import create_encoder
from ..constants import _as_bytes
from ..xxh32 import XXH32, xxh32
from .descriptor import EncoderSettings
from .header import build_header

__all__ = ["FrameWriter"]

_UNCOMPRESSED_FLAG = 0x80000000
_END_MARK = b"\x00\x00\x00\x00"


class FrameWriter:
    """Streaming LZ4 frame compressor over a ``write(bytes)`` sink."""

    def __init__(
        self,
        sink,
        settings: EncoderSettings | None = None,
        backend: str = "auto",
        dictionary: bytes = b"",
        workers: int | None = None,
    ):
        self._sink = sink
        # None = auto (min(8, cores)); 0/1 = strictly single-threaded —
        # honors frame.compress(workers=0)'s contract on the fallthrough
        self._workers = workers
        self._settings = settings or EncoderSettings()
        self._descriptor = self._settings.to_descriptor()
        self._backend = backend
        self._block_size = self._descriptor.block_size
        self._pending = bytearray()
        self._encoder = create_encoder(
            self._descriptor.block_chaining,
            self._settings.compression_level,
            self._block_size,
            backend,
            geometry=getattr(self._settings, "geometry", "auto"),
        )
        if dictionary:
            if not self._descriptor.block_chaining:
                raise ValueError(
                    "preset dictionaries require chained (dependent) blocks"
                )
            # seed the 64KB window with the preset dictionary (the reference
            # reserves the frame dictionary-id field but does not implement
            # preset dictionaries; this writer pairs with
            # FrameReader(dictionary=...))
            self._encoder._dict = bytes(dictionary[-65536:])
        self._content_hash = XXH32() if self._descriptor.content_checksum else None
        # extra_memory buys extra buffered blocks (the analog of the
        # reference's ExtraMemory -> extra ring blocks, `Extensions.cs:18-19`);
        # independent blocks batch-encode in parallel, chained blocks cannot
        self._extra_blocks = (
            0
            if self._descriptor.block_chaining
            else self._settings.extra_memory // self._block_size
        )
        self._header_written = False
        self._closed = False
        self._bytes_written = 0
        self._content_bytes = 0

    # -- plumbing -----------------------------------------------------------

    def _emit(self, data: bytes):
        self._sink.write(data)
        self._bytes_written += len(data)

    def _ensure_header(self):
        if not self._header_written:
            self._emit(build_header(self._descriptor))
            self._header_written = True

    @property
    def bytes_written(self) -> int:
        """Compressed bytes emitted so far (reference `GetBytesWritten`)."""
        return self._bytes_written

    # -- block loop ---------------------------------------------------------

    def _emit_block(self, raw: bytes, comp: bytes | None):
        """Emit one block (stored fallback when incompressible, same rule as
        the reference's copy path, `Encoders/LZ4EncoderBase.cs:65-88`)."""
        if comp is None or len(comp) >= len(raw):
            payload = raw
            length_word = len(raw) | _UNCOMPRESSED_FLAG
        else:
            payload = comp
            length_word = len(comp)
        self._emit(struct.pack("<I", length_word))
        self._emit(payload)
        if self._descriptor.block_checksum:
            self._emit(struct.pack("<I", xxh32(payload)))

    def _write_block(self, raw: bytes):
        self._ensure_header()
        self._emit_block(raw, self._encoder.encode_block(raw))

    def _write_blocks(self, blocks: list[bytes]):
        """Encode a batch of independent blocks concurrently, emit in order
        (byte-identical to the sequential path)."""
        self._ensure_header()
        n_workers = (
            self._workers
            if self._workers is not None
            else min(8, os.cpu_count() or 1)
        )
        if len(blocks) == 1 or self._encoder.chaining or n_workers <= 1:
            # chained blocks carry the 64 KB dict serially — never
            # parallel; workers<=1 honors the single-threaded contract
            for raw in blocks:
                self._write_block(raw)
            return

        from ..pool import map_all

        # persistent shared pool (round 5); encode_block takes/returns
        # bytes objects the futures reference, so the buffer-lifetime
        # hazard of the raw-address paths does not apply here
        comps = map_all(
            min(n_workers, len(blocks)),
            self._encoder.encode_block, blocks,
        )
        for raw, comp in zip(blocks, comps):
            self._emit_block(raw, comp)

    def _drain_full_blocks(self):
        bs = self._block_size
        group = bs * (1 + self._extra_blocks)
        while len(self._pending) >= group:
            k = len(self._pending) // bs
            blocks = [bytes(self._pending[i * bs : (i + 1) * bs]) for i in range(k)]
            del self._pending[: k * bs]
            self._write_blocks(blocks)

    def write(self, data) -> int:
        if self._closed:
            raise ValueError("writer is closed")
        data = _as_bytes(data)  # zero-copy for actual bytes payloads
        if self._content_hash is not None:
            self._content_hash.update(data)
        self._content_bytes += len(data)
        self._pending += data
        self._drain_full_blocks()
        return len(data)

    @property
    def closed(self) -> bool:
        return self._closed

    def flush(self):
        """Flush any buffered partial block as a (short) block.  Note: like
        the reference, flushing mid-stream produces a smaller block, which is
        legal in the frame format."""
        if self._closed:
            return
        self._flush_pending()
        if hasattr(self._sink, "flush"):
            self._sink.flush()

    def _flush_pending(self):
        bs = self._block_size
        while len(self._pending) > bs:
            block = bytes(self._pending[:bs])
            del self._pending[:bs]
            self._write_block(block)
        if self._pending:
            block = bytes(self._pending)
            self._pending.clear()
            self._write_block(block)

    def close(self):
        """Finalize the frame: flush, EndMark, optional content checksum."""
        if self._closed:
            return
        self._flush_pending()
        self._ensure_header()  # zero-length content still emits a valid frame
        declared = self._descriptor.content_length
        if declared is not None and self._content_bytes != declared:
            raise ValueError(
                f"content length mismatch: declared {declared}, "
                f"wrote {self._content_bytes}"
            )
        self._emit(_END_MARK)
        if self._content_hash is not None:
            self._emit(struct.pack("<I", self._content_hash.digest()))
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
