"""One-shot frame facades and Stream-like wrappers.

Capability analog of the reference's `LZ4Frame` one-liners
(`LZ4Frame.encode.cs:9-387`, `LZ4Frame.decode.cs:14-67`) and the
`LZ4Stream.Encode/Decode` stream skins (`LZ4Stream.cs:8-76`).

One-shot ``compress``/``decompress`` over independent blocks run
block-parallel: a thread pool over the native host codec by default (ctypes
releases the GIL), or the batched device kernels / mesh sharding when the
TPU backend is requested; chained frames with the TPU backend decode through
the Pallas dictionary decoder.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..block import api as block_api
from ..xxh32 import XXH32, xxh32
from .descriptor import DecoderSettings, EncoderSettings, FrameDescriptor
from .header import LZ4FormatError, build_header, parse_header
from .reader import FrameReader
from .writer import FrameWriter
from ..constants import _as_bytes

__all__ = [
    "compress",
    "compress_into",
    "decompress",
    "decompress_into",
    "open",
    "skippable_frame",
    "FrameReader",
    "FrameWriter",
    "LZ4FrameFile",
]

_UNCOMPRESSED_FLAG = 0x80000000


def _assemble_frame(d, data, bs, payloads, csum=None) -> bytes:
    """Assemble one frame: header, per-block stored-vs-compressed framing
    (a block is STORED when its compressed payload is not smaller — the
    upstream rule), optional block checksums, EndMark, optional content
    checksum.  `payloads` are per-block compressed candidates (bytes or
    memoryview slices), in frame order."""
    parts = [build_header(d)]
    n = len(data)
    for i, comp in enumerate(payloads):
        off = i * bs
        raw_len = min(bs, n - off)
        if len(comp) >= raw_len:
            parts.append(struct.pack("<I", raw_len | _UNCOMPRESSED_FLAG))
            payload = data[off : off + raw_len]
        else:
            parts.append(struct.pack("<I", len(comp)))
            payload = comp
        parts.append(payload)
        if d.block_checksum:
            parts.append(struct.pack("<I", xxh32(payload)))
    parts.append(b"\x00\x00\x00\x00")
    if csum is not None:
        parts.append(struct.pack("<I", csum))
    return b"".join(parts)


def _independent_geometry(settings) -> str:
    """Effective FAST geometry for independent-block paths ("auto" maps to
    canonical; see EncoderSettings.geometry)."""
    g = getattr(settings, "geometry", "auto")
    return "dense" if g == "dense" else "canonical"


def skippable_frame(user_data, nibble: int = 0) -> bytes:
    """Build a *skippable frame* carrying arbitrary user metadata.

    Frame-spec skippable frames (magic ``0x184D2A5n`` + LE u32 size +
    payload) are ignored by every conforming decoder, including our
    `FrameReader` and the canonical lz4 CLI — useful for embedding
    application metadata between frames.  The reference only *reads*
    them (frame spec v1.6.3; our reader: `frame/header.py:103-108`);
    writing them is an extension, like the writer's content-size support.

    ``nibble`` selects one of the 16 skippable magics (0..15)."""
    if not 0 <= nibble <= 0xF:
        raise ValueError(f"skippable nibble {nibble} not in 0..15")
    payload = _as_bytes(user_data)
    if len(payload) > 0xFFFFFFFF:
        raise ValueError(
            f"skippable payload {len(payload)} bytes exceeds the frame-spec "
            "u32 size field (4294967295)"
        )
    from ..constants import SKIPPABLE_MAGIC_MIN

    return (
        struct.pack("<II", SKIPPABLE_MAGIC_MIN + nibble, len(payload))
        + payload
    )


def compress(
    data,
    settings: EncoderSettings | None = None,
    backend: str = "auto",
    mesh=None,
    store_size: bool = False,
    workers: int | None = None,
) -> bytes:
    """Compress ``data`` into one LZ4 frame.

    With independent blocks the block loop runs block-parallel: across a
    thread pool over the native host codec (ctypes releases the GIL — near
    linear core scaling), or batched on device / sharded over ``mesh`` when
    ``backend="tpu"``.  Chained blocks run the sequential dict-carry path
    through FrameWriter.  ``workers=0`` forces single-threaded.
    """
    data = _as_bytes(data)
    settings = settings or EncoderSettings()
    if store_size and settings.content_length is None:
        import dataclasses

        settings = dataclasses.replace(settings, content_length=len(data))
    if (
        settings.chain_blocks
        and len(data) <= settings.block_size
        and (
            settings.compression_level >= 3
            or getattr(settings, "geometry", "auto") == "canonical"
        )
    ):
        # LZ4F_compressFrame's single-block rule on the byte-parity
        # surfaces (canonical FAST chains, every HC/OPT chain): content
        # fitting one block is emitted as an INDEPENDENT frame — linkage
        # is meaningless for one block and the payload is identical
        import dataclasses

        settings = dataclasses.replace(settings, chain_blocks=False)
    if not settings.chain_blocks and len(data) <= settings.block_size:
        # one-shot with known content size: shrink the block-size ID to the
        # smallest standard size that fits (upstream LZ4F_optimalBSID —
        # keeps whole frames byte-identical to LZ4F_compressFrame and
        # gives decoders a tighter allocation hint)
        import dataclasses

        bs_opt = 65536
        while bs_opt < len(data):
            bs_opt <<= 2
        if bs_opt < settings.block_size:
            settings = dataclasses.replace(settings, block_size=bs_opt)
    if (
        settings.chain_blocks
        and settings.compression_level >= 3
        and getattr(settings, "geometry", "auto") == "canonical"
    ):
        # HC/OPT chains satisfy the canonical request on every path: the
        # per-block 64 KB window rebuild is byte-identical to upstream
        # LZ4_compress_HC_continue (oracle-gated), so normalize the knob
        # and let the normal chained routing (parallel host, device,
        # streaming writer) handle it
        import dataclasses

        settings = dataclasses.replace(settings, geometry="auto")
    device_path = backend == "tpu" or mesh is not None
    if not settings.chain_blocks and not device_path:
        host_parallel = _try_host_parallel_compress(data, settings, workers)
        if host_parallel is not None:
            return host_parallel
    if settings.chain_blocks and getattr(settings, "geometry", "auto") == "canonical":
        # canonical continue-schedule (FAST): byte-parity with upstream
        # LZ4_compress_fast_continue over linked blocks — a sequential
        # host pass over the whole buffer, incompatible with an explicit
        # device request
        if device_path:
            raise ValueError(
                "canonical chained (continue-schedule) frames are a "
                "sequential host path; use geometry='auto'/'dense' with "
                "backend='tpu'/mesh, or drop the device request"
            )
        blob = _host_chained_canonical_compress(data, settings)
        if blob is not None:
            return blob
    if settings.chain_blocks and not device_path:
        host_chained = _try_host_chained_compress(data, settings, workers)
        if host_chained is not None:
            return host_chained
    if settings.chain_blocks and device_path and len(data) > settings.block_size:
        fast = _try_chained_device_compress(data, settings)
        if fast is not None:
            return fast
    if (
        settings.chain_blocks
        or not device_path
        or len(data) <= settings.block_size
    ):
        sink = io.BytesIO()
        # pass workers through: the writer's independent-block batches
        # parallelize by default, and workers=0 must stay single-threaded
        # on this fallthrough too
        w = FrameWriter(sink, settings, backend=backend, workers=workers)
        w.write(data)
        w.close()
        return sink.getvalue()

    # independent blocks: batched block-parallel path
    from ..parallel.blocks import encode_blocks

    d = settings.to_descriptor()
    blocks = encode_blocks(
        data,
        block_size=settings.block_size,
        level=settings.compression_level,
        mesh=mesh,
        geometry=_independent_geometry(settings),
    )
    csum = xxh32(data) if d.content_checksum else None
    return _assemble_frame(d, data, settings.block_size, blocks, csum)


def compress_into(
    data,
    dst,
    settings: EncoderSettings | None = None,
    workers: int | None = None,
) -> int:
    """Compress ``data`` into one LZ4 frame written to a caller buffer (the
    analog of the reference's span-target `LZ4Frame.Encode(source, target)`,
    `LZ4Frame.encode.cs:175-210`).  Returns the frame length; raises
    ValueError if the produced frame does not fit ``dst`` (a destination
    sized to a previously measured frame length is accepted — reference
    `Issue96.cs` estimation semantics; the never-failing capacity is
    19 + blocks * (4 + compress_bound(block_size) + 4) + 8)."""
    settings = settings or EncoderSettings()
    view = memoryview(dst).cast("B")
    if view.readonly:
        raise ValueError("destination buffer is read-only")
    data = _as_bytes(data)
    blob = compress(data, settings=settings, workers=workers)
    if len(blob) > len(view):
        raise ValueError(
            f"destination {len(view)} too small for {len(blob)}-byte frame"
        )
    view[: len(blob)] = blob
    return len(blob)


def _try_host_parallel_compress(data, settings, workers):
    """Independent-block frame via a thread pool over the native codec.

    The analog of `lz4 -T`: blocks are embarrassingly parallel, ctypes calls
    drop the GIL, so N cores give ~N x the single-core ~1 GB/s.  Returns
    None when the native codec is unavailable or the payload is small.
    """
    import os

    try:
        from .. import native
    except ImportError:
        return None
    if not native.available():
        return None
    bs = settings.block_size
    if len(data) <= 2 * bs:
        return None
    n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
    if n_workers <= 1:
        return None
    from ..pool import map_all, shared_pool

    if not isinstance(data, bytes):
        data = bytes(data)
    level = settings.compression_level
    d = settings.to_descriptor()
    nb = -(-len(data) // bs)
    # one shared scratch, one compressed slot per block: encode_span writes
    # it in place with the GIL dropped, so the pool scales to physical cores
    # (per-block slices/allocations would serialize on the GIL)
    slot = block_api.compress_bound(bs)
    # np.empty: no zero-fill (a memset at this VM's ~2 GB/s would rival the
    # compression time itself)
    scratch = np.empty(nb * slot, np.uint8)
    clens = [0] * nb

    geometry = _independent_geometry(settings)

    def one(i):
        off = i * bs
        blen = min(bs, len(data) - off)
        clens[i] = native.encode_span(
            data, off, blen, scratch, i * slot, slot, level,
            geometry=geometry,
        )

    # persistent pool: no per-call thread spawn; map_all joins workers
    # before any unwind (they write `scratch` through raw addresses)
    csum_f = (
        shared_pool(n_workers).submit(xxh32, data)
        if d.content_checksum
        else None
    )  # content checksum overlaps with the compression workers
    map_all(n_workers, one, range(nb))
    csum = csum_f.result() if csum_f is not None else None
    sview = memoryview(scratch.data)
    return _assemble_frame(
        d, data, bs,
        [sview[i * slot : i * slot + clens[i]] for i in range(nb)],
        csum,
    )


def _host_chained_canonical_compress(data, settings):
    """Chained frame whose blocks are byte-identical to feeding the buffer
    through upstream `LZ4_compress_fast_continue` (the lz4 frame API's
    linked-block schedule): one sequential pass carrying the persistent
    byU32 table (`native/lz4tpu.c lz4tpu_encode_fast_continue`; pure-python
    twin `hostref.ChainedCanonicalEncoder`).  FAST levels only — HC/OPT
    chained frames keep the per-block window engines."""
    level = settings.compression_level
    if level >= 3:
        return None
    data = _as_bytes(data)
    if not isinstance(data, bytes):
        data = bytes(data)
    bs = settings.block_size
    if len(data) <= bs:
        # unreachable from compress() (the single-block LZ4F rule already
        # flipped such frames to independent mode); defend anyway
        return None
    d = settings.to_descriptor()

    payloads: list[bytes] = []
    use_native = False
    try:
        from .. import native

        use_native = native.available()
    except ImportError:
        pass
    if use_native:
        payloads = native.chained_canonical_blocks(data, bs)
    else:
        from ..block.hostref import ChainedCanonicalEncoder

        enc = ChainedCanonicalEncoder(data)
        for off in range(0, max(len(data), 1), bs):
            payloads.append(
                enc.encode_block(off, min(bs, len(data) - off))
            )
    csum = xxh32(data) if d.content_checksum else None
    return _assemble_frame(d, data, bs, payloads, csum)


def _try_host_chained_compress(data, settings, workers):
    """Chained-block frame over one contiguous buffer: block k's dictionary
    is the previous 64 KB of plaintext ALREADY IN PLACE in ``data``, so the
    block loop runs zero-copy and — because every window is known up front —
    in parallel (the host analog of `encode_blocks_chained_device`).
    Byte-identical to the sequential FrameWriter path."""
    import os

    try:
        from .. import native
    except ImportError:
        return None
    if not native.available():
        return None
    bs = settings.block_size
    if len(data) <= bs:
        return None
    n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
    if n_workers <= 1:
        return None
    from ..pool import map_all, shared_pool

    data = _as_bytes(data)
    level = settings.compression_level
    d = settings.to_descriptor()
    nb = -(-len(data) // bs)
    slot = block_api.compress_bound(bs)
    scratch = np.empty(nb * slot, np.uint8)
    clens = [0] * nb

    def one(i):
        off = i * bs
        blen = min(bs, len(data) - off)
        clens[i] = native.encode_span(
            data, off, blen, scratch, i * slot, slot, level,
            dict_len=min(off, 65536), geometry="dense",
        )

    # persistent pool + join-before-unwind (see _try_host_parallel_compress)
    csum_f = (
        shared_pool(n_workers).submit(xxh32, data)
        if d.content_checksum
        else None
    )
    map_all(n_workers, one, range(nb))
    csum = csum_f.result() if csum_f is not None else None
    sview = memoryview(scratch.data)
    return _assemble_frame(
        d, data, bs,
        [sview[i * slot : i * slot + clens[i]] for i in range(nb)],
        csum,
    )


_LIBC = None


def _prefault_async(base: int, length: int):
    """Populate the result buffer's pages on a pool thread while the
    serial chained decode walks forward (round 5: paired +3.5% on the
    default chained+checksum shape — the fresh allocation's page faults
    otherwise serialize into the single-threaded decode pass).
    `madvise(MADV_POPULATE_WRITE)` never writes user data, so it is
    RACE-FREE against the concurrent decoder (a page the decoder already
    wrote is simply left as is); any error just means the decode faults
    normally.  Returns the future (or None)."""
    import ctypes

    global _LIBC
    if _LIBC is None:
        try:
            _LIBC = ctypes.CDLL("libc.so.6", use_errno=True)
            # explicit size_t length: without argtypes ctypes passes a
            # 32-bit c_int, silently truncating >= 2 GiB buffers (and
            # madvise(addr, 0, ...) "succeeds" doing nothing)
            _LIBC.madvise.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
            ]
            _LIBC.madvise.restype = ctypes.c_int
        except (OSError, AttributeError):
            _LIBC = False
    if not _LIBC:
        return None
    from ..pool import shared_pool

    a0 = base & ~4095
    MADV_POPULATE_WRITE = 23
    return shared_pool(2).submit(
        _LIBC.madvise, ctypes.c_void_p(a0), base + length - a0,
        MADV_POPULATE_WRITE,
    )


def _try_host_chained_decompress(data, settings):
    """Chained-block frame decoded in one sequential zero-copy pass: each
    block decodes into its final position of one contiguous buffer, so the
    64 KB window is simply the bytes before it — no per-block dictionary
    save/restore (the contiguous analog of `LZ4_decompress_safe_continue`'s
    prefix64k mode, reference `x64/LL64.dec.cs:523-546`)."""
    import ctypes

    try:
        from .. import native
    except ImportError:
        return None
    if not native.available() or settings.dictionary:
        return None
    scan = _scan_single_frame(data, allow_chained=True)
    if scan is None:
        return None
    d, blocks, pos = scan
    if not d.block_chaining or not blocks:
        return None
    data = _as_bytes(data)
    bs = d.block_size
    nb = len(blocks)
    known = d.content_length
    if known is not None:
        # exact size known: decode straight into the final (uninitialized)
        # bytes object — zero extra memory passes
        result = native.alloc_uninit_bytes(known)
        base = native._addr(result)
        cap_total = known
    else:
        scratch = np.empty(nb * bs, np.uint8)
        base = native._waddr(scratch)
        cap_total = nb * bs
    pf = _prefault_async(base, cap_total)  # overlaps the serial pass
    try:
        wrote = 0
        for off, length, stored in blocks:
            if stored:
                if wrote + length > cap_total:
                    raise LZ4FormatError(
                        "decoded content exceeds declared size"
                    )
                ctypes.memmove(
                    base + wrote, native._addr(data) + off, length
                )
                wrote += length
            else:
                dl = min(wrote, 65536)
                try:
                    wrote += native.decode_span(
                        data, off, length, base, wrote,
                        min(bs, cap_total - wrote),
                        dict_addr=base + wrote - dl, dict_len=dl,
                    )
                except Exception as e:  # malformed block / lying size
                    raise LZ4FormatError(
                        f"chained block decode failed: {e}"
                    )
    finally:
        if pf is not None:
            try:  # join on EVERY path: the madvise must not outlive the
                pf.result()  # buffer; never mask the body's exception
            except Exception:
                pass
    if known is not None:
        if wrote != known:
            raise LZ4FormatError(
                f"content length mismatch: {wrote} != {known}"
            )
    else:
        result = ctypes.string_at(base, wrote)  # single alloc+copy, no memset
    if d.content_checksum:
        (expected,) = struct.unpack_from("<I", data, pos)
        if xxh32(result) != expected:
            raise LZ4FormatError("content checksum mismatch")
    return result


def _try_host_parallel_decompress(data, settings, workers):
    """Single independent-block frame decoded via a thread pool over the
    native codec.  Returns None when the stream needs the general path."""
    import os

    try:
        from .. import native
    except ImportError:
        return None
    if not native.available() or settings.dictionary:
        return None
    n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
    if n_workers <= 1:
        return None
    scan = _scan_single_frame(data)
    if scan is None:
        return None
    d, blocks, pos = scan
    if len(blocks) < 2:
        return None
    bs = d.block_size

    nb = len(blocks)
    lens = [0] * nb

    if not isinstance(data, bytes):
        data = bytes(data)

    # Decode straight into the final bytes object: the last block's length
    # is learned first (interior blocks of a conforming frame are full bs),
    # the result is allocated UNINITIALIZED (memset/copy run at ~1.5-3 GB/s
    # on this class of VM — more than the decode itself), and every worker
    # writes its slice in place with the GIL dropped.  A frame with
    # spec-legal short interior blocks falls back to compaction below.
    import ctypes

    off_l, len_l, stored_l = blocks[-1]
    if stored_l:
        last = data[off_l : off_l + len_l]
    else:
        tmp = bytearray(bs)
        n = native.decode_span(data, off_l, len_l, tmp, 0, bs)
        last = bytes(memoryview(tmp)[:n])
    total = bs * (nb - 1) + len(last)
    result = native.alloc_uninit_bytes(total)
    base = native._addr(result)
    ctypes.memmove(base + bs * (nb - 1), last, len(last))
    lens[-1] = len(last)

    def one(i):
        off, length, stored = blocks[i]
        if stored:
            ctypes.memmove(base + i * bs, native._addr(data) + off, length)
            lens[i] = length
        else:
            # zero-copy: the native decoder reads the frame buffer and
            # writes this block's slice of the result object in place, GIL
            # dropped for the whole call (no per-block slice, allocation,
            # or memset holding the lock)
            lens[i] = native.decode_span(data, off, length, base, i * bs, bs)

    from ..pool import map_all

    # persistent pool: per-call thread spawn costs ~0.6 ms on this VM —
    # ~8% of a 16 MiB threaded frame decode.  map_all JOINS the workers
    # before unwinding on a malformed block: they write the fresh
    # `result` object through its raw address, so an early unwind would
    # free it under them (round-5 review finding)
    map_all(n_workers, one, range(nb - 1))
    if not all(lens[i] == bs for i in range(nb - 1)):
        # spec-legal short interior blocks: compact (rare; the partially
        # written `result` is discarded, never exposed)
        result = b"".join(
            bytes(memoryview(result)[i * bs : i * bs + lens[i]])
            for i in range(nb)
        )
    if d.content_checksum:
        (expected,) = struct.unpack_from("<I", data, pos)
        if xxh32(result) != expected:
            raise LZ4FormatError("content checksum mismatch")
    if d.content_length is not None and len(result) != d.content_length:
        raise LZ4FormatError(
            f"content length mismatch: {len(result)} != {d.content_length}"
        )
    return result


def _scan_single_frame(data: bytes, allow_chained: bool = False):
    """Parse one frame's block table on the host.

    Returns (descriptor, [(offset, length, stored)], tail_pos) or None."""
    src = io.BytesIO(data)
    try:
        info = parse_header(src.read)
    except LZ4FormatError:
        return None
    if info is None or info.kind != "frame":
        return None
    d = info.descriptor
    if (d.block_chaining and not allow_chained) or d.dictionary_id is not None:
        return None
    blocks = []
    pos = info.header_length
    n = len(data)
    while True:
        if pos + 4 > n:
            return None
        (word,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if word == 0:
            break
        stored = bool(word & _UNCOMPRESSED_FLAG)
        length = word & ~_UNCOMPRESSED_FLAG
        limit = d.block_size_limit
        if length > (limit if stored else block_api.compress_bound(limit)):
            # same bound FrameReader._next_block enforces: a crafted length
            # word must not reach the decoders (allocation amplification)
            raise LZ4FormatError(
                f"block length {length} exceeds block size limit"
            )
        if pos + length > n:
            return None
        blocks.append((pos, length, stored))
        pos += length
        if d.block_checksum:
            if pos + 4 > n:
                return None
            (expected,) = struct.unpack_from("<I", data, pos)
            if xxh32(data[pos - length : pos]) != expected:
                raise LZ4FormatError("block checksum mismatch")
            pos += 4
    tail = 4 if d.content_checksum else 0
    if pos + tail != n:
        return None  # multi-frame stream
    return d, blocks, pos


def _try_chained_device_compress(data: bytes, settings: EncoderSettings):
    """Chained-block frame compressed in ONE batched device call.

    Block k's dictionary is the previous 64 KB of plaintext — known up
    front — so chained ENCODE parallelizes even though chained decode is
    serial.  The streaming encoder's dictionary mode is byte-identical to
    the host chain encoder, so this path produces the exact bytes the
    sequential FrameWriter would."""
    from ..parallel.blocks import _on_tpu, encode_blocks_chained_device

    if not _on_tpu():
        return None
    d = settings.to_descriptor()
    bs = settings.block_size
    try:
        comps = encode_blocks_chained_device(
            data, bs, level=settings.compression_level
        )
    except Exception:
        # kernel overflow / device trouble: the sequential host FrameWriter
        # produces the identical frame — fall back instead of failing
        return None
    csum = xxh32(data) if d.content_checksum else None
    return _assemble_frame(d, data, bs, comps, csum)


def _try_chained_device_decompress(data: bytes, settings: DecoderSettings):
    """Chained-block frame decoded block-by-block on device with the Pallas
    dictionary decoder carrying the 64KB window (the device analog of
    `LZ4_decompress_safe_continue`)."""
    import numpy as np

    scan = _scan_single_frame(data, allow_chained=True)
    if scan is None:
        return None
    d, blocks, pos = scan
    if not d.block_chaining or not blocks:
        return None
    from ..parallel.blocks import comp_capacity, _on_tpu

    if not _on_tpu():
        return None
    # streaming scalar decoder: dictionary mode with a constant on-chip
    # footprint at any block size (see ops/decode_pallas_stream)
    from ..ops.decode_pallas_stream import decode_blocks_pallas_stream

    cap = comp_capacity(d.block_size)
    window = bytes(settings.dictionary[-65536:])
    parts = []
    dict_buf = np.zeros((1, 65536), np.uint8)
    for off, length, stored in blocks:
        chunk = data[off : off + length]
        if stored:
            raw = chunk
        else:
            comps = np.zeros((1, cap), np.uint8)
            comps[0, : len(chunk)] = np.frombuffer(chunk, np.uint8)
            dict_buf[:] = 0
            if window:
                dict_buf[0, 65536 - len(window) :] = np.frombuffer(window, np.uint8)
            out, lens, errs = decode_blocks_pallas_stream(
                comps,
                np.asarray([len(chunk)], np.int32),
                d.block_size,
                dict_buf,
                np.asarray([len(window)], np.int32),
            )
            if errs[0] != 0:
                raise LZ4FormatError(f"malformed chained block (err={errs[0]})")
            raw = out[0, : lens[0]].tobytes()
        parts.append(raw)
        window = (window + raw)[-65536:]
    result = b"".join(parts)
    if d.content_checksum:
        (expected,) = struct.unpack_from("<I", data, pos)
        if xxh32(result) != expected:
            raise LZ4FormatError("content checksum mismatch")
    if d.content_length is not None and len(result) != d.content_length:
        raise LZ4FormatError(
            f"content length mismatch: {len(result)} != {d.content_length}"
        )
    return result


def decompress(
    data,
    settings: DecoderSettings | None = None,
    backend: str = "auto",
    mesh=None,
    workers: int | None = None,
) -> bytes:
    """Decompress LZ4 frame(s) from ``data``.

    Independent-block frames without block-level surprises decode through the
    batched block-parallel path; everything else falls back to FrameReader.
    """
    data = _as_bytes(data)
    settings = settings or DecoderSettings()
    if backend == "tpu" or mesh is not None:
        fast = _try_parallel_decompress(data, settings, mesh)
        if fast is not None:
            return fast
        fast = _try_chained_device_decompress(data, settings)
        if fast is not None:
            return fast
    elif backend != "tpu":
        fast = _try_host_parallel_decompress(data, settings, workers)
        if fast is not None:
            return fast
        fast = _try_host_chained_decompress(data, settings)
        if fast is not None:
            return fast
    r = FrameReader(
        io.BytesIO(data),
        dictionary=settings.dictionary,
        backend=backend,
        extra_memory=settings.extra_memory,
    )
    return r.read_all()


def decompress_into(
    data,
    dst,
    settings: DecoderSettings | None = None,
    workers: int | None = None,
) -> int:
    """Decompress one LZ4 frame directly into a caller buffer (the analog of
    the reference's span-target `LZ4Frame.Decode(source, target)`,
    `LZ4Frame.decode.cs:25-41`): no result allocation, no copy — the block
    decoders write ``dst`` in place (threaded for independent blocks,
    sequential in-place-window for chained).  Returns the decoded length;
    raises if ``dst`` is too small.  Falls back to FrameReader for streams
    the fast scan cannot place (multi-frame, preset dictionary, legacy)."""
    import ctypes
    import os

    from .. import native

    data = _as_bytes(data)
    settings = settings or DecoderSettings()
    view = memoryview(dst).cast("B")
    if view.readonly:
        raise ValueError("destination buffer is read-only")
    scan = None
    if native.available() and not settings.dictionary:
        scan = _scan_single_frame(data, allow_chained=True)
    if scan is None:
        r = FrameReader(
            io.BytesIO(data),
            dictionary=settings.dictionary,
        )
        out = r.read_all()
        if len(out) > len(view):
            raise ValueError(
                f"destination {len(view)} < decoded size {len(out)}"
            )
        view[: len(out)] = out
        return len(out)
    d, blocks, pos = scan
    base = native._waddr(view)
    bs = d.block_size
    cap_total = len(view)
    wrote = 0
    if d.block_chaining:
        for off, length, stored in blocks:
            if stored:
                if wrote + length > cap_total:
                    raise ValueError("destination buffer too small")
                ctypes.memmove(base + wrote, native._addr(data) + off, length)
                wrote += length
            else:
                dl = min(wrote, 65536)
                wrote += native.decode_span(
                    data, off, length, base, wrote,
                    min(bs, cap_total - wrote),
                    dict_addr=base + wrote - dl, dict_len=dl,
                )
    else:
        nb = len(blocks)
        lens = [0] * nb
        n_workers = (
            workers if workers is not None else min(8, os.cpu_count() or 1)
        )

        def one(i):
            off, length, stored = blocks[i]
            cap = min(bs, cap_total - i * bs)
            if cap < 0:
                raise ValueError("destination buffer too small")
            if stored:
                if length > cap:
                    raise ValueError("destination buffer too small")
                ctypes.memmove(base + i * bs, native._addr(data) + off, length)
                lens[i] = length
            else:
                lens[i] = native.decode_span(
                    data, off, length, base, i * bs, cap
                )

        if n_workers > 1 and nb > 1:
            from ..pool import map_all

            # join-before-unwind: workers write the CALLER's buffer via
            # its raw address; do not return/raise while they still run
            map_all(n_workers, one, range(nb))
        else:
            for i in range(nb):
                one(i)
        if nb == 0:
            wrote = 0  # empty frame: header + EndMark, no blocks
        elif not all(lens[i] == bs for i in range(nb - 1)):
            # spec-legal short interior blocks: compact left in place
            w = lens[0]
            for i in range(1, nb):
                ctypes.memmove(base + w, base + i * bs, lens[i])
                w += lens[i]
            wrote = w
        else:
            wrote = bs * (nb - 1) + lens[-1]
    if d.content_checksum:
        (expected,) = struct.unpack_from("<I", data, pos)
        if xxh32(view[:wrote]) != expected:
            raise LZ4FormatError("content checksum mismatch")
    if d.content_length is not None and wrote != d.content_length:
        raise LZ4FormatError(
            f"content length mismatch: {wrote} != {d.content_length}"
        )
    return wrote


def _try_parallel_decompress(data: bytes, settings: DecoderSettings, mesh):
    """Single independent-block frame → batched device decode.  Returns None
    when the stream needs the general path (chained, multi-frame, legacy,
    stored blocks mixed in, preset dictionary)."""
    if settings.dictionary:
        return None
    scan = _scan_single_frame(data)
    if scan is None:
        return None
    d, blocks, pos = scan

    if any(st for _, _, st in blocks):
        # mixed stored/compressed blocks: stored blocks interleave with the
        # batch, assemble sequentially (rare — incompressible regions).
        # capacity bounds the decoder allocation and enforces the frame's
        # block-size limit, mirroring FrameReader._next_block.
        limit = d.block_size_limit
        parts = []
        for off, length, st in blocks:
            chunk = data[off : off + length]
            if not st:
                chunk = block_api.decode(chunk, capacity=limit)
                if len(chunk) > limit:
                    raise LZ4FormatError(
                        "decoded block exceeds block size limit"
                    )
            parts.append(chunk)
        result = b"".join(parts)
    else:
        from ..parallel.blocks import decode_blocks

        comp_list = [data[off : off + length] for off, length, _ in blocks]
        result = (
            decode_blocks(comp_list, d.block_size, mesh=mesh)
            if comp_list
            else b""
        )
    if d.content_checksum:
        (expected,) = struct.unpack_from("<I", data, pos)
        if xxh32(result) != expected:
            raise LZ4FormatError("content checksum mismatch")
    if d.content_length is not None and len(result) != d.content_length:
        raise LZ4FormatError(
            f"content length mismatch: {len(result)} != {d.content_length}"
        )
    return result


# ---------------------------------------------------------------------------
# Stream (file-like) facade
# ---------------------------------------------------------------------------


class LZ4FrameFile(io.RawIOBase):
    """File-like LZ4 frame stream — the analog of the reference's
    `LZ4EncoderStream`/`LZ4DecoderStream` (`LZ4EncoderStream.cs:10-79`,
    `LZ4DecoderStream.cs:11-89`)."""

    def __init__(
        self,
        inner,
        mode: str = "rb",
        settings: EncoderSettings | None = None,
        dictionary: bytes = b"",
        backend: str = "auto",
        close_inner: bool = True,
    ):
        self._inner = inner
        self._close_inner = close_inner
        self._mode = mode
        if "w" in mode or "a" in mode or "x" in mode:
            self._writer = FrameWriter(inner, settings, backend=backend)
            self._reader = None
        else:
            self._reader = FrameReader(inner, dictionary=dictionary, backend=backend)
            self._writer = None
        self._pos = 0

    def readable(self):
        return self._reader is not None

    def writable(self):
        return self._writer is not None

    def read(self, n: int = -1) -> bytes:
        if self._reader is None:
            raise io.UnsupportedOperation("not open for reading")
        out = self._reader.read(n)
        self._pos += len(out)
        return out

    def read1(self, n: int = -1) -> bytes:
        if self._reader is None:
            raise io.UnsupportedOperation("not open for reading")
        out = self._reader.read1(n if n is not None else -1)
        self._pos += len(out)
        return out

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def write(self, data) -> int:
        if self._writer is None:
            raise io.UnsupportedOperation("not open for writing")
        n = self._writer.write(data)
        self._pos += n
        return n

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def tell(self) -> int:
        return self._pos

    @property
    def length(self) -> int | None:
        """Decoded content length when the frame header carries it."""
        if self._reader is not None:
            return self._reader.frame_length()
        return None

    def close(self):
        if self.closed:
            return
        try:
            if self._writer is not None:
                self._writer.close()
        finally:
            if self._close_inner and hasattr(self._inner, "close"):
                self._inner.close()
            super().close()


def open(
    filename,
    mode: str = "rb",
    settings: EncoderSettings | None = None,
    dictionary: bytes = b"",
    backend: str = "auto",
):
    """Open an `.lz4` file for reading or writing (like ``gzip.open``)."""
    import builtins

    if hasattr(filename, "read") or hasattr(filename, "write"):
        inner = filename
        close_inner = False
    else:
        inner = builtins.open(filename, mode if "b" in mode else mode + "b")
        close_inner = True
    return LZ4FrameFile(
        inner,
        mode=mode,
        settings=settings,
        dictionary=dictionary,
        backend=backend,
        close_inner=close_inner,
    )
