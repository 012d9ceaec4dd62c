"""Multi-host (multi-process) block-parallel LZ4.

The reference is single-threaded (SURVEY.md §2: no distributed runtime); the
TPU-native scale-out design is green-field (SURVEY.md §5 "Distributed
communication backend"): LZ4 frame blocks are independent, so the frame's
block axis shards across processes/hosts, with only three tiny cross-host
exchanges:

1. **preset-dictionary broadcast** (chained/preset-dict frames): process 0's
   64 KB window to everyone — `broadcast_dictionary`;
2. **compressed-length all-gather**: i32 per block, so every process can
   compute every block's frame offset with a prefix sum — inside
   `compress_distributed`;
3. **frame-order gather** of the variable-length compressed payloads to the
   assembling process — `process_allgather` over fixed-capacity lanes.

On a real pod slice these ride ICI within a slice and DCN across hosts via
jax's collective stack; the same code runs multi-process on CPU (the
2-process test in `tests/test_multihost.py`) because it only uses
`jax.experimental.multihost_utils` primitives over a global mesh.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "init_from_env",
    "broadcast_dictionary",
    "compress_distributed",
    "decompress_distributed",
    "local_block_range",
]


def init_from_env(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or LZ4TPU_* environment
    variables.  Returns False (no-op) when unconfigured — single-process
    callers fall straight through to the local paths."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "LZ4TPU_COORDINATOR"
    )
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("LZ4TPU_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("LZ4TPU_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def broadcast_dictionary(dictionary: bytes | None, max_len: int = 65536) -> bytes:
    """Broadcast process 0's preset dictionary to every process (the
    chained-frame 64 KB window everyone must agree on before encoding)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return bytes(dictionary or b"")
    buf = np.zeros(max_len + 4, np.uint8)
    if jax.process_index() == 0 and dictionary:
        d = bytes(dictionary[-max_len:])
        buf[:4] = np.frombuffer(
            np.uint32(len(d)).tobytes(), np.uint8
        )
        buf[4 : 4 + len(d)] = np.frombuffer(d, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    (n,) = np.frombuffer(out[:4].tobytes(), np.uint32)
    return out[4 : 4 + int(n)].tobytes()


def local_block_range(n_blocks: int, process_id: int, n_processes: int):
    """Contiguous block range [start, stop) owned by a process (frame order
    is preserved by contiguous ownership)."""
    per = -(-n_blocks // n_processes)
    start = min(process_id * per, n_blocks)
    stop = min(start + per, n_blocks)
    return start, stop


def compress_distributed(
    data: bytes,
    block_size: int = 1 << 20,
    level: int = 0,
    settings=None,
) -> bytes | None:
    """Compress ``data`` (replicated input) into one LZ4 frame, with the
    block axis sharded across processes.

    Every process encodes only its contiguous block range; compressed
    lengths are all-gathered (the frame-offset prefix sum), payload lanes
    are gathered in frame order, and every process returns the identical
    assembled frame (process_allgather is an all-gather — symmetric by
    construction; callers typically write it out on process 0 only).

    CHAINED frames shard too: block k's dictionary is the previous 64 KB
    of *plaintext*, and the input is replicated, so every process already
    holds every block's window — chained encode is as parallel as
    independent encode (the multi-host twin of
    ``parallel.encode_blocks_chained_device``; only chained *decode* is
    inherently sequential).  Output is byte-identical to the sequential
    host FrameWriter's chained frame (gated by tests/test_multihost.py).
    """
    import struct

    import jax
    from jax.experimental import multihost_utils

    from ..block import api as block_api
    from ..constants import compress_bound
    from ..frame.descriptor import EncoderSettings
    from ..frame.header import build_header
    from ..xxh32 import xxh32

    settings = settings or EncoderSettings(
        chain_blocks=False, block_size=block_size, compression_level=level
    )
    chained = settings.chain_blocks
    block_size = settings.block_size
    level = settings.compression_level
    d = settings.to_descriptor()

    n = len(data)
    n_blocks = max(1, -(-n // block_size))
    pid = jax.process_index()
    nproc = jax.process_count()
    start, stop = local_block_range(n_blocks, pid, nproc)
    per = -(-n_blocks // nproc)  # lanes per process (fixed shape)

    # --- local encode of owned blocks ---------------------------------
    cap = compress_bound(block_size)
    lanes = np.zeros((per, cap), np.uint8)
    lane_lens = np.zeros((per,), np.int32)
    stored = np.zeros((per,), np.int32)
    for i, b in enumerate(range(start, stop)):
        off = b * block_size
        raw = data[off : min(off + block_size, n)]
        window = data[max(0, off - 65536) : off] if chained else b""
        # chained frames are the dense-geometry family for every block
        # (the host FrameWriter's chain encoders), independent blocks the
        # canonical default — same rules as frame.compress
        comp = block_api.encode(
            raw, level=level, dictionary=window,
            geometry="dense" if chained else "canonical",
        )
        if comp is None or len(comp) >= len(raw):
            comp, stored[i] = raw, 1
        lanes[i, : len(comp)] = np.frombuffer(comp, np.uint8)
        lane_lens[i] = len(comp)

    # --- cross-host exchanges ------------------------------------------
    if nproc > 1:
        all_lens = np.asarray(
            multihost_utils.process_allgather(lane_lens)
        ).reshape(nproc * per)
        all_stored = np.asarray(
            multihost_utils.process_allgather(stored)
        ).reshape(nproc * per)
        all_lanes = np.asarray(
            multihost_utils.process_allgather(lanes)
        ).reshape(nproc * per, cap)
    else:
        all_lens, all_stored, all_lanes = lane_lens, stored, lanes

    # --- frame assembly (identical on every process) -------------------
    # empty content: header + EndMark only (the canonical LZ4F empty
    # frame) — a zero-length stored-block word is a frame-spec gray zone
    parts = [build_header(d)]
    for b in range(n_blocks if n else 0):
        ln = int(all_lens[b])
        payload = all_lanes[b, :ln].tobytes()
        word = ln | (0x80000000 if all_stored[b] else 0)
        parts.append(struct.pack("<I", word))
        parts.append(payload)
        if d.block_checksum:
            parts.append(struct.pack("<I", xxh32(payload)))
    parts.append(b"\x00\x00\x00\x00")
    if d.content_checksum:
        parts.append(struct.pack("<I", xxh32(data)))
    return b"".join(parts)


def decompress_distributed(frame: bytes) -> bytes:
    """Decompress one independent-block LZ4 frame with the block axis
    sharded across processes (the decode mirror of
    ``compress_distributed``).

    The frame bytes are replicated, so every process scans the (cheap)
    block table locally, decodes only its contiguous block range, and the
    fixed-capacity decompressed lanes are all-gathered in frame order.
    Every process returns the identical plaintext; chained frames are
    rejected (their 64 KB history makes block decode sequential — use the
    local paths).

    Reference anchor: no distributed runtime exists in the reference
    (SURVEY.md §2 "Parallelism strategies"); this is the green-field
    TPU-native scale-out axis required by BASELINE.json.
    """
    import jax
    from jax.experimental import multihost_utils

    from ..block import api as block_api
    from ..frame.header import LZ4FormatError
    from ..frame.api import _scan_single_frame
    from ..xxh32 import xxh32

    scan = _scan_single_frame(frame)
    if scan is None:
        raise LZ4FormatError(
            "distributed decode needs a single independent-block frame"
        )
    d, blocks, tail_pos = scan
    if not blocks:
        out = b""
    else:
        bs = d.block_size
        n_blocks = len(blocks)
        pid = jax.process_index()
        nproc = jax.process_count()
        start, stop = local_block_range(n_blocks, pid, nproc)
        per = -(-n_blocks // nproc)

        lanes = np.zeros((per, bs), np.uint8)
        lane_lens = np.zeros((per,), np.int32)
        for i, b in enumerate(range(start, stop)):
            pos, length, stored = blocks[b]
            payload = frame[pos : pos + length]
            if stored:
                raw = payload
            else:
                raw = block_api.decode(payload, capacity=bs)
            if len(raw) > bs:
                raise LZ4FormatError("block exceeds frame block size")
            lanes[i, : len(raw)] = np.frombuffer(raw, np.uint8)
            lane_lens[i] = len(raw)

        if nproc > 1:
            all_lens = np.asarray(
                multihost_utils.process_allgather(lane_lens)
            ).reshape(nproc * per)
            all_lanes = np.asarray(
                multihost_utils.process_allgather(lanes)
            ).reshape(nproc * per, bs)
        else:
            all_lens, all_lanes = lane_lens, lanes
        out = b"".join(
            all_lanes[b, : int(all_lens[b])].tobytes()
            for b in range(n_blocks)
        )

    if d.content_checksum:
        import struct

        (expected,) = struct.unpack_from("<I", frame, tail_pos)
        if xxh32(out) != expected:
            raise LZ4FormatError("content checksum mismatch")
    if d.content_length is not None and len(out) != d.content_length:
        raise LZ4FormatError("content length mismatch")
    return out
