"""Block-parallel LZ4 over a TPU device mesh.

The reference is single-threaded (SURVEY.md §2: "parallelism: none") — the
TPU-native design's scaling axis is the LZ4 frame's *independent blocks*
(frame descriptor ``block_independence=True``): each block compresses and
decompresses with zero cross-block state, so a batch of blocks shards
data-parallel across chips with `jax.sharding` + `shard_map` and no
collectives on the hot path.  Compressed lengths (a tiny i32[B] vector) are
all that crosses back to the host for frame assembly, where a prefix sum
gives each block's output offset (the analog of the reference's sequential
`WriteBlock` loop, `Frames/LZ4FrameWriter.blocking.cs:22-33`).

Chained (dependent) blocks carry a 64 KB dictionary from block to block
(reference `LZ4_saveDict`, `Engine/LL.tools.cs:195-213`): inherently
sequential across blocks, expressed here as a host-driven loop over the
single-block kernels (frame layer) — parallelism then comes from multiple
concurrent streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import compress_bound
from ..ops.common import align1024
from ..ops.decode_jax import _parse_and_decode
from ..ops.encode_jax import _PAD_TAIL, _encode_core, level_to_depth


def comp_capacity(block_size: int) -> int:
    """Aligned compressed-buffer width for decode inputs."""
    return align1024(compress_bound(block_size) + 8)

__all__ = [
    "encode_blocks",
    "decode_blocks",
    "encode_chunked",
    "decode_chunked",
    "encode_blocks_device",
    "decode_blocks_device",
    "make_mesh",
    "batched_encode_fn",
    "batched_decode_fn",
    "sharded_encode_fn",
    "sharded_decode_fn",
    "split_blocks",
    "pack_blocks",
]


# Per-dispatch batch cap: the whole kernel pipeline must stay VMEM-resident
# (~16 MB/core).  At 32 x 64KB blocks the i32 intermediates are ~8 MB and XLA
# keeps the fused pipeline on-chip (~0.2 ms/call); much larger batches spill
# to HBM and fall off a performance cliff.  Larger payloads are dispatched as
# a pipeline of capped calls (async dispatch overlaps them).
MAX_BLOCKS_PER_CALL = 32


def _batch_cap(block_size: int) -> int:
    """Scale the per-call batch so batch*block_size stays ~2 MiB."""
    target = MAX_BLOCKS_PER_CALL * 65536
    return max(1, min(MAX_BLOCKS_PER_CALL, target // max(block_size, 1)))


# ---------------------------------------------------------------------------
# Batched (vmapped) kernels
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bcap", "k_depth"))
def batched_encode(bufs, lens, bcap: int, k_depth: int = 1):
    """Encode B independent blocks.

    bufs: u8[B, bcap + PAD] (block bytes at [0, lens[b]), zero pad after).
    lens: i32[B] true lengths.
    Returns (out u8[B, compress_bound(bcap)], out_lens i32[B]).
    """
    zero = jnp.zeros_like(lens)
    f = functools.partial(_encode_core, dcap=0, bcap=bcap, k_depth=k_depth)
    return jax.vmap(f)(bufs, lens, zero)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def batched_decode(comps, comp_lens, out_cap: int):
    """Decode B independent blocks.

    comps: u8[B, CAP] zero-padded compressed blocks.
    Returns (out u8[B, out_cap], out_lens i32[B], errs i32[B]).
    """
    nodict = jnp.zeros((comps.shape[0], 8), jnp.int32)
    zero = jnp.zeros_like(comp_lens)

    def f(c, n, d, dl):
        return _parse_and_decode(c.astype(jnp.int32), n, d, dl, out_cap)

    return jax.vmap(f)(comps, comp_lens, nodict, zero)


# The staged kernels keep the whole compressed/raw block in SMEM for the
# scalar parse; SMEM is 1 MB and block buffers are double-buffered, so
# staged blocks above 64 KB do not fit.  DECODE has no cap anymore: larger
# blocks route to the ring-streamed kernel (`ops/decode_pallas_stream`),
# which DMAs the stream through constant-size SMEM rings.  ENCODE above
# the cap routes to the native host engine.
PALLAS_MAX_BLOCK = 65536


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _bucket_batch(nb: int) -> int:
    """Round a batch dimension up to the next power of two (min 1).

    The device executables are specialized per (batch, capacity) shape and
    a fresh shape costs 1 s - 10 min of remote compile; bucketing bounds
    production traffic to O(log B) executables per block size.  Padding
    rows are len-0 (encode) or the 1-byte empty block (decode) — both
    decode/encode cleanly and are sliced off before returning."""
    b = 1
    while b < nb:
        b <<= 1
    return b


def _pad_batch(arr, lens, nb_to: int, fill_empty_block: bool = False):
    """Pad arr/lens with `nb_to - B` inert rows (see _bucket_batch)."""
    nb = arr.shape[0]
    if nb == nb_to:
        return arr, lens
    pad = np.zeros((nb_to - nb, arr.shape[1]), arr.dtype)
    plens = np.zeros((nb_to - nb,), np.int32)
    if fill_empty_block:
        plens[:] = 1  # pad[:, 0] is already 0x00: the empty LZ4 block
    return np.vstack([arr, pad]), np.concatenate(
        [np.asarray(lens, np.int32), plens]
    )


def warmup_device(block_size: int = 65536, levels=(0,),
                  max_blocks: int = 256, decode: bool = True) -> int:
    """Precompile the production device executables for ``block_size``.

    Device executables are specialized per (batch-bucket, capacity, mode)
    shape and a fresh shape compiles in 1 s - 10 min on a remote-compile
    runtime; this walks every power-of-two batch bucket up to
    ``max_blocks`` with tiny payloads and decodes each bucket once per
    fast-arm mode ("full2" AND "full2v" — production picks either by
    batch ratio, see `_pick_decode_mode`), so production traffic never
    pays first-compile latency on either pick.  Returns the number of
    (bucket, level) combos warmed.  No-op off-TPU.

    Above 64 KB blocks the DEFAULT encode route is the native host engine
    (no device executable to warm); the streaming device encoder is only
    warmed when `LZ4TPU_DEVICE_STREAM_ENCODE=1` opts it in, matching what
    production traffic will run.  Streaming decode (the >64 KB decode
    route) is always warmed in both modes."""
    if not _on_tpu():
        return 0
    warmed = 0
    payload = b"warmup payload " * 8
    bucket = 1
    while bucket <= max(1, max_blocks):
        # exactly the shapes production traffic uses: split_blocks's
        # padded input rows and comp_capacity-sized compressed rows
        bufs, lens = split_blocks(payload, block_size, pad_to=bucket)
        bufs, lens = bufs[:bucket], lens[:bucket]
        for level in levels:
            out, out_lens = encode_blocks_device(
                bufs, lens, block_size, int(level)
            )
            if decode:
                cap = comp_capacity(block_size)
                comps = np.zeros((bucket, cap), np.uint8)
                w = min(cap, out.shape[1])
                comps[:, :w] = out[:, :w]
                for dmode in ("full2", "full2v"):
                    decode_blocks_device(
                        comps, out_lens, block_size, mode=dmode
                    )
            warmed += 1
        bucket <<= 1
    return warmed


def _prefer_device_stream_encode() -> bool:
    """Opt-in: encode >64KB blocks with the streaming Pallas kernel instead
    of the (faster) native host engine — for device-resident pipelines."""
    import os

    return os.environ.get("LZ4TPU_DEVICE_STREAM_ENCODE", "") == "1"


def _use_pallas(block_size: int = 65536) -> bool:
    """Staged-kernel gate: Pallas on real TPUs for blocks that fit SMEM;
    the XLA dense kernels remain for CPU meshes (tests, the driver's
    virtual-device dry-run) where Mosaic cannot compile."""
    return block_size <= PALLAS_MAX_BLOCK and _on_tpu()


def encode_blocks_device(bufs_np, lens_np, bcap: int, level: int = 0,
                         acceleration: int = 1, geometry: str = "canonical"):
    """Encode a batch on the device with the best available kernel.

    Returns (out u8[B, OCAP], out_lens i32[B]) as numpy.  The v5 kernel
    covers the whole ladder (FAST, HC lookahead, exact optimal parse) for
    blocks <= 64KB; above that the streaming kernel covers the same ladder
    on device (opt-in / host-unavailable), with the native host engine as
    the default big-block route (it is faster per chip).
    """
    nb = np.asarray(bufs_np).shape[0]
    if bcap > PALLAS_MAX_BLOCK and _on_tpu():
        # default: the native host engine is ~20x faster per chip than the
        # scalar device pipeline for big-block encode; route honestly and
        # leave LZ4TPU_DEVICE_STREAM_ENCODE=1 for device-resident pipelines
        # that want to avoid the host round-trip
        if not _prefer_device_stream_encode():
            host = _host_encode_batch(bufs_np, lens_np, bcap, level, geometry)
            if host is not None:
                return host
        # streaming encoder: same body as the staged kernel over SMEM
        # rings + HBM DMA, any block size (ops/encode_pallas_stream)
        from ..ops.encode_pallas_stream import encode_blocks_pallas_stream

        bufs_p, lens_p = _pad_batch(
            np.asarray(bufs_np), lens_np, _bucket_batch(nb)
        )
        out, out_lens, errs = encode_blocks_pallas_stream(
            bufs_p, lens_p, bcap, int(level),
            acceleration, fast_schedule=geometry,
        )
        if errs.any():
            raise RuntimeError("pallas stream encoder overflow")
        return out[:nb], out_lens[:nb]
    if _use_pallas(bcap):
        # v5: all-scalar packed-word kernel (see ops/encode_pallas5)
        from ..ops.encode_pallas5 import encode_blocks_pallas5

        bufs_p, lens_p = _pad_batch(
            np.asarray(bufs_np), lens_np, _bucket_batch(nb)
        )
        out, out_lens, errs = encode_blocks_pallas5(
            bufs_p, lens_p, bcap, int(level),
            acceleration, fast_schedule=geometry,
        )
        if errs.any():
            raise RuntimeError("pallas encoder overflow")
        return out[:nb], out_lens[:nb]
    return encode_chunked(bufs_np, lens_np, bcap, level_to_depth(level))


def _host_encode_batch(bufs_np, lens_np, bcap: int, level: int,
                       geometry: str = "canonical"):
    """Batch encode through the native host engine (thread pool; ctypes
    releases the GIL).  Returns None when the native codec is unavailable."""
    try:
        from .. import native
    except ImportError:
        return None
    if not native.available():
        return None
    import os

    from ..pool import map_all

    bufs = np.asarray(bufs_np)
    lens = np.asarray(lens_np)
    nb = bufs.shape[0]
    ocap = align1024(compress_bound(bcap))
    out = np.zeros((nb, ocap), np.uint8)
    out_lens = np.zeros((nb,), np.int32)

    def one(b):
        comp = native.encode(
            bufs[b, : int(lens[b])].tobytes(), level, geometry=geometry
        )
        out[b, : len(comp)] = np.frombuffer(comp, np.uint8)
        out_lens[b] = len(comp)

    map_all(min(8, os.cpu_count() or 1), one, range(nb))
    return out, out_lens


def encode_blocks_chained_device(data: bytes, block_size: int,
                                 level: int = 0, acceleration: int = 1):
    """Chained-block batch encode on device: block k's dictionary is the
    previous 64 KB of PLAINTEXT (`block/incremental.py` ChainEncoder
    semantics, reference `LZ4FastChainEncoder` + `LZ4_saveDict`), which is
    known up front — so unlike chained DECODE, chained encode is
    embarrassingly parallel.  One streaming-kernel call covers every block
    at any block size, byte-identical to the host chain encoder.

    Returns the list of per-block compressed payloads (no stored-block
    fallback applied — the caller compares against the raw length)."""
    from ..ops.encode_pallas_stream import encode_blocks_pallas_stream

    n = len(data)
    nb = -(-n // block_size)
    nb_p = _bucket_batch(nb)  # bounded executable family (see _bucket_batch)
    arr = np.frombuffer(data, np.uint8)
    bufs = np.zeros((nb_p, block_size), np.uint8)
    lens = np.zeros((nb_p,), np.int32)
    dicts = np.zeros((nb_p, 65536), np.uint8)
    dls = np.zeros((nb_p,), np.int32)
    for k in range(nb):
        start = k * block_size
        raw = arr[start : min(start + block_size, n)]
        bufs[k, : len(raw)] = raw
        lens[k] = len(raw)
        dl = min(start, 65536)
        if dl:
            dicts[k, 65536 - dl :] = arr[start - dl : start]
        dls[k] = dl
    out, clens, errs = encode_blocks_pallas_stream(
        bufs, lens, block_size, int(level), acceleration,
        dicts=dicts, dict_lens=dls,
    )
    if np.asarray(errs)[:nb].any():
        raise RuntimeError("pallas chained encoder overflow")
    return [out[k, : int(clens[k])].tobytes() for k in range(nb)]


def _pick_decode_mode(clens_np, out_cap: int) -> str:
    """Workload-aware fast-arm choice for the staged v6 decoder.

    mode="full2v" extends the fused fast arm to single-extension-byte
    match VLE — measured +8% on HC/OPT-shaped streams and -2.5% on
    L00-shaped ones (PERFORMANCE.md round-3 session 3).  The free host
    signal separating the two is the compressed ratio: canonical FAST
    lands ~0.45 on mixed data while HC/OPT land ~0.31, so denser-than-0.40
    batches route to full2v.  `LZ4TPU_DECODE_MODE=full2|full2v` pins it.
    """
    import os

    env = os.environ.get("LZ4TPU_DECODE_MODE", "")
    if env in ("full2", "full2v"):
        return env
    clens = np.asarray(clens_np)
    ratio = float(clens.sum()) / float(max(1, clens.shape[0] * out_cap))
    return "full2v" if ratio < 0.40 else "full2"


def decode_blocks_device(comps_np, clens_np, out_cap: int,
                         dicts_np=None, dict_lens_np=None,
                         mode: str | None = None):
    """Decode a batch on the device with the best available kernel
    (optionally with per-block preset dictionaries, u8[B, 65536]
    right-aligned + lengths).

    ``mode`` ("full2"/"full2v") overrides the workload-aware pick — used
    by `warmup_device` to precompile both fast-arm executables, and by
    A/B harnesses.  Returns (out u8[B, out_cap], lens i32[B],
    errs i32[B]) as numpy.
    """
    import os

    if dicts_np is not None:
        dicts_np = np.asarray(dicts_np)
        dict_lens_np = np.asarray(dict_lens_np, np.int32)
    nb = np.asarray(comps_np).shape[0]

    def _pad_all(comps, clens):
        nb_to = _bucket_batch(nb)
        comps_p, clens_p = _pad_batch(
            np.asarray(comps), clens, nb_to, fill_empty_block=True
        )
        dp, dlp = dicts_np, dict_lens_np
        if dp is not None and dp.shape[0] != nb_to:
            dp, dlp = _pad_batch(dp, dlp, nb_to)
        return comps_p, clens_p, dp, dlp

    # Dict-mode batches route through the STREAMING decoder even when the
    # blocks would fit the staged kernel: the staged dict variant's SMEM
    # budget (input 2x266 KB + out 2x131 KB + dict 2x64 KB) sits near the
    # 1 MB limit, while the ring decoder's footprint is constant at any
    # block size.  LZ4TPU_STAGED_DICT_DECODE=1 re-enables the staged
    # variant (kept, with its tests, for A/B).
    staged_dict_ok = (
        dicts_np is None
        or os.environ.get("LZ4TPU_STAGED_DICT_DECODE", "") == "1"
    )
    if _use_pallas(out_cap) and staged_dict_ok:
        # v6: all-scalar packed-word kernel with branch-merged parse and
        # full-word copies (see ops/decode_pallas6) — the fastest measured
        # decode path on real v5e hardware (53 vs v5's 46 MB/s per call)
        from ..ops.decode_pallas6 import decode_blocks_pallas6

        comps_p, clens_p, dp, dlp = _pad_all(comps_np, clens_np)
        out, olens, errs = decode_blocks_pallas6(
            comps_p, clens_p, out_cap, dp, dlp,
            mode=mode or _pick_decode_mode(clens_np, out_cap),
        )
        return out[:nb], olens[:nb], errs[:nb]
    if _on_tpu():
        # 256KB-4MB blocks (and dict-mode batches of any size): same scalar
        # pipeline over SMEM rings with HBM DMA streaming (constant on-chip
        # footprint, no size cap).  full2v is the streaming DEFAULT: unlike
        # the staged kernel, it wins on BOTH stream shapes here (+38% L09,
        # +10% L00 — ml-VLE sequences avoid the ensure-laden slow arm
        # entirely); the env pin maps full2 -> the plain windowed run for A/B
        env = mode or os.environ.get("LZ4TPU_DECODE_MODE", "")
        from ..ops.decode_pallas_stream import decode_blocks_pallas_stream

        comps_p, clens_p, dp, dlp = _pad_all(comps_np, clens_np)
        out, olens, errs = decode_blocks_pallas_stream(
            comps_p, clens_p, out_cap, dp, dlp,
            mode="full" if env == "full2" else "full2v",
        )
        return out[:nb], olens[:nb], errs[:nb]
    if dicts_np is not None:
        raise NotImplementedError(
            "dictionary batches need the Pallas device kernels"
        )
    return decode_chunked(comps_np, clens_np, out_cap)


def stage_encode_chunks(bufs, lens, bcap: int):
    """Pre-stage host block arrays as device-resident VMEM-sized chunks."""
    nb = bufs.shape[0]
    cap = _batch_cap(bcap)
    chunks = []
    for i in range(0, nb, cap):
        b = np.asarray(bufs[i : i + cap])
        l = np.asarray(lens[i : i + cap])
        if b.shape[0] < cap:
            b = np.pad(b, ((0, cap - b.shape[0]), (0, 0)))
            l = np.pad(l, (0, cap - l.shape[0]))
        chunks.append((jax.device_put(jnp.asarray(b)), jax.device_put(jnp.asarray(l))))
    jax.block_until_ready([c[0] for c in chunks])
    return chunks, nb


def run_encode_chunks(chunks, bcap: int, k_depth: int = 1):
    """Dispatch all staged chunks (async) and block once: the timed hot path."""
    outs = [batched_encode(b, l, bcap, k_depth) for b, l in chunks]
    jax.block_until_ready(outs)
    return outs


def stage_decode_chunks(comps, comp_lens, out_cap: int):
    nb = comps.shape[0]
    cap = _batch_cap(out_cap)
    chunks = []
    for i in range(0, nb, cap):
        c = np.asarray(comps[i : i + cap])
        l = np.asarray(comp_lens[i : i + cap])
        if c.shape[0] < cap:
            # 1-byte empty-block pads (0x00 token: len 0, err 0) — near
            # zero cost, vs re-decoding row 0 once per pad row
            c, l = _pad_batch(c, l, cap, fill_empty_block=True)
        chunks.append((jax.device_put(jnp.asarray(c)), jax.device_put(jnp.asarray(l))))
    jax.block_until_ready([c[0] for c in chunks])
    return chunks, nb


def run_decode_chunks(chunks, out_cap: int):
    outs = [batched_decode(c, l, out_cap) for c, l in chunks]
    jax.block_until_ready(outs)
    return outs


def encode_chunked(bufs, lens, bcap: int, k_depth: int = 1):
    """Encode any number of blocks by pipelining VMEM-sized batched calls.

    bufs/lens may be numpy or jax arrays; returns (out, out_lens) as numpy.
    """
    nb = bufs.shape[0]
    cap = _batch_cap(bcap)
    outs, olens = [], []
    for i in range(0, nb, cap):
        b = jnp.asarray(bufs[i : i + cap])
        l = jnp.asarray(lens[i : i + cap])
        if b.shape[0] < cap:  # pad to the jitted shape
            pad = cap - b.shape[0]
            b = jnp.pad(b, ((0, pad), (0, 0)))
            l = jnp.pad(l, (0, pad))
        outs.append(batched_encode(b, l, bcap, k_depth))
    jax.block_until_ready(outs)
    out = np.concatenate([np.asarray(o[0]) for o in outs])[:nb]
    ol = np.concatenate([np.asarray(o[1]) for o in outs])[:nb]
    return out, ol


def decode_chunked(comps, comp_lens, out_cap: int):
    """Decode any number of blocks by pipelining VMEM-sized batched calls."""
    nb = comps.shape[0]
    cap = _batch_cap(out_cap)
    outs = []
    for i in range(0, nb, cap):
        c = np.asarray(comps[i : i + cap])
        l = np.asarray(comp_lens[i : i + cap])
        if c.shape[0] < cap:
            # empty-block pads: see stage_decode_chunks
            c, l = _pad_batch(c, l, cap, fill_empty_block=True)
        outs.append(batched_decode(jnp.asarray(c), jnp.asarray(l), out_cap))
    jax.block_until_ready(outs)
    out = np.concatenate([np.asarray(o[0]) for o in outs])[:nb]
    ol = np.concatenate([np.asarray(o[1]) for o in outs])[:nb]
    er = np.concatenate([np.asarray(o[2]) for o in outs])[:nb]
    return out, ol, er


def batched_encode_fn(bcap: int, k_depth: int = 1):
    """Unjitted batched encoder (for composing under shard_map/jit)."""
    f = functools.partial(_encode_core, dcap=0, bcap=bcap, k_depth=k_depth)

    def run(bufs, lens):
        return jax.vmap(f)(bufs, lens, jnp.zeros_like(lens))

    return run


def batched_decode_fn(out_cap: int):
    def run(comps, comp_lens):
        nodict = jnp.zeros((comps.shape[0], 8), jnp.int32)

        def f(c, n, d, dl):
            return _parse_and_decode(c.astype(jnp.int32), n, d, dl, out_cap)

        return jax.vmap(f)(comps, comp_lens, nodict, jnp.zeros_like(comp_lens))

    return run


# ---------------------------------------------------------------------------
# Mesh-sharded kernels
# ---------------------------------------------------------------------------


def make_mesh(devices=None, axis: str = "block") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices; the block axis of
    an LZ4 frame shards along it."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@functools.lru_cache(maxsize=32)
def sharded_encode_fn(mesh: Mesh, bcap: int, k_depth: int = 1, axis: str = "block"):
    """jit(shard_map(batched encode)) over ``mesh``: batch dim sharded across
    the block axis, zero collectives (blocks are independent)."""
    run = batched_encode_fn(bcap, k_depth)
    spec = P(axis)
    f = shard_map(
        run,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=32)
def sharded_decode_fn(mesh: Mesh, out_cap: int, axis: str = "block"):
    run = batched_decode_fn(out_cap)
    spec = P(axis)
    f = shard_map(
        run,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(f)


# ---------------------------------------------------------------------------
# Host-side split / assemble
# ---------------------------------------------------------------------------


def split_blocks(data: bytes, block_size: int, pad_to: int | None = None):
    """Split ``data`` into fixed-capacity padded blocks.

    Returns (bufs u8[B, block_size + _PAD_TAIL], lens i32[B]).  If ``pad_to``
    is given, B is rounded up to a multiple of it (extra blocks have len 0) so
    the batch divides evenly across a mesh.
    """
    n = len(data)
    nb = max(1, -(-n // block_size))
    if pad_to:
        nb = -(-nb // pad_to) * pad_to
    bufs = np.zeros((nb, block_size + _PAD_TAIL), np.uint8)
    lens = np.zeros((nb,), np.int32)
    view = np.frombuffer(data, np.uint8)
    for b in range(min(nb, -(-n // block_size) if n else 0)):
        chunk = view[b * block_size : min((b + 1) * block_size, n)]
        bufs[b, : len(chunk)] = chunk
        lens[b] = len(chunk)
    return bufs, lens


def pack_blocks(outs: np.ndarray, out_lens: np.ndarray) -> list[bytes]:
    """Gather variable-length compressed blocks back to host byte strings in
    frame order."""
    return [bytes(outs[b, : int(out_lens[b])]) for b in range(outs.shape[0])]


def encode_blocks(
    data: bytes,
    block_size: int = 1 << 20,
    level: int = 0,
    mesh: Mesh | None = None,
    geometry: str = "canonical",
) -> list[bytes]:
    """One-shot: split ``data`` into independent blocks, encode them
    block-parallel (across ``mesh`` if given), return compressed blocks in
    frame order."""
    k_depth = level_to_depth(level)
    if mesh is not None:
        nd = mesh.devices.size
        # pad to the bucketed batch (a multiple of nd): bounded executable
        # family on remote-compile runtimes (see _bucket_batch)
        nb0 = max(1, -(-len(data) // block_size))
        bufs, lens = split_blocks(
            data, block_size,
            pad_to=-(-_bucket_batch(nb0) // nd) * nd,
        )
        fn = sharded_encode_fn(mesh, block_size, k_depth, mesh.axis_names[0])
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        bufs = jax.device_put(jnp.asarray(bufs), sh)
        lens_d = jax.device_put(jnp.asarray(lens), sh)
        outs, out_lens = fn(bufs, lens_d)
    else:
        bufs, lens = split_blocks(data, block_size)
        outs, out_lens = encode_blocks_device(
            bufs, lens, block_size, level, geometry=geometry
        )
    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)
    nb_real = max(1, -(-len(data) // block_size)) if data else 0
    return pack_blocks(outs[:nb_real], out_lens[:nb_real])


def decode_blocks(
    blocks: list[bytes],
    block_size: int,
    total_length: int | None = None,
    mesh: Mesh | None = None,
) -> bytes:
    """Decode independent compressed blocks block-parallel and concatenate."""
    from ..block.hostref import LZ4Error

    if not blocks:
        return b""
    cap = comp_capacity(block_size)
    nb = len(blocks)
    nd = mesh.devices.size if mesh is not None else 1
    nb_pad = -(-_bucket_batch(nb) // nd) * nd  # bucketed (see _bucket_batch)
    comps = np.zeros((nb_pad, cap), np.uint8)
    clens = np.zeros((nb_pad,), np.int32)
    for b, blk in enumerate(blocks):
        comps[b, : len(blk)] = np.frombuffer(blk, np.uint8)
        clens[b] = len(blk)
    # padding rows are the 1-byte EMPTY block (0x00 token: decodes to len 0,
    # err 0 on the Pallas and XLA decoders alike) — near-zero pad cost.
    # Duplicating block 0 instead would re-decode it per pad row, and with
    # power-of-two bucketing the pad count can approach the real batch size
    # (nb=17 -> nb_pad=32: almost 2x the decode work).
    clens[nb:nb_pad] = 1  # comps rows are already zeroed: 0x00 token
    if mesh is not None:
        fn = sharded_decode_fn(mesh, block_size, mesh.axis_names[0])
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        outs, out_lens, errs = fn(
            jax.device_put(jnp.asarray(comps), sh),
            jax.device_put(jnp.asarray(clens), sh),
        )
    else:
        # mode picked from the REAL rows only: the 1-byte pad rows would
        # dilute the batch-ratio signal (nb=17 -> 32 pads ~halve it) and
        # flip FAST-shaped batches to full2v (round-5 review finding)
        outs, out_lens, errs = decode_blocks_device(
            comps, clens, block_size,
            mode=_pick_decode_mode(clens[:nb], block_size),
        )
    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)
    errs = np.asarray(errs)
    if errs[:nb].any():
        bad = int(np.nonzero(errs[:nb])[0][0])
        raise LZ4Error(f"malformed LZ4 block {bad} (err={int(errs[bad])})")
    parts = [outs[b, : int(out_lens[b])] for b in range(nb)]
    out = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    result = out.tobytes()
    if total_length is not None and len(result) != total_length:
        raise LZ4Error(
            f"decoded length {len(result)} != expected {total_length}"
        )
    return result
