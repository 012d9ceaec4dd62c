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
from ..ops.decode_jax import _parse_and_decode
from ..ops.encode_jax import _PAD_TAIL, _encode_core, level_to_depth

__all__ = [
    "encode_blocks",
    "decode_blocks",
    "make_mesh",
    "batched_encode_fn",
    "batched_decode_fn",
    "sharded_encode_fn",
    "sharded_decode_fn",
    "split_blocks",
    "pack_blocks",
]


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
) -> list[bytes]:
    """One-shot: split ``data`` into independent blocks, encode them
    block-parallel (across ``mesh`` if given), return compressed blocks in
    frame order."""
    k_depth = level_to_depth(level)
    if mesh is not None:
        nd = mesh.devices.size
        bufs, lens = split_blocks(data, block_size, pad_to=nd)
        fn = sharded_encode_fn(mesh, block_size, k_depth, mesh.axis_names[0])
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        bufs = jax.device_put(jnp.asarray(bufs), sh)
        lens_d = jax.device_put(jnp.asarray(lens), sh)
        outs, out_lens = fn(bufs, lens_d)
    else:
        bufs, lens = split_blocks(data, block_size)
        outs, out_lens = batched_encode(
            jnp.asarray(bufs), jnp.asarray(lens), block_size, k_depth
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
    cap = compress_bound(block_size) + 8
    nb = len(blocks)
    nd = mesh.devices.size if mesh is not None else 1
    nb_pad = -(-nb // nd) * nd
    comps = np.zeros((nb_pad, cap), np.uint8)
    clens = np.zeros((nb_pad,), np.int32)
    for b, blk in enumerate(blocks):
        comps[b, : len(blk)] = np.frombuffer(blk, np.uint8)
        clens[b] = len(blk)
    # padding rows decode the first block again (ignored) to avoid err flags
    for b in range(nb, nb_pad):
        comps[b] = comps[0]
        clens[b] = clens[0]
    if mesh is not None:
        fn = sharded_decode_fn(mesh, block_size, mesh.axis_names[0])
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        outs, out_lens, errs = fn(
            jax.device_put(jnp.asarray(comps), sh),
            jax.device_put(jnp.asarray(clens), sh),
        )
    else:
        outs, out_lens, errs = batched_decode(
            jnp.asarray(comps), jnp.asarray(clens), block_size
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
