"""Streaming all-scalar LZ4 encoder — arbitrary block sizes (256 KB - 4 MB+).

The staged encoder (`encode_pallas5`) keeps the whole source block in SMEM
as per-byte LE words, capping blocks at 64 KB.  This wrapper runs the SAME
encoder body (`encode_pallas5._encode_body` — FAST, HC lookahead, exact
optimal parse) over ring accessors, so staged and streamed output are
byte-identical by construction:

- **input ring**: per-byte LE words stream HBM -> SMEM in 16 K-position
  chunks (64 KB/slot, 8 slots = a 128 K-position resident window).  The
  encoder reads backward up to 65 535 bytes (candidates/chains) and
  forward with the parse — both stay inside the window for real streams;
  `ensure_chunk` reloads on demand either way, so an adversarial pattern
  (e.g. a back-extension walking far behind a 64 KB-distant candidate)
  degrades to extra DMAs, never to wrong bytes.  Chunks are shaped
  (chunk, 128, 128) so every DMA slice is (8,128)-tile aligned.
- **output ring**: packed words in SMEM (4 x 4 K-word segments), flushed
  to HBM as the frontier approaches the wrap point; the compressed stream
  is append-only so flushed segments are never touched again.
- the hash table / HC chain ring / optimal-parse tables live in SMEM
  scratch exactly as in the staged kernel (positions are absolute).

SMEM footprint: ~610 KB (FAST), ~870 KB (HC), ~930 KB (OPT) — constant in
the block size.  Reference capability anchor: the frame block-size ladder
(`Frames/LZ4FrameWriter.cs:184-189`) whose 1 MB / 4 MB blocks previously
routed to the host engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import compress_bound
from .common import align1024
from .common import _words_le
from .encode_pallas5 import _HLOG, _encode_body

_CW_LOG = 14                   # input chunk: 16K byte-positions
_CW = 1 << _CW_LOG
_CW_ROWS = _CW // 128          # 128 rows of 128 words
_NSLOTS = 8                    # 128K-position resident window
_SEG_WORDS = 1 << 12           # output flush segment: 4K words (16KB)
_SEG_ROWS = _SEG_WORDS // 128  # 32
_N_OSEGS = 4                   # output ring: 16K words (64KB)
_OR_WORDS = _N_OSEGS * _SEG_WORDS


def _i(x):
    return jnp.asarray(x).astype(jnp.int32)


def _encode_stream_one(i, n, acc0, src_w, out_hbm, meta_ref, ring_w, ring_o,
                       state, htab, prev, nti, opt_tab, sem_w, sem_o,
                       attempts: int, ocap: int, opt_sufficient: int,
                       opt_full: bool, src_off=None,
                       profile: str = "full",
                       fast_schedule: str = "canonical", canon_u16=None,
                       canon_raw_verify: bool = True,
                       stale_test: bool = False):
    """Encode block i through the shared body over ring accessors.

    src_w:   HBM i32[B, NC, 128, 128]  per-byte LE words, chunked
    out_hbm: HBM i32[B, NSEG, 32, 128] packed compressed words, segmented
    ring_w:  SMEM i32[1024, 128]       input ring (8 x 128-row chunk slots)
    ring_o:  SMEM i32[128, 128]        output ring (4 x 32-row segments)
    state:   SMEM i32[16]              [0..7] slot chunk ids, [8] flushed
    """
    for s in range(_NSLOTS):
        state[s] = -1
    state[8] = 0  # flushed output segments

    def ensure_chunk(c):
        slot = c & (_NSLOTS - 1)

        @pl.when(state[slot] != c)
        def _():
            dma = pltpu.make_async_copy(
                src_w.at[i, c],
                ring_w.at[pl.ds(slot * _CW_ROWS, _CW_ROWS)],
                sem_w,
            )
            dma.start()
            dma.wait()
            state[slot] = c

    def W(p):
        # clamp: eagerly-evaluated rejected branches can pass p == -1
        # (e.g. byte(cc-1) under a cc > 0 guard); a clamped read returns
        # chunk-0 junk that the guard discards, instead of a bad DMA
        p = jnp.maximum(p, 0)
        c = p >> _CW_LOG
        ensure_chunk(c)
        # slot*128 + in-chunk row == bits [16:7] of p: ONE flat 2-D fold
        return ring_w[(p >> 7) & (_NSLOTS * _CW_ROWS - 1), p & 127]

    def store(wp, v):
        ring_o[(wp >> 7) & (_OR_WORDS // 128 - 1), wp & 127] = _i(v)

    def flush(wp):
        """Flush output segments so ring words wp (and wp+1) are writable."""

        def cond(f):
            return f * _SEG_WORDS + _OR_WORDS <= wp + 2

        def body(f):
            dma = pltpu.make_async_copy(
                ring_o.at[pl.ds((f % _N_OSEGS) * _SEG_ROWS, _SEG_ROWS)],
                out_hbm.at[i, f], sem_o,
            )
            dma.start()
            dma.wait()
            return f + 1

        state[8] = jax.lax.while_loop(cond, body, state[8])

    def Wc(p):
        """Raw ring read for window-proven positions (the find loop's
        software-pipelined probe word; see _encode_body docstring)."""
        p = jnp.maximum(p, 0)
        c = p >> _CW_LOG
        return ring_w[(p >> 7) & (_NSLOTS * _CW_ROWS - 1), p & 127]

    def ensure_to(pos):
        ensure_chunk(pos >> _CW_LOG)

    def resident(p):
        """Exact ring residency of position p's chunk (serial kernel: the
        state cannot change between this check and the raw read it
        guards).  The canonical find's raw candidate-verify reads are
        gated on this; a False answer costs one ensured redo, never
        wrong bytes (see _encode_body's docstring)."""
        p = jnp.maximum(p, 0)
        c = p >> _CW_LOG
        ok = state[c & (_NSLOTS - 1)] == c
        if stale_test:
            # test hook: lie "not resident" for a slice of positions to
            # force the stale-exit + ensured-redo path — byte-identity
            # must hold regardless of the oracle's accuracy
            ok = ok & ((p & 255) != 0)
        return ok

    op, errv = _encode_body(
        n, acc0, W, store, flush, htab, prev, nti, opt_tab,
        attempts, ocap, opt_sufficient, opt_full, src_off=src_off,
        profile=profile, Wc=Wc, ensure_to=ensure_to, win_log=_CW_LOG,
        fast_schedule=fast_schedule, canon_u16=canon_u16,
        resident=resident, canon_raw_verify=canon_raw_verify,
    )

    # final flush of all remaining segments (incl. the partial one)
    total_words = (op + 3) >> 2

    def fin_cond(f):
        return f * _SEG_WORDS < total_words + 1

    def fin_body(f):
        dma = pltpu.make_async_copy(
            ring_o.at[pl.ds((f % _N_OSEGS) * _SEG_ROWS, _SEG_ROWS)],
            out_hbm.at[i, f], sem_o,
        )
        dma.start()
        dma.wait()
        return f + 1

    jax.lax.while_loop(fin_cond, fin_body, state[8])

    meta_ref[0, 0, 0] = op
    meta_ref[0, 0, 1] = errv
    for k in range(2, 8):
        meta_ref[0, 0, k] = 0


def _align(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("bcap", "attempts", "opt_sufficient", "opt_full",
                     "has_dict", "profile", "fast_schedule",
                     "canon_raw_verify", "stale_test"),
)
def pallas_encode_stream(src_i32, lens, bcap: int, attempts: int = 0,
                         accs=None, opt_sufficient: int = 0,
                         opt_full: bool = False, src_offs=None,
                         has_dict: bool = False, profile: str = "full",
                         fast_schedule: str = "canonical",
                         canon_raw_verify: bool = True,
                         stale_test: bool = False):
    """src_i32: i32[B, CAP] block bytes, any bcap.

    Dictionary mode (has_dict): each row is [dict | src] flat-prefix
    (host-engine layout), `src_offs[b]` is the dict length, `lens[b]` the
    TOTAL length, and `bcap` bounds the SOURCE part (sizes the output).

    Returns (out_words i32[B, NSEG, 32, 128] packed, meta i32[B, 1, 8]).

    Byte inputs may arrive as uint8: the widening to i32 runs ON DEVICE
    (inside this jit), so the host->device transfer ships 1 byte per byte
    instead of 4 (measured 2.9x faster ingestion over the tunnel)."""
    from .encode_pallas5 import _CANON_64K

    src_i32 = src_i32.astype(jnp.int32)
    canon_u16 = True if bcap < _CANON_64K else None
    b, cap = src_i32.shape
    if accs is None:
        accs = jnp.ones((1,), jnp.int32)
    if src_offs is None:
        src_offs = jnp.zeros((b,), jnp.int32)
    capw = _align(cap, _CW) + _CW  # + slack chunk for tail reads
    nc = capw // _CW
    words = _words_le(src_i32)
    words = jnp.pad(words, ((0, 0), (0, capw - cap))).reshape(
        b, nc, _CW_ROWS, 128
    )
    ocap = align1024(compress_bound(bcap))
    nseg = _align(ocap // 4 + 2, _SEG_WORDS) // _SEG_WORDS + 1

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, 1, 8), lambda i, lens, accs, offs: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.SMEM((_NSLOTS * _CW_ROWS, 128), jnp.int32),
            pltpu.SMEM((_N_OSEGS * _SEG_ROWS, 128), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SMEM((1 << _HLOG,), jnp.int32),
            pltpu.SMEM((32768 if attempts else 8,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SMEM((4, 4104 if opt_sufficient else 8), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(lens_ref, accs_ref, offs_ref, src_w, out_hbm, meta_ref,
               ring_w, ring_o, state, htab, prev, nti, opt_tab, sem_w,
               sem_o):
        i = pl.program_id(0)
        acc = jnp.maximum(accs_ref[0], 1)
        _encode_stream_one(
            i, lens_ref[i], acc, src_w, out_hbm, meta_ref, ring_w, ring_o,
            state, htab, prev, nti, opt_tab, sem_w, sem_o,
            attempts, ocap, opt_sufficient, opt_full,
            src_off=offs_ref[i] if has_dict else None,
            profile=profile, fast_schedule=fast_schedule,
            canon_u16=canon_u16, canon_raw_verify=canon_raw_verify,
            stale_test=stale_test,
        )

    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, nseg, _SEG_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lens, accs, src_offs, words)
    return out, meta


def encode_blocks_pallas_stream(
    bufs_u8: np.ndarray, lens: np.ndarray, bcap: int, level: int = 0,
    acceleration: int = 1, dicts: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None, fast_schedule: str = "canonical",
):
    """Host wrapper: u8[B, CAP] raw blocks -> (u8[B, OCAP], clens, errs).

    Same ladder mapping as `encode_pallas5.encode_blocks_pallas5`.  FAST
    one-shot no-dict blocks default to the canonical upstream schedule
    (byte-identical to LZ4_compress_default at ANY block size — byU16
    below 64 KB + 11, byU32 with the emulated 5-byte hash at/above);
    ``fast_schedule="dense"`` selects the 15-bit-table finder.
    Dictionary/chained batches always use the dense family (the canonical
    one-shot schedule is a no-dict schedule by definition).

    Dictionary mode: `dicts` u8[B, DW] holds each block's preset window
    RIGHT-aligned (the last `dict_lens[b]` bytes are the dictionary, like
    the decode kernels take it); output matches the host engines'
    `encode(..., dictionary=...)` byte for byte."""
    from ..constants import HC_LEVEL_TABLE
    from .common import LEVEL_ATTEMPTS

    bufs_u8 = np.asarray(bufs_u8)
    lens = np.asarray(lens, np.int32)
    src_offs = None
    has_dict = dicts is not None
    if has_dict:
        dicts = np.asarray(dicts)
        dls = np.minimum(np.asarray(dict_lens, np.int32), 65535 + 1)
        b, cap = bufs_u8.shape
        dw = dicts.shape[1]
        # np.empty + per-row slice copies (C-speed memcpy): a zeros()
        # init would memset the whole (b, dw+cap) matrix — at this VM's
        # ~2 GB/s that rivals the copies themselves.  Only the per-row
        # tail gap needs zeroing (the kernel's clamped slack reads may
        # touch it; values are dead but must be deterministic).
        concat = np.empty((b, dw + cap), np.uint8)
        for k in range(b):
            dl = int(dls[k])
            if dl:
                concat[k, :dl] = dicts[k, dw - dl:]
            concat[k, dl: dl + cap] = bufs_u8[k]
            concat[k, dl + cap:] = 0
        bufs_u8 = concat
        src_offs = jnp.asarray(dls, jnp.int32)
        lens = jnp.asarray(dls + lens, jnp.int32)

    src = jnp.asarray(bufs_u8)  # u8: widened on device
    level = int(level)
    if level >= 10:
        searches, sufficient = HC_LEVEL_TABLE[min(level, 12)]
        out, meta = pallas_encode_stream(
            src, jnp.asarray(lens, jnp.int32), bcap, searches,
            jnp.asarray([acceleration], jnp.int32),
            opt_sufficient=min(sufficient, 4095),
            opt_full=level >= 12,
            src_offs=src_offs, has_dict=has_dict,
        )
    else:
        attempts = LEVEL_ATTEMPTS.get(level, 0)
        out, meta = pallas_encode_stream(
            src, jnp.asarray(lens, jnp.int32), bcap, attempts,
            jnp.asarray([acceleration], jnp.int32),
            src_offs=src_offs, has_dict=has_dict,
            fast_schedule=fast_schedule,
        )
    ocap = align1024(compress_bound(bcap))
    words = np.ascontiguousarray(np.asarray(out).reshape(out.shape[0], -1))
    u8 = words.view(np.uint8).reshape(words.shape[0], -1)[:, :ocap]
    meta = np.asarray(meta).reshape(-1, 8)
    return np.ascontiguousarray(u8), meta[:, 0], meta[:, 1]
