"""Pallas TPU LZ4 block decoder, v3 — KEPT AS A NEGATIVE RESULT.

Superseded by `decode_pallas_stream` (the production big-block path).
This variant never compiled under Mosaic: its HBM inputs used ANY/HBM
memory spaces with per-chunk DMA slices that violate the (8,128) tiling
rule ("Slice shape along dimension 0 must be aligned to tiling (8)").
The fix — every DMA chunk owning its full trailing (rows, 128) block —
is what `decode_pallas_stream` implements.  Works in interpret mode;
retained for the record alongside v2/v4 (see PERFORMANCE.md).

Original design notes:


v1/v2 stage the whole compressed block in SMEM (and the whole output in
VMEM), capping blocks at 64 KB (SMEM is 1 MB and pallas double-buffers
block inputs).  This kernel removes the cap: the compressed stream and the
output live in HBM and move through small on-chip rings via explicit DMA —
the TPU shape of the reference's single pointer-walking pass over memory
(`LZ4_decompress_generic`, `x64/LL64.dec.cs:124-467`):

- **word ring (SMEM)**: the scalar parse reads LE words from a 2-slot ring
  of 16 K-position chunks, loaded on demand (parse positions only move
  forward).  A blocked load costs ~µs per 16 KB parsed — noise.
- **literal ring (VMEM)**: the copy phase reads literal chunks from a
  2-slot ring of 32 KB compressed-byte windows, loaded on demand (literal
  sources only move forward).
- **output ring (VMEM)**: 128 KB of decoded history (the 64 KB match
  window plus headroom), flushed to HBM in 32 KB segments as it completes.
  Match sources reach at most 64 KB back, so they always hit the ring.
- **parse/copy rounds**: as in v2, a scalar-only parse fills SMEM sequence
  tables (2 K sequences per round), then a vector copy loop drains them.

The same kernel handles 64 KB and 4 MB blocks; `PALLAS_MAX_BLOCK` dies with
it.  Dictionary mode: the 64 KB preset window preloads the output ring
(logical rows [0, 512) are the dictionary; output starts at row 512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_tpu.constants import MIN_MATCH
from lz4_tpu.ops.common import _words_le

_LANES = 128
_CHUNK = 2048          # sequences per parse/copy round
_CW_LOG = 14           # word-ring chunk: 16K positions (64 KB SMEM/slot)
_CW = 1 << _CW_LOG
_CB_LOG = 15           # literal-ring chunk: 32 KB bytes (128 KB VMEM/slot)
_CB = 1 << _CB_LOG
_CB_ROWS = _CB // _LANES           # 256 rows per literal chunk
_OR_ROWS = 1024        # output ring rows (128 KB bytes, 512 KB VMEM)
_SEG_ROWS = 256        # flush segment (32 KB)
_DICT_ROWS3 = 512      # logical dictionary prefix rows (64 KB)
_DCAP3 = _DICT_ROWS3 * _LANES


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)


def _decode_one(i, clen, dict_len, comp_w, comp_b, dict_v, out_hbm, meta_ref,
                ring_w, ring_c, ring_o, loaded, t_lit, t_ll, t_off, t_ml,
                sem_w, sem_c, sem_o, out_cap: int):
    """Decode block ``i``.

    comp_w:  HBM i32[B, CAPW]        LE words (one per byte position)
    comp_b:  HBM i32[B, CR, 128]     bytes as lane rows
    dict_v:  VMEM i32[1, 512, 128]   dictionary window (right-aligned)
    out_hbm: HBM i32[B, OROWS, 128]  decoded bytes out
    ring_w:  SMEM i32[2, CW]         parse word ring
    ring_c:  VMEM i32[2*CB_ROWS,128] literal ring
    ring_o:  VMEM i32[OR_ROWS, 128]  output ring (dict + decoded window)
    loaded:  SMEM i32[8]             [w0, w1, c0, c1, flushed_segs, -, -, -]
    """
    lane = _lane_iota()
    ocap = _DCAP3 + out_cap  # true capacity; HBM rows are padded beyond it
    lo = _DCAP3 - dict_len

    loaded[0] = -1
    loaded[1] = -1
    loaded[2] = -1
    loaded[3] = -1
    loaded[4] = 0  # flushed output segments

    # preload the dictionary window into the output ring
    @pl.when(dict_len > 0)
    def _():
        def cp(r, _):
            ring_o[pl.ds(r, 1), :] = dict_v[0, pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(lo // _LANES, _DICT_ROWS3, cp, 0)

    # ---- streamed scalar reads (parse) -----------------------------------
    def ensure_wchunk(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(loaded[slot] != c)
        def _():
            dma = pltpu.make_async_copy(
                comp_w.at[i, pl.ds(c * _CW, _CW)],
                ring_w.at[slot],
                sem_w.at[slot],
            )
            dma.start()
            dma.wait()
            loaded[slot] = c

    def read_word(p):
        c = p >> _CW_LOG
        ensure_wchunk(c)
        return ring_w[jax.lax.rem(c, 2), p & (_CW - 1)]

    def read_byte(p):
        return read_word(p) & 0xFF

    def read_vle(p):
        def cond(s):
            v, q, last = s
            return (last == 255) & (q < clen)

        def body(s):
            v, q, last = s
            b = read_byte(q)
            return v + b, q + 1, b

        v0, q0, _ = jax.lax.while_loop(cond, body, (0, p, 255))
        return v0, q0

    # ---- phase A: scalar parse into the sequence tables ------------------
    def parse_one(state):
        ip, op, ns, err, done = state
        w0 = read_word(jnp.minimum(ip, clen - 1))
        llt = (w0 >> 4) & 15
        mlt = w0 & 15
        bad = ip >= clen

        def ll_ext(_):
            v, q = read_vle(ip + 1)
            return 15 + v, q

        ll, lit_at = jax.lax.cond(
            llt == 15, ll_ext, lambda _: (llt, ip + 1), None
        )
        ip2 = lit_at + ll
        bad = bad | (ip2 > clen) | (op + ll > ocap)
        is_last = ip2 >= clen

        def parse_match(args):
            ip2, bad = args
            w1 = read_word(jnp.minimum(ip2, clen - 1))
            off = w1 & 0xFFFF

            def ml_ext(_):
                v, q = read_vle(ip2 + 2)
                return MIN_MATCH + 15 + v, q

            ml, ip3 = jax.lax.cond(
                mlt == 15, ml_ext, lambda _: (mlt + MIN_MATCH, ip2 + 2), None
            )
            bad = (
                bad
                | (off == 0)
                | (off > op + ll - lo)
                | (op + ll + ml > ocap)
                | (ip3 > clen)
                | (ip2 + 2 > clen)
            )
            return ip3, bad, off, ml

        ip3, bad, off, ml = jax.lax.cond(
            is_last,
            lambda a: (a[0], a[1], jnp.int32(1), jnp.int32(0)),
            parse_match,
            (ip2, bad),
        )
        t_lit[ns] = lit_at
        t_ll[ns] = ll
        t_off[ns] = off
        t_ml[ns] = ml
        return (
            ip3,
            op + jnp.where(bad, 0, ll + ml),
            ns + jnp.where(bad, 0, 1),
            jnp.where(bad, 1, err),
            done | is_last | bad,
        )

    def parse_cond(state):
        ip, op, ns, err, done = state
        return (~done) & (ns < _CHUNK)

    def parse_body(state):
        state = parse_one(state)
        return jax.lax.cond(parse_cond(state), parse_one, lambda s: s, state)

    # ---- phase B: vector copies ------------------------------------------
    def ensure_cchunk(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(loaded[2 + slot] != c)
        def _():
            dma = pltpu.make_async_copy(
                comp_b.at[i, pl.ds(c * _CB_ROWS, _CB_ROWS), :],
                ring_c.at[pl.ds(slot * _CB_ROWS, _CB_ROWS), :],
                sem_c.at[slot],
            )
            dma.start()
            dma.wait()
            loaded[2 + slot] = c

    def read_lit_chunk(src):
        """(1,128) bytes [src, src+128) of the compressed stream."""
        row = src // _LANES
        ln = src % _LANES
        c0 = row >> (_CB_LOG - 7)
        c1 = (row + 1) >> (_CB_LOG - 7)
        ensure_cchunk(c0)
        ensure_cchunk(c1)
        v0r = jax.lax.rem(c0, 2) * _CB_ROWS + (row & (_CB_ROWS - 1))
        v1r = jax.lax.rem(c1, 2) * _CB_ROWS + ((row + 1) & (_CB_ROWS - 1))
        r0 = ring_c[pl.ds(v0r, 1), :]
        r1 = ring_c[pl.ds(v1r, 1), :]
        sh = (_LANES - ln) % _LANES
        v0 = pltpu.roll(r0, shift=sh, axis=1)
        v1 = pltpu.roll(r1, shift=sh, axis=1)
        return jnp.where(lane < _LANES - ln, v0, v1)

    def read_out_chunk(src):
        """(1,128) bytes [src, src+128) of the logical output space."""
        row = src // _LANES
        ln = src % _LANES
        r0 = ring_o[pl.ds(jax.lax.rem(row, _OR_ROWS), 1), :]
        r1 = ring_o[pl.ds(jax.lax.rem(row + 1, _OR_ROWS), 1), :]
        sh = (_LANES - ln) % _LANES
        v0 = pltpu.roll(r0, shift=sh, axis=1)
        v1 = pltpu.roll(r1, shift=sh, axis=1)
        return jnp.where(lane < _LANES - ln, v0, v1)

    def flush_upto(row):
        """Flush output segments so ring rows [row, row+2) are writable."""

        def need(f):
            return _DICT_ROWS3 + f * _SEG_ROWS + _OR_ROWS <= row + 1

        def cond(f):
            return need(f)

        def body(f):
            ring_row = (_DICT_ROWS3 + f * _SEG_ROWS) % _OR_ROWS
            dma = pltpu.make_async_copy(
                ring_o.at[pl.ds(ring_row, _SEG_ROWS), :],
                out_hbm.at[i, pl.ds(f * _SEG_ROWS, _SEG_ROWS), :],
                sem_o.at[0],
            )
            dma.start()
            dma.wait()
            return f + 1

        loaded[4] = jax.lax.while_loop(cond, body, loaded[4])

    def write_chunk(dst, vec, n):
        row = dst // _LANES
        flush_upto(row)
        ln = dst % _LANES
        rolled = pltpu.roll(vec, shift=ln, axis=1)
        m0 = (lane >= ln) & (lane < ln + n)
        sr0 = jax.lax.rem(row, _OR_ROWS)
        r0 = ring_o[pl.ds(sr0, 1), :]
        ring_o[pl.ds(sr0, 1), :] = jnp.where(m0, rolled, r0)

        @pl.when(ln + n > _LANES)
        def _():
            m1 = lane + _LANES < ln + n
            sr1 = jax.lax.rem(row + 1, _OR_ROWS)
            r1 = ring_o[pl.ds(sr1, 1), :]
            ring_o[pl.ds(sr1, 1), :] = jnp.where(m1, rolled, r1)

    def copy_span_lit(dst, src, n):
        def body(k, _):
            pos = k * _LANES
            take = jnp.minimum(_LANES, n - pos)
            write_chunk(dst + pos, read_lit_chunk(src + pos), take)
            return 0

        jax.lax.fori_loop(0, (n + _LANES - 1) // _LANES, body, 0)

    def copy_span_out(dst, src, n):
        def body(k, _):
            pos = k * _LANES
            take = jnp.minimum(_LANES, n - pos)
            write_chunk(dst + pos, read_out_chunk(src + pos), take)
            return 0

        jax.lax.fori_loop(0, (n + _LANES - 1) // _LANES, body, 0)

    def copy_one(s, op):
        lit_at = t_lit[s]
        ll = t_ll[s]
        off = t_off[s]
        ml = t_ml[s]
        m0 = op + ll
        merged = (ll + ml <= 120) & ((ml == 0) | (off >= ll + ml))

        @pl.when(merged & (ll + ml > 0))
        def _():
            lit = read_lit_chunk(lit_at)
            mat = read_out_chunk(jnp.maximum(m0 - off, 0))
            vec = jnp.where(lane < ll, lit, pltpu.roll(mat, shift=ll, axis=1))
            write_chunk(op, vec, ll + ml)

        @pl.when(~merged)
        def _():
            @pl.when(ll > 0)
            def _():
                copy_span_lit(op, lit_at, ll)

            @pl.when(ml > 0)
            def _():
                def dbl_cond(st):
                    dist, copied = st
                    return (dist < _LANES) & (copied < ml)

                def dbl_body(st):
                    dist, copied = st
                    n = jnp.minimum(dist, ml - copied)
                    copy_span_out(m0 + copied, m0 + copied - dist, n)
                    return dist * 2, copied + n

                dist_f, copied = jax.lax.while_loop(
                    dbl_cond, dbl_body, (off, 0)
                )

                @pl.when(copied < ml)
                def _():
                    copy_span_out(m0 + copied, m0 + copied - dist_f,
                                  ml - copied)

        return op + ll + ml

    # ---- rounds ----------------------------------------------------------
    def round_cond(state):
        ip, op, err, done, cop = state
        return (~done) & (err == 0)

    def round_body(state):
        ip, op, err, done, cop = state
        ip, op, ns, err, done = jax.lax.while_loop(
            parse_cond, parse_body, (ip, op, 0, err, done)
        )
        cop = jax.lax.fori_loop(0, ns, copy_one, cop)
        return ip, op, err, done, cop

    ip, op, err, done, cop = jax.lax.while_loop(
        round_cond, round_body, (0, _DCAP3, 0, False, _DCAP3)
    )

    # final flush: all remaining complete/partial segments
    total_rows = (op - _DCAP3 + _LANES - 1) // _LANES

    def fin_cond(f):
        return f * _SEG_ROWS < total_rows

    def fin_body(f):
        ring_row = (_DICT_ROWS3 + f * _SEG_ROWS) % _OR_ROWS
        dma = pltpu.make_async_copy(
            ring_o.at[pl.ds(ring_row, _SEG_ROWS), :],
            out_hbm.at[i, pl.ds(f * _SEG_ROWS, _SEG_ROWS), :],
            sem_o.at[0],
        )
        dma.start()
        dma.wait()
        return f + 1

    jax.lax.while_loop(fin_cond, fin_body, loaded[4])

    errv = jnp.where(err != 0, err, jnp.where(ip != clen, 2, 0))
    meta_ref[0, :, :] = jnp.where(
        lane == 0, op - _DCAP3, jnp.where(lane == 1, errv, 0)
    )


def _align(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("out_cap", "with_dict"))
def pallas_decode3(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                   dict_lens=None, with_dict: bool = False):
    """Ring-streamed decode: i32[B, CAP] compressed bytes -> decoded blocks.

    Returns (out i32[B, OROWS*128] logical output from lane 0, meta).
    Works for any out_cap (64 KB ... 4 MB+); VMEM/SMEM use is constant.
    """
    b, cap = comps_i32.shape
    assert cap % _LANES == 0, cap
    # pad the compressed stream to whole ring chunks + one slack chunk
    capw = _align(cap, _CW) + _CW
    capb = _align(cap, _CB) + _CB
    words = _words_le(comps_i32)
    words = jnp.pad(words, ((0, 0), (0, capw - cap)))
    comp_rows = jnp.pad(comps_i32, ((0, 0), (0, capb - cap))).reshape(
        b, capb // _LANES, _LANES
    )
    if with_dict:
        assert dicts_i32 is not None and dicts_i32.shape == (b, 65536)
        dict_rows = dicts_i32.reshape(b, _DICT_ROWS3, _LANES)
    else:
        dict_rows = jnp.zeros((b, _DICT_ROWS3, _LANES), jnp.int32)
        dict_lens = jnp.zeros_like(comp_lens)
    out_rows = _align(out_cap // _LANES + 1, _SEG_ROWS)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # words
            pl.BlockSpec(memory_space=pltpu.HBM),     # byte rows
            pl.BlockSpec(
                (1, _DICT_ROWS3, _LANES), lambda i, lens, dlens: (i, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # decoded rows
            pl.BlockSpec((1, 1, _LANES), lambda i, lens, dlens: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, _CW), jnp.int32),
            pltpu.VMEM((2 * _CB_ROWS, _LANES), jnp.int32),
            pltpu.VMEM((_OR_ROWS, _LANES), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(lens_ref, dlens_ref, comp_w, comp_b, dict_v, out_hbm, meta_ref,
               ring_w, ring_c, ring_o, loaded, t_lit, t_ll, t_off, t_ml,
               sem_w, sem_c, sem_o):
        i = pl.program_id(0)
        _decode_one(
            i, lens_ref[i], dlens_ref[i], comp_w, comp_b, dict_v, out_hbm,
            meta_ref, ring_w, ring_c, ring_o, loaded, t_lit, t_ll, t_off,
            t_ml, sem_w, sem_c, sem_o, out_cap,
        )

    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, out_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, _LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        comp_lens,
        dict_lens,
        words,
        comp_rows,
        dict_rows,
    )
    return out.reshape(b, out_rows * _LANES), meta.reshape(b, _LANES)


def decode_blocks_pallas3(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
):
    """Host wrapper mirroring `decode_pallas.decode_blocks_pallas`."""
    comps_i32 = jnp.asarray(comps_u8, jnp.int32)
    if dicts_u8 is not None:
        out, meta = pallas_decode3(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8, jnp.int32),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
        )
    else:
        out, meta = pallas_decode3(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap
        )
    out = np.asarray(out[:, :out_cap]).astype(np.uint8)
    meta = np.asarray(meta)
    return out, meta[:, 0], meta[:, 1]
