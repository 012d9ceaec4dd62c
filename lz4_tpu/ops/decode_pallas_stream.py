"""Streaming all-scalar LZ4 decoder — arbitrary block sizes (256 KB - 4 MB+).

Same scalar packed-word pipeline as `decode_pallas5` (the measured-fastest
per-chip design), with the two whole-block SMEM buffers replaced by rings:

- **input ring**: per-byte LE words stream HBM -> SMEM in 16 K-position
  chunks (64 KB/slot, 2 slots), loaded on demand — parse and literal reads
  only move forward.  Chunks are shaped (chunk, 128, 128) end-to-end so
  every DMA slice is tile-aligned (the v3 lesson: HBM arrays are (8,128)
  tiled; a chunk must own its full trailing block).
- **output ring**: packed words in SMEM, 32 K words (128 KB of history —
  double the 64 KB match window), flushed to HBM in 4 K-word segments as
  the frontier advances.  The 64 KB preset dictionary DMAs in as the ring
  prefix (chained frames).

VMEM is untouched; SMEM use is constant (~290 KB) regardless of block size.
`PALLAS_MAX_BLOCK` no longer limits the decode path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MIN_MATCH
from .common import _words_le

_CW_LOG = 14                   # input chunk: 16K byte-positions
_CW = 1 << _CW_LOG
_CW_ROWS = _CW // 128          # 128 rows of 128 words
_OR_WORDS = 1 << 15            # output ring: 32K words (128KB bytes)
_SEG_WORDS = 1 << 12           # flush segment: 4K words (16KB)
_SEG_ROWS = _SEG_WORDS // 128  # 32
_N_RING_SEGS = _OR_WORDS // _SEG_WORDS  # 8
_DICT_WORDS = 65536 // 4       # 16K words = 4 ring segments
_DICT_SEGS = _DICT_WORDS // _SEG_WORDS


def _u(x):
    return jnp.asarray(x).astype(jnp.uint32)


def _i(x):
    return jnp.asarray(x).astype(jnp.int32)


def _decode_one(i, clen, dict_len, comp_w, dict_w, out_hbm, meta_ref,
                ring_w, ring_o, loaded, sem_w, sem_o, out_cap: int,
                with_dict: bool, mode: str = "full"):
    """Decode block i.

    comp_w:  HBM i32[B, NC, 128, 128]   per-byte LE words, chunked
    dict_w:  HBM i32[B, DSEGS, 32, 128] packed dictionary words (chained)
    out_hbm: HBM i32[B, NSEG, 32, 128]  packed output words, segmented
    ring_w:  SMEM i32[256, 128]         input ring (2 x 128-row chunk slots)
    ring_o:  SMEM i32[256, 128]         output ring (8 x 32-row segments,
                                        dict prefix + window)
    loaded:  SMEM i32[8]                [w0, w1, flushed_segs, ...]

    (A flat 1-D ring layout — scalar access as a single AND — was tried
    and REJECTED by Mosaic: HBM chunk slices must stay aligned to the
    (8,128) tiling of the last two dims, so the HBM side must remain
    chunk-shaped and the DMA shapes must match it.)
    """
    dcap = _DICT_WORDS * 4  # logical byte space starts after the dict region
    lo = dcap - dict_len
    ocap = dcap + out_cap

    loaded[0] = -1
    loaded[1] = -1
    loaded[2] = 0  # flushed output segments

    if with_dict:
        @pl.when(dict_len > 0)
        def _():
            def seg(sg, _):
                dma = pltpu.make_async_copy(
                    dict_w.at[i, sg],
                    ring_o.at[pl.ds(sg * _SEG_ROWS, _SEG_ROWS)],
                    sem_o,
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(0, _DICT_SEGS, seg, 0)

    # ---- streamed input reads --------------------------------------------
    def ensure_chunk(c):
        slot = c & 1

        @pl.when(loaded[slot] != c)
        def _():
            dma = pltpu.make_async_copy(
                comp_w.at[i, c],
                ring_w.at[pl.ds(slot * _CW_ROWS, _CW_ROWS)],
                sem_w.at[slot],
            )
            dma.start()
            dma.wait()
            loaded[slot] = c

    def W(p):
        """Bytes p..p+3 of the compressed stream as one LE word (uint32)."""
        c = p >> _CW_LOG
        ensure_chunk(c)
        # slot*128 + in-chunk row == bits [14:7] of p: ONE flat 2-D fold
        return _u(ring_w[(p >> 7) & (2 * _CW_ROWS - 1), p & 127])

    def Wr(p):
        """Raw ring read — caller guarantees the chunk is resident."""
        return _u(ring_w[(p >> 7) & (2 * _CW_ROWS - 1), p & 127])

    # ---- output ring accessors -------------------------------------------
    def OUTW(q):
        # seg*32 + in-seg row == bits [14:7] of the ring offset: flat fold
        return _u(ring_o[(q >> 7) & (_OR_WORDS // 128 - 1), q & 127])

    def store_word(wp, v):
        ring_o[(wp >> 7) & (_OR_WORDS // 128 - 1), wp & 127] = _i(v)

    def flush_for(wp):
        """Flush output segments so ring word wp (and wp+1) are writable."""

        def cond(f):
            return _DICT_WORDS + f * _SEG_WORDS + _OR_WORDS <= wp + 2

        def body(f):
            ring_seg = (_DICT_SEGS + f) % _N_RING_SEGS
            dma = pltpu.make_async_copy(
                ring_o.at[pl.ds(ring_seg * _SEG_ROWS, _SEG_ROWS)],
                out_hbm.at[i, f], sem_o,
            )
            dma.start()
            dma.wait()
            return f + 1

        loaded[2] = jax.lax.while_loop(cond, body, loaded[2])

    # ---- the v5 scalar pipeline over ring accessors ----------------------
    def read_vle(p):
        def cond(s):
            v, q, last = s
            return (last == 255) & (q < clen)

        def body(s):
            v, q, last = s
            b = _i(W(q)) & 0xFF
            return v + b, q + 1, b

        v0, q0, _ = jax.lax.while_loop(cond, body, (0, p, 255))
        return v0, q0

    def append(acc, op, w, n):
        wp = op >> 2
        flush_for(wp)
        f = _u(op & 3)
        merged = acc | (w << (8 * f))
        store_word(wp, merged)
        sh = (8 * (4 - f)) & 31
        spill = jnp.where(f > 0, w >> sh, jnp.uint32(0))
        op2 = op + n
        crossed = (op2 >> 2) > wp
        acc2 = jnp.where(crossed, spill, merged)
        f2 = _u(op2 & 3)
        keep = jnp.where(
            f2 > 0, (jnp.uint32(1) << (8 * f2)) - 1, jnp.uint32(0)
        )
        return acc2 & keep, op2

    def copy_literals(acc, op, lit_at, ll):
        def body(s):
            k, acc, op = s
            acc, op = append(acc, op, W(lit_at + k), jnp.minimum(4, ll - k))
            return k + 4, acc, op

        _, acc, op = jax.lax.while_loop(
            lambda s: s[0] < ll, body, (0, acc, op)
        )
        return acc, op

    def read_out_u(q):
        ph = _u(q & 3) * 8
        lw = OUTW(q >> 2)
        hw = OUTW((q >> 2) + 1)
        return jnp.where(ph == 0, lw, (lw >> ph) | (hw << ((32 - ph) & 31)))

    def read_out_byte(q):
        return (OUTW(q >> 2) >> (8 * _u(q & 3))) & 0xFF

    def mask8(f):
        return (jnp.uint32(1) << (8 * _u(f))) - 1

    # ---- v6-style fused-arm copies (one flush check per SEQUENCE, full-
    # word stores, no per-append bookkeeping; see decode_pallas6) --------
    def lit_fast(acc, op, lit_at, ll):
        """Raw reads: the fused arm's comp accesses all live inside
        [ip, mo_at + 3], whose chunks the caller ensures once — no
        per-read ensure_chunk tax."""
        op2 = op + ll
        wp = op >> 2
        nw = (op2 >> 2) - wp
        f = op & 3
        lsh = _u(f) * 8
        w0 = Wr(lit_at)
        store_word(wp, acc | (w0 << lsh))
        base = lit_at - f

        def body(j):
            store_word(wp + j, Wr(base + 4 * j))
            return j + 1

        jax.lax.while_loop(lambda j: j < nw, body, 1)
        f2 = op2 & 3
        acc2 = jnp.where(
            nw > 0,
            Wr(jnp.maximum(lit_at + ll - f2, 0)),
            acc | (w0 << lsh),
        )
        return acc2 & mask8(f2), op2

    def match_fast(acc, op, off, ml):
        op2 = op + ml
        wp = op >> 2
        f = op & 3
        nw = (op2 >> 2) - wp
        lsh = _u(f) * 8
        s0 = read_out_u(op - off)
        store_word(wp, acc | (s0 << lsh))
        sb = 4 * wp + 4 - off
        ph = _u(sb & 3) * 8
        phc = (32 - ph) & 31
        sw = sb >> 2
        lo0 = OUTW(sw)

        def body(s):
            # 2x unrolled (see decode_pallas6.copy_match_far): the second
            # store may overshoot into the partial word — its true bytes
            # live in acc and the next head store rewrites it
            j, lov = s
            hi = OUTW(sw + j)
            w = jnp.where(ph == 0, lov, (lov >> ph) | (hi << phc))
            store_word(wp + j, w)
            hi2 = OUTW(sw + j + 1)
            w2 = jnp.where(ph == 0, hi, (hi >> ph) | (hi2 << phc))
            store_word(wp + j + 1, w2)
            return j + 2, hi2

        jax.lax.while_loop(lambda s: s[0] < nw, body, (1, lo0))
        f2 = op2 & 3
        acc2 = read_out_u(op2 - f2 - off) & mask8(f2)
        return acc2, op2

    def copy_match_far(acc, op, off, ml):
        ms = op - off

        def body(s):
            k, acc, op = s
            w = read_out_u(ms + k)
            acc, op = append(acc, op, w, jnp.minimum(4, ml - k))
            return k + 4, acc, op

        _, acc, op = jax.lax.while_loop(
            lambda s: s[0] < ml, body, (0, acc, op)
        )
        return acc, op

    def copy_match_near(acc, op, off, ml):
        ms = op - off
        seed = jnp.minimum(ml, 12)

        def sbody(s):
            k, acc, op = s
            acc, op = append(acc, op, read_out_byte(ms + k), 1)
            return k + 1, acc, op

        k, acc, op = jax.lax.while_loop(
            lambda s: s[0] < seed, sbody, (0, acc, op)
        )

        def group_phase(args):
            acc, op = args
            store_word(op >> 2, acc)
            base = op - 12
            w0 = read_out_u(base)
            w1 = read_out_u(base + 4)
            w2 = read_out_u(base + 8)
            s0 = 12 % jnp.maximum(off, 1)

            def gbody(st):
                k, acc, op, s = st
                lw = jnp.where(s < 4, w0, w1)
                hw = jnp.where(s < 4, w1, w2)
                ph = _u(s & 3) * 8
                w = jnp.where(
                    ph == 0, lw, (lw >> ph) | (hw << ((32 - ph) & 31))
                )
                acc, op = append(acc, op, w, jnp.minimum(4, ml - k))
                s2 = s + 4
                s2 = jnp.where(s2 >= off, s2 - off, s2)
                s2 = jnp.where(s2 >= off, s2 - off, s2)
                s2 = jnp.where(off == 1, 0, s2)
                return k + 4, acc, op, s2

            _, acc, op, _ = jax.lax.while_loop(
                lambda st: st[0] < ml, gbody, (12, acc, op, s0)
            )
            return acc, op

        acc, op = jax.lax.cond(ml > 12, group_phase, lambda a: a, (acc, op))
        return acc, op

    def seq_cond(state):
        ip, op, acc, err, done = state
        return (~done) & (err == 0)

    def seq_body(state):
        ip, op, acc, err, done = state
        bad = ip >= clen
        w0 = _i(W(jnp.minimum(ip, clen - 1)))
        token = w0 & 0xFF
        ll0 = token >> 4
        mln = token & 15
        mo_at = ip + 1 + ll0

        if mode == "full2v":
            # fast arm also covers SINGLE-extension-byte match VLE
            # (ml 19..272) — the HC/OPT majority shape; the extension byte
            # rides in the same speculative offset word (see
            # decode_pallas6 mode="full2v", which this port follows)
            wo_full = _u(W(mo_at))
            wo_s = _i(wo_full & 0xFFFF)
            isv0 = mln == 15
            ext0 = _i((wo_full >> 16) & 0xFF)
            mlv0 = jnp.where(isv0, MIN_MATCH + 15 + ext0, mln + MIN_MATCH)
            adv0 = mo_at + 2 + _i(isv0)
            need0 = jnp.where(isv0, 304, 40)
            fused = (
                (~bad) & (ll0 < 15) & ((~isv0) | (ext0 < 255))
                & (adv0 <= clen) & (op + need0 <= ocap)
                & (wo_s >= 8) & (wo_s <= op + ll0 - lo)
            )

            def arm_fast_v(_):
                # same windowed-run reservation as the full2 arm below;
                # VLE-capable sequences need the wider output bound
                # (ml <= 272 -> need 304) in the reservation and the run
                # predicate
                ensure_chunk((mo_at + 23) >> _CW_LOG)
                win_end = (((mo_at + 23) >> _CW_LOG) + 1) << _CW_LOG
                flush_for((op + ll0 + mlv0) >> 2)
                limit_w = (
                    _DICT_WORDS + loaded[2] * _SEG_WORDS + _OR_WORDS - 2
                )

                def fbody(st):
                    ipx, opx, accx, llx, mlvx, advx, wox, ok = st
                    a2, o2 = lit_fast(accx, opx, ipx + 1, llx)
                    a3, o3 = match_fast(a2, o2, wox, mlvx)
                    ip2 = advx
                    tokb = _i(Wr(ip2)) & 0xFF
                    llb = tokb >> 4
                    mlnb = tokb & 15
                    mo2 = ip2 + 1 + llb
                    w2 = _u(Wr(mo2))
                    wo2 = _i(w2 & 0xFFFF)
                    isv = mlnb == 15
                    ext = _i((w2 >> 16) & 0xFF)
                    mlv2 = jnp.where(
                        isv, MIN_MATCH + 15 + ext, mlnb + MIN_MATCH
                    )
                    adv2 = mo2 + 2 + _i(isv)
                    need = jnp.where(isv, 304, 40)
                    ok2 = (
                        (llb < 15) & ((~isv) | (ext < 255))
                        & (adv2 <= clen) & (o3 + need <= ocap)
                        & (wo2 >= 8) & (wo2 <= o3 + llb - lo)
                        & (mo2 + 3 < win_end)
                        & (((o3 + need) >> 2) < limit_w)
                    )
                    return ip2, o3, a3, llb, mlv2, adv2, wo2, ok2

                ipf, opf, accf, _, _, _, _, _ = jax.lax.while_loop(
                    lambda st: st[7], fbody,
                    (ip, op, acc, ll0, mlv0, adv0, wo_s, fused),
                )
                return ipf, opf, accf, err, done

            def arm_slow_v(_):
                return seq_slow(state)

            return jax.lax.cond(fused, arm_fast_v, arm_slow_v, None)

        # speculative offset read (inside the wrapper's slack chunk) lets
        # the no-VLE off>=8 common case run parse + literal copy + far
        # match copy as ONE cond arm with ONE ring-flush check, exactly
        # like the staged v6 kernel (which this port follows)
        wo_s = _i(W(mo_at)) & 0xFFFF
        fused = (
            (~bad) & (ll0 < 15) & (mln < 15)
            & (mo_at + 2 <= clen) & (op + 40 <= ocap)
            & (wo_s >= 8) & (wo_s <= op + ll0 - lo)
        )

        def arm_fast(_):
            # WINDOWED fused-RUN loop.  The profile split (kbench vs/vsp)
            # showed the streaming parse alone costing ~2x the staged
            # kernel's parse: every ensure_chunk/flush_for in the hot loop
            # carries a DMA region whose presence Mosaic taxes far above
            # the ~8-cyc simple pl.when.  So the run pre-reserves a WINDOW
            # once on arm entry — input residency through the chunk of
            # (mo_at + 23), output writability through the already-flushed
            # frontier — and the inner loop is pure scalar work: raw ring
            # reads (index masks make any speculative position in-bounds;
            # garbage values are gated by the window checks in ok2, which
            # are pure position arithmetic on in-window tokens) and raw
            # stores.  The run exits when the next sequence would leave
            # the input window (~16 KB) or the writable output region;
            # the outer iteration re-reserves and re-enters.
            ensure_chunk((mo_at + 23) >> _CW_LOG)
            win_end = (((mo_at + 23) >> _CW_LOG) + 1) << _CW_LOG
            flush_for((op + ll0 + mln + MIN_MATCH) >> 2)
            limit_w = (
                _DICT_WORDS + loaded[2] * _SEG_WORDS + _OR_WORDS - 2
            )

            def fbody(st):
                ipx, opx, accx, llx, mlnx, moatx, wox, ok = st
                if mode == "parse":  # kbench profile knob: no byte emission
                    a3, o3 = accx, opx + llx + mlnx + MIN_MATCH
                else:
                    a2, o2 = lit_fast(accx, opx, ipx + 1, llx)
                    a3, o3 = match_fast(a2, o2, wox, mlnx + MIN_MATCH)
                ip2 = moatx + 2
                tokb = _i(Wr(ip2)) & 0xFF
                llb = tokb >> 4
                mlnb = tokb & 15
                mo2 = ip2 + 1 + llb
                wo2 = _i(Wr(mo2)) & 0xFFFF
                ok2 = (
                    (llb < 15) & (mlnb < 15)
                    & (mo2 + 2 <= clen) & (o3 + 40 <= ocap)
                    & (wo2 >= 8) & (wo2 <= o3 + llb - lo)
                    & (mo2 + 3 < win_end)
                    & (((o3 + 40) >> 2) < limit_w)
                )
                return ip2, o3, a3, llb, mlnb, mo2, wo2, ok2

            ipf, opf, accf, _, _, _, _, _ = jax.lax.while_loop(
                lambda st: st[7], fbody,
                (ip, op, acc, ll0, mln, mo_at, wo_s, fused),
            )
            return ipf, opf, accf, err, done

        def arm_slow(_):
            return seq_slow(state)

        return jax.lax.cond(fused, arm_fast, arm_slow, None)

    def seq_slow(state):
        ip, op, acc, err, done = state
        bad = ip >= clen
        w0 = _i(W(jnp.minimum(ip, clen - 1)))
        token = w0 & 0xFF
        ip = ip + 1
        ll = token >> 4

        def ll_ext(_):
            v, q = read_vle(ip)
            return 15 + v, q

        ll, ip = jax.lax.cond(ll == 15, ll_ext, lambda _: (ll, ip), None)
        lit_at = ip
        bad = bad | (ip + ll > clen) | (op + ll > ocap)
        ip = ip + ll
        is_last = ip >= clen

        def parse_match(args):
            ip, bad = args
            woff = _i(W(jnp.minimum(ip, clen - 1))) & 0xFFFF
            ip = ip + 2
            ml = (token & 15) + MIN_MATCH

            def ml_ext(_):
                v, q = read_vle(ip)
                return MIN_MATCH + 15 + v, q

            ml, ip = jax.lax.cond(
                (token & 15) == 15, ml_ext, lambda _: (ml, ip), None
            )
            bad = (
                bad
                | (woff == 0)
                | (woff > op + ll - lo)
                | (op + ll + ml > ocap)
                | (ip > clen)
            )
            return ip, bad, woff, ml

        ip, bad, off, ml = jax.lax.cond(
            is_last,
            lambda a: (a[0], a[1], jnp.int32(1), jnp.int32(0)),
            parse_match,
            (ip, bad),
        )

        def do_copy(args):
            acc, op = args
            acc, op = copy_literals(acc, op, lit_at, ll)

            def do_match(args):
                acc, op = args
                store_word(op >> 2, acc)
                return jax.lax.cond(
                    off >= 8,
                    lambda a: copy_match_far(a[0], a[1], off, ml),
                    lambda a: copy_match_near(a[0], a[1], off, ml),
                    (acc, op),
                )

            return jax.lax.cond(ml > 0, do_match, lambda a: a, (acc, op))

        if mode == "parse":
            op = jnp.where(bad, op, op + ll + ml)
        else:
            acc, op = jax.lax.cond(bad, lambda a: a, do_copy, (acc, op))
        return (
            ip,
            op,
            acc,
            jnp.where(bad, 1, err),
            done | is_last | bad,
        )

    ip, op, acc, err, _ = jax.lax.while_loop(
        seq_cond, seq_body, (0, dcap, jnp.uint32(0), 0, False)
    )
    store_word(op >> 2, acc)  # final partial word

    # final flush of all remaining segments (incl. partial)
    total_words = (op - dcap + 3) >> 2

    def fin_cond(f):
        return f * _SEG_WORDS < total_words + 1

    def fin_body(f):
        ring_seg = (_DICT_SEGS + f) % _N_RING_SEGS
        dma = pltpu.make_async_copy(
            ring_o.at[pl.ds(ring_seg * _SEG_ROWS, _SEG_ROWS)],
            out_hbm.at[i, f], sem_o,
        )
        dma.start()
        dma.wait()
        return f + 1

    jax.lax.while_loop(fin_cond, fin_body, loaded[2])

    errv = jnp.where(err != 0, err, jnp.where(ip != clen, 2, 0))
    meta_ref[0, 0, 0] = op - dcap
    meta_ref[0, 0, 1] = errv
    for k in range(2, 8):
        meta_ref[0, 0, k] = 0


def _align(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit,
                   static_argnames=("out_cap", "with_dict", "mode"))
def pallas_decode_stream(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                         dict_lens=None, with_dict: bool = False,
                         mode: str = "full"):
    """comps_i32: i32[B, CAP] one byte per element.  Any out_cap.

    Byte inputs may arrive as uint8: the widening to i32 runs ON DEVICE
    (inside this jit), so the host->device transfer ships 1 byte per byte
    instead of 4 (measured 2.9x faster ingestion over the tunnel)."""
    comps_i32 = comps_i32.astype(jnp.int32)
    b, cap = comps_i32.shape
    capw = _align(cap, _CW) + _CW  # + slack chunk for tail reads
    nc = capw // _CW
    words = _words_le(comps_i32)
    words = jnp.pad(words, ((0, 0), (0, capw - cap))).reshape(
        b, nc, _CW_ROWS, 128
    )
    if with_dict:
        assert dicts_i32 is not None and dicts_i32.shape == (b, 65536)
        packed = (
            dicts_i32.astype(jnp.int32).reshape(b, _DICT_WORDS, 4)
            * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
        ).sum(axis=2, dtype=jnp.int32)
        dict_words = packed.reshape(b, _DICT_SEGS, _SEG_ROWS, 128)
    else:
        dict_words = jnp.zeros((b, _DICT_SEGS, _SEG_ROWS, 128), jnp.int32)
        dict_lens = jnp.zeros_like(comp_lens)
    nseg = _align(out_cap // 4 + 2, _SEG_WORDS) // _SEG_WORDS + 1

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, 1, 8), lambda i, lens, dlens: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.SMEM((2 * _CW_ROWS, 128), jnp.int32),
            pltpu.SMEM((_N_RING_SEGS * _SEG_ROWS, 128), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(lens_ref, dlens_ref, comp_w, dict_w, out_hbm, meta_ref,
               ring_w, ring_o, loaded, sem_w, sem_o):
        i = pl.program_id(0)
        _decode_one(
            i, lens_ref[i], dlens_ref[i], comp_w, dict_w, out_hbm, meta_ref,
            ring_w, ring_o, loaded, sem_w, sem_o, out_cap, with_dict,
            mode,
        )

    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, nseg, _SEG_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(comp_lens, dict_lens, words, dict_words)
    return out, meta


def decode_blocks_pallas_stream(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
    mode: str = "full",
):
    """Host wrapper mirroring `decode_pallas.decode_blocks_pallas`.

    `mode`: "full" (fused windowed run) or "full2v" (run also covers
    single-extension-byte match VLE — the HC/OPT stream shape)."""
    if mode not in ("full", "full2v"):
        raise ValueError(
            f"unknown streaming decode mode {mode!r}; "
            "expected 'full' or 'full2v'"
        )
    comps_i32 = jnp.asarray(comps_u8)  # u8: widened on device
    if dicts_u8 is not None:
        out, meta = pallas_decode_stream(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
            mode=mode,
        )
    else:
        out, meta = pallas_decode_stream(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap,
            mode=mode,
        )
    words = np.ascontiguousarray(np.asarray(out).reshape(out.shape[0], -1))
    u8 = words.view(np.uint8).reshape(words.shape[0], -1)
    out_b = np.ascontiguousarray(u8[:, :out_cap])
    meta = np.asarray(meta).reshape(-1, 8)
    return out_b, meta[:, 0], meta[:, 1]
