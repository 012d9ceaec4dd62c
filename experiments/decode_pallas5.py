"""Pallas TPU LZ4 block decoder, v5 — all-scalar packed-word pipeline.

Microbenchmarks on this v5e (ubench.py) overturned the v1-v4 design: the
scalar pipeline is fast (while back-edge ~6 cyc, SMEM load ~4, SMEM store
~6, untaken branch ~8) while the vector byte-alignment primitive
`pltpu.roll` costs ~73 cycles — and the v1 copy path needs 4-6 rolls per
sequence (~400 cyc/seq).  A packed-word SCALAR copy costs ~11 cyc per FOUR
bytes (load + shift-merge + store), beating the vector path for every
realistic sequence length.

So v5 is the reference decoder's actual shape (`LZ4_decompress_generic`,
`x64/LL64.dec.cs:124-467`) run on the scalar core against SMEM:

- compressed bytes come in as per-byte LE words (word[p] = bytes p..p+3),
  so any 4 literal bytes arrive in ONE load regardless of phase;
- output is built as packed little-endian words with a sequential append
  register (acc/op carry): one store per 4 output bytes, overshoot stores
  keep the array valid through op for self-referencing matches;
- matches with offset >= 8 read the packed output with a 2-load unaligned
  word read; offsets < 8 seed up to 12 bytes bytewise, then replicate the
  period from 3 pattern registers (no loads at all) — the scalar analog of
  the reference's overlap tables (`x64/LL64.dec.cs:408-425`);
- the output block itself lives in SMEM (pallas streams it back to HBM),
  with the 64 KB dictionary window DMA'd in as a packed prefix.

No vector unit involvement anywhere; the VPU/MXU stay free.
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
_DICT_WORDS = 65536 // 4  # packed dictionary prefix (chained mode)


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _decode_one(clen, dict_len, comp_s, dict_w, out_ref, meta_ref, sem,
                dcapw: int, out_cap: int):
    """Decode one block, all-scalar.

    comp_s:  SMEM i32[1, 1, CAP]  per-byte LE words (word[p] = bytes p..p+3)
    dict_w:  SMEM i32[1, 1, DW]   packed dictionary words (right-aligned)
    out_ref: SMEM i32[1, OW]      packed output words (dict prefix + data)
    meta_ref:SMEM i32[1, 8]       [0] produced bytes, [1] error
    """
    dcap = dcapw * 4
    lo = dcap - dict_len
    ocap = dcap + out_cap

    if dcapw >= 128:  # dict mode (static); slice widths stay 128-aligned
        @pl.when(dict_len > 0)
        def _():
            dma = pltpu.make_async_copy(
                dict_w.at[0, 0, pl.ds(0, dcapw)],
                out_ref.at[0, 0, pl.ds(0, dcapw)],
                sem,
            )
            dma.start()
            dma.wait()

    def W(p):
        """Bytes p..p+3 of the compressed stream as one LE word (uint32).

        Unclamped: every call site keeps p < clen (the parse validates ip
        before reading), and the buffer is padded well past clen."""
        return _u(comp_s[0, 0, p])

    def OUTW(q):
        return _u(out_ref[0, 0, q])

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
        """Append n (1..4) low bytes of uint32 w at byte position op.

        acc holds bytes [op & ~3, op); the store overshoots (the word is
        written with future bytes of w), keeping out valid through op+3-ish
        — the packed analog of the reference's wildcopy."""
        wp = op >> 2
        f = _u(op & 3)
        merged = acc | (w << (8 * f))
        out_ref[0, 0, wp] = _i(merged)
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
        """Unaligned packed read: bytes q..q+3 of the output space."""
        ph = _u(q & 3) * 8
        lw = OUTW(q >> 2)
        hw = OUTW((q >> 2) + 1)
        return jnp.where(
            ph == 0, lw, (lw >> ph) | (hw << ((32 - ph) & 31))
        )

    def read_out_byte(q):
        return (OUTW(q >> 2) >> (8 * _u(q & 3))) & 0xFF

    def copy_match_far(acc, op, off, ml):
        """off >= 16: word-group copy from the packed output.  The source
        phase is constant across the match, so the unaligned read runs
        incrementally: each group reuses the previous group's high word
        (ONE load per 4 bytes).  The one-group read-ahead is safe because
        the farthest byte touched (src + k + 7) stays below the store
        frontier (dst - 3) whenever off > 10."""
        ms = op - off
        ph = _u(ms & 3) * 8
        phc = (32 - ph) & 31
        mi0 = ms >> 2
        lo0 = OUTW(mi0)

        def body(s):
            k, acc, op, lo = s
            hi = OUTW(mi0 + (k >> 2) + 1)
            w = jnp.where(ph == 0, lo, (lo >> ph) | (hi << phc))
            acc, op = append(acc, op, w, jnp.minimum(4, ml - k))
            return k + 4, acc, op, hi

        _, acc, op, _ = jax.lax.while_loop(
            lambda s: s[0] < ml, body, (0, acc, op, lo0)
        )
        return acc, op

    def copy_match_mid(acc, op, off, ml):
        """8 <= off < 16: per-group unaligned reads (no read-ahead; only
        the exact 4 source bytes are consumed, all below the frontier)."""
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
        """off < 8: seed min(ml, 12) bytes bytewise (keeps the array exactly
        current), then replicate the period from 3 pattern registers."""
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
            # store acc so the 12 seeded bytes are fully readable
            out_ref[0, 0, op >> 2] = _i(acc)
            base = op - 12
            w0 = read_out_u(base)
            w1 = read_out_u(base + 4)
            w2 = read_out_u(base + 8)
            # rotating byte shift: group k starts at pattern phase s = k mod
            # off; the 12-byte window w0..w2 covers phases s <= 6
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
                s2 = jnp.where(s2 >= off, s2 - off, s2)  # off>=2 -> s2<off
                s2 = jnp.where(off == 1, 0, s2)
                return k + 4, acc, op, s2

            k2, acc, op, _ = jax.lax.while_loop(
                lambda st: st[0] < ml, gbody, (12, acc, op, s0)
            )
            return acc, op

        acc, op = jax.lax.cond(
            ml > 12, group_phase, lambda a: a, (acc, op)
        )
        return acc, op

    def seq_cond(state):
        ip, op, acc, err, done = state
        return (~done) & (err == 0)

    def seq_body(state):
        ip, op, acc, err, done = state
        bad = ip >= clen
        w0 = _i(W(ip))
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
            woff = _i(W(ip)) & 0xFFFF
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
                # make the partial word readable before self-referencing
                out_ref[0, 0, op >> 2] = _i(acc)

                def far_or_mid(a):
                    return jax.lax.cond(
                        off >= 16,
                        lambda a: copy_match_far(a[0], a[1], off, ml),
                        lambda a: copy_match_mid(a[0], a[1], off, ml),
                        a,
                    )

                return jax.lax.cond(
                    off >= 8,
                    far_or_mid,
                    lambda a: copy_match_near(a[0], a[1], off, ml),
                    (acc, op),
                )

            return jax.lax.cond(ml > 0, do_match, lambda a: a, (acc, op))

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
    out_ref[0, 0, op >> 2] = _i(acc)  # final partial word
    errv = jnp.where(err != 0, err, jnp.where(ip != clen, 2, 0))
    meta_ref[0, 0, 0] = op - dcap
    meta_ref[0, 0, 1] = errv
    for k in range(2, 8):
        meta_ref[0, 0, k] = 0


@functools.partial(jax.jit, static_argnames=("out_cap", "with_dict"))
def pallas_decode5(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                   dict_lens=None, with_dict: bool = False):
    """comps_i32: i32[B, CAP] one byte per element, zero padded.

    Returns (out_words i32[B, OW] packed LE words with the dict prefix
    stripped by the host wrapper, meta i32[B, 8])."""
    b, cap = comps_i32.shape
    assert cap % _LANES == 0, cap
    if with_dict:
        dw = _DICT_WORDS
        assert dicts_i32 is not None and dicts_i32.shape == (b, 65536)
        packed = (
            dicts_i32.reshape(b, dw, 4)
            * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
        ).sum(axis=2, dtype=jnp.int32)
        dict_words = packed.reshape(b, 1, dw)
    else:
        dw = 8
        dict_words = jnp.zeros((b, 1, dw), jnp.int32)
        dict_lens = jnp.zeros_like(comp_lens)
    dcapw = dw if with_dict else 2
    ow = dcapw + out_cap // 4 + 4

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap),
                lambda i, lens, dlens: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, dw),
                lambda i, lens, dlens: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, ow), lambda i, lens, dlens: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda i, lens, dlens: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )

    def kernel(lens_ref, dlens_ref, comp_s, dict_w, out_ref, meta_ref, sem):
        i = pl.program_id(0)
        _decode_one(
            lens_ref[i], dlens_ref[i], comp_s, dict_w, out_ref, meta_ref,
            sem, dcapw, out_cap,
        )

    words = _words_le(comps_i32)
    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, ow), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        ],
    )(
        comp_lens,
        dict_lens,
        words.reshape(b, 1, cap),
        dict_words,
    )
    return out, meta, dcapw


def decode_blocks_pallas5(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
):
    """Host wrapper mirroring `decode_pallas.decode_blocks_pallas`."""
    comps_i32 = jnp.asarray(comps_u8, jnp.int32)
    if dicts_u8 is not None:
        out, meta, dcapw = pallas_decode5(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8, jnp.int32),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
        )
    else:
        out, meta, dcapw = pallas_decode5(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap
        )
    words = np.ascontiguousarray(np.asarray(out).reshape(out.shape[0], -1))
    u8 = words.view(np.uint8).reshape(words.shape[0], -1)
    out_b = np.ascontiguousarray(
        u8[:, dcapw * 4 : dcapw * 4 + out_cap]
    )
    meta = np.asarray(meta).reshape(-1, 8)
    return out_b, meta[:, 0], meta[:, 1]
