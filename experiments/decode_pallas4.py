"""Pallas TPU LZ4 block decoder, v4 — branch-minimal parse + copy.

Measured on v5e (kbench r2): every lax control structure (while back-edge,
cond, when) costs ~50-100 cycles on the scalar pipeline, and the v1/v2
kernels spend ~5 of them per sequence in each phase.  v4 restructures both
phases around *predication instead of branching*:

- **speculative VLE parse**: literal/match length extensions are read as a
  whole LE word (4 extension bytes cover runs up to ~1 KB); the 255-run
  count and terminator byte come from ALU selects, not loops.  Exactly ONE
  rare-path cond per sequence (VLE > 4 bytes, i.e. runs > ~1 KB) survives.
  The last-sequence case is a masked select, not a branch.
- **unconditional merged copy**: every sequence does the single-write
  128-lane merged emission with a masked byte count (0 when the sequence
  does not qualify), spill row written unconditionally; only long/
  overlapping sequences (~10-20%) take a cond into the span/doubling path.
- **4x unrolled loops** amortize the remaining back-edge cost.

Same capability surface as v1 (`decode_pallas.pallas_decode`): batch of
<=64 KB blocks, dictionary mode, full malformed-input detection (all
checks are scalar ALU in the parse).
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
_CHUNK = 2048  # sequences per parse/copy round
_UNROLL = 4


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)


def _decode_one(clen, dict_len, comp_s, comp_v, dict_v, out_ref, meta_ref,
                t_lit, t_ll, t_off, t_ml, skip_copy: bool = False):
    """Decode one block (see pallas_decode4 for ref shapes)."""
    dr = dict_v.shape[-2] - 1
    dcap = dr * _LANES
    ocap = (out_ref.shape[-2] - 1) * _LANES
    lane = _lane_iota()
    lo = dcap - dict_len

    @pl.when(dict_len > 0)
    def _():
        def cp(r, _):
            out_ref[0, pl.ds(r, 1), :] = dict_v[0, pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(lo // _LANES, dr, cp, 0)

    def word(p):
        return comp_s[0, 0, jnp.minimum(jnp.maximum(p, 0), clen - 1)]

    def byte(p):
        return word(p) & 0xFF

    def vle4(w):
        """Decode a <=4-byte VLE run from word w.

        Returns (value, n_bytes, overflow): value = 255*n255 + terminator,
        n_bytes = n255 + 1; overflow when all 4 bytes are 255."""
        b0 = w & 0xFF
        b1 = (w >> 8) & 0xFF
        b2 = (w >> 16) & 0xFF
        b3 = (w >> 24) & 0xFF
        f0 = b0 == 255
        f1 = f0 & (b1 == 255)
        f2 = f1 & (b2 == 255)
        f3 = f2 & (b3 == 255)
        n255 = (
            f0.astype(jnp.int32)
            + f1.astype(jnp.int32)
            + f2.astype(jnp.int32)
            + f3.astype(jnp.int32)
        )
        term = jnp.where(
            f2, b3, jnp.where(f1, b2, jnp.where(f0, b1, b0))
        )
        return 255 * n255 + term, n255 + 1, f3

    def vle_long(p):
        """Rare path: arbitrary-length 255 run starting at p."""

        def cond(s):
            v, q, last = s
            return (last == 255) & (q < clen)

        def body(s):
            v, q, last = s
            b = byte(q)
            return v + b, q + 1, b

        v0, q0, _ = jax.lax.while_loop(cond, body, (0, p, 255))
        return v0, q0

    # ---- phase A: speculative scalar parse -------------------------------
    def parse_one(state):
        ip, op, ns, err, done = state
        alive = (~done) & (err == 0)
        w0 = word(ip)
        llt = (w0 >> 4) & 15
        mlt = w0 & 15
        bad = ip >= clen

        # literal length (speculative 4-byte VLE)
        lv, ln_b, lov = vle4(word(ip + 1))
        has_llx = llt == 15
        ll = jnp.where(has_llx, 15 + lv, llt)
        lit_at = ip + 1 + jnp.where(has_llx, ln_b, 0)
        ip2 = lit_at + ll
        # match fields (speculative; harmless reads when last/short)
        w1 = word(ip2)
        off = w1 & 0xFFFF
        mv, mn_b, mov = vle4(word(ip2 + 2))
        has_mlx = mlt == 15
        ml = jnp.where(has_mlx, MIN_MATCH + 15 + mv, mlt + MIN_MATCH)
        ip3 = ip2 + 2 + jnp.where(has_mlx, mn_b, 0)

        rare = (has_llx & lov) | (has_mlx & mov)

        def slow(_):
            # full general parse with unbounded VLE loops
            lvs, la = jax.lax.cond(
                has_llx,
                lambda q: (lambda v_q: (15 + v_q[0], v_q[1]))(vle_long(q)),
                lambda q: (llt, q),
                ip + 1,
            )
            ip2s = la + lvs

            def m_ext(q):
                v, qq = vle_long(q)
                return MIN_MATCH + 15 + v, qq

            mls, ip3s = jax.lax.cond(
                has_mlx,
                m_ext,
                lambda q: (mlt + MIN_MATCH, q),
                ip2s + 2,
            )
            return lvs, la, ip2s, word(ip2s) & 0xFFFF, mls, ip3s

        ll, lit_at, ip2, off, ml, ip3 = jax.lax.cond(
            rare,
            slow,
            lambda _: (ll, lit_at, ip2, off, ml, ip3),
            None,
        )

        is_last = ip2 >= clen
        ml = jnp.where(is_last, 0, ml)
        ip3 = jnp.where(is_last, ip2, ip3)
        off = jnp.where(is_last, 1, off)
        bad = (
            bad
            | (ip2 > clen)
            | (op + ll + ml > ocap)
            | (
                (~is_last)
                & ((off == 0) | (off > op + ll - lo) | (ip3 > clen)
                   | (ip2 + 2 > clen))
            )
        )
        ok = alive & ~bad
        t_lit[ns] = jnp.where(ok, lit_at, 0)  # clamp: copy reads this row
        t_ll[ns] = jnp.where(ok, ll, 0)
        t_off[ns] = jnp.where(ok, off, 1)
        t_ml[ns] = jnp.where(ok, ml, 0)
        return (
            jnp.where(alive, ip3, ip),
            jnp.where(ok, op + ll + ml, op),
            ns + jnp.where(ok, 1, 0),
            jnp.where(alive & bad, 1, err),
            done | (alive & (is_last | bad)),
        )

    def parse_cond(state):
        ip, op, ns, err, done = state
        return (~done) & (ns < _CHUNK)

    def parse_body(state):
        for _ in range(_UNROLL):
            state = parse_one(state)  # fully predicated; no guard cond
        return state

    # ---- phase B: predicated vector copies -------------------------------
    def read_chunk(ref, src):
        row = src // _LANES
        ln = src % _LANES
        r0 = ref[0, pl.ds(row, 1), :]
        r1 = ref[0, pl.ds(row + 1, 1), :]
        sh = (_LANES - ln) % _LANES
        v0 = pltpu.roll(r0, shift=sh, axis=1)
        v1 = pltpu.roll(r1, shift=sh, axis=1)
        return jnp.where(lane < _LANES - ln, v0, v1)

    def write_chunk2(dst, vec, n):
        """Two-row masked write, both rows unconditional (n may be 0)."""
        row = dst // _LANES
        ln = dst % _LANES
        rolled = pltpu.roll(vec, shift=ln, axis=1)
        m0 = (lane >= ln) & (lane < ln + n)
        r0 = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = jnp.where(m0, rolled, r0)
        m1 = lane + _LANES < ln + n
        r1 = out_ref[0, pl.ds(row + 1, 1), :]
        out_ref[0, pl.ds(row + 1, 1), :] = jnp.where(m1, rolled, r1)

    def write_chunk(dst, vec, n):
        row = dst // _LANES
        ln = dst % _LANES
        rolled = pltpu.roll(vec, shift=ln, axis=1)
        m0 = (lane >= ln) & (lane < ln + n)
        r0 = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = jnp.where(m0, rolled, r0)

        @pl.when(ln + n > _LANES)
        def _():
            m1 = lane + _LANES < ln + n
            r1 = out_ref[0, pl.ds(row + 1, 1), :]
            out_ref[0, pl.ds(row + 1, 1), :] = jnp.where(m1, rolled, r1)

    def copy_span(dst, src, n, src_ref):
        def body(k, _):
            pos = k * _LANES
            take = jnp.minimum(_LANES, n - pos)
            write_chunk(dst + pos, read_chunk(src_ref, src + pos), take)
            return 0

        jax.lax.fori_loop(0, (n + _LANES - 1) // _LANES, body, 0)

    def copy_one(s, op):
        lit_at = t_lit[s]
        ll = t_ll[s]
        off = t_off[s]
        ml = t_ml[s]
        m0 = op + ll
        fast = (ll + ml <= 120) & ((ml == 0) | (off >= ll + ml))

        # unconditional merged emission (masked to 0 bytes when not fast)
        lit = read_chunk(comp_v, lit_at)
        mat = read_chunk(out_ref, jnp.maximum(m0 - off, 0))
        vec = jnp.where(lane < ll, lit, pltpu.roll(mat, shift=ll, axis=1))
        write_chunk2(op, vec, jnp.where(fast, ll + ml, 0))

        @pl.when(~fast)
        def _():
            @pl.when(ll > 0)
            def _():
                copy_span(op, lit_at, ll, comp_v)

            @pl.when(ml > 0)
            def _():
                def dbl_cond(st):
                    dist, copied = st
                    return (dist < _LANES) & (copied < ml)

                def dbl_body(st):
                    dist, copied = st
                    n = jnp.minimum(dist, ml - copied)
                    copy_span(m0 + copied, m0 + copied - dist, n, out_ref)
                    return dist * 2, copied + n

                dist_f, copied = jax.lax.while_loop(
                    dbl_cond, dbl_body, (off, 0)
                )

                @pl.when(copied < ml)
                def _():
                    copy_span(m0 + copied, m0 + copied - dist_f,
                              ml - copied, out_ref)

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
        # pad the table so the unrolled copy loop reads only no-op tails
        for k in range(_UNROLL):
            t_ll[ns + k] = 0
            t_ml[ns + k] = 0
            t_lit[ns + k] = 0
            t_off[ns + k] = 1

        if not skip_copy:
            def copy4(g, o):
                s = g * _UNROLL
                for k in range(_UNROLL):
                    o = copy_one(s + k, o)
                return o

            cop = jax.lax.fori_loop(0, (ns + _UNROLL - 1) // _UNROLL,
                                    copy4, cop)
        return ip, op, err, done, cop

    ip, op, err, done, cop = jax.lax.while_loop(
        round_cond, round_body, (0, dcap, 0, False, dcap)
    )
    errv = jnp.where(err != 0, err, jnp.where(ip != clen, 2, 0))
    meta_ref[0, :, :] = jnp.where(
        lane == 0, op - dcap, jnp.where(lane == 1, errv, 0)
    )


_DICT_ROWS = 65536 // _LANES + 1


@functools.partial(
    jax.jit, static_argnames=("out_cap", "with_dict", "skip_copy")
)
def pallas_decode4(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                   dict_lens=None, with_dict: bool = False,
                   skip_copy: bool = False):
    """Drop-in equivalent of `decode_pallas.pallas_decode` (v4 kernel)."""
    b, cap = comps_i32.shape
    assert cap % _LANES == 0, cap
    cr = cap // _LANES
    if with_dict:
        dr = _DICT_ROWS
        assert dicts_i32 is not None and dicts_i32.shape == (b, 65536)
        dict_rows = jnp.concatenate(
            [dicts_i32, jnp.zeros((b, _LANES), jnp.int32)], axis=1
        ).reshape(b, dr, _LANES)
    else:
        dr = 1
        dict_rows = jnp.zeros((b, dr, _LANES), jnp.int32)
        dict_lens = jnp.zeros_like(comp_lens)
    dcap = (dr - 1) * _LANES
    orows = dcap // _LANES + out_cap // _LANES + 1

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap),
                lambda i, lens, dlens: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, cr, _LANES), lambda i, lens, dlens: (i, 0, 0)),
            pl.BlockSpec((1, dr, _LANES), lambda i, lens, dlens: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orows, _LANES), lambda i, lens, dlens: (i, 0, 0)),
            pl.BlockSpec((1, 1, _LANES), lambda i, lens, dlens: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((_CHUNK + _UNROLL,), jnp.int32),
            pltpu.SMEM((_CHUNK + _UNROLL,), jnp.int32),
            pltpu.SMEM((_CHUNK + _UNROLL,), jnp.int32),
            pltpu.SMEM((_CHUNK + _UNROLL,), jnp.int32),
        ],
    )

    def kernel(lens_ref, dlens_ref, comp_s, comp_v, dict_v, out_ref, meta_ref,
               t_lit, t_ll, t_off, t_ml):
        i = pl.program_id(0)
        _decode_one(
            lens_ref[i], dlens_ref[i], comp_s, comp_v, dict_v, out_ref,
            meta_ref, t_lit, t_ll, t_off, t_ml, skip_copy=skip_copy,
        )

    words = _words_le(comps_i32)
    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, orows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, _LANES), jnp.int32),
        ],
    )(
        comp_lens,
        dict_lens,
        words.reshape(b, 1, cap),
        comps_i32.reshape(b, cr, _LANES),
        dict_rows,
    )
    out = out.reshape(b, orows * _LANES)[:, dcap:]
    return out, meta.reshape(b, _LANES)


def decode_blocks_pallas4(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
):
    """Host wrapper mirroring `decode_pallas.decode_blocks_pallas`."""
    comps_i32 = jnp.asarray(comps_u8, jnp.int32)
    if dicts_u8 is not None:
        out, meta = pallas_decode4(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8, jnp.int32),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
        )
    else:
        out, meta = pallas_decode4(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap
        )
    out = np.asarray(out[:, :out_cap]).astype(np.uint8)
    meta = np.asarray(meta)
    return out, meta[:, 0], meta[:, 1]
