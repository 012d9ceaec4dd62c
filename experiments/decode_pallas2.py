"""Pallas TPU LZ4 block decoder, v2 — split parse/copy architecture.

The v1 kernel (`decode_pallas.py`) interleaves the scalar token parse with
vector copies in one sequence loop; Mosaic's predication of vector branches
plus ~60-cycle while_loop iteration overhead put it at ~500 cycles/sequence.
This kernel restructures the mapping (same capability surface, reference
`LZ4_decompress_generic`, `x64/LL64.dec.cs:124-467`):

- **Phase A (parse)**: a scalar-only loop over tokens/VLE fields writes a
  sequence table (lit_at, lit_len, offset, match_len) into SMEM scratch.
  Two sequences are parsed per loop iteration (unrolled) and the loop body
  contains zero vector ops, so the scalar pipeline runs unimpeded.
- **Phase B (copy)**: a second loop walks the table and moves bytes with
  128-lane row+roll chunk copies (single-write merged fast path for short
  sequences, period-doubling for overlapping matches).
- Phases alternate over bounded table chunks (CHUNK sequences per round) so
  SMEM scratch stays small and the design extends to arbitrarily large
  blocks later.

Error detection (malformed offsets/lengths/overruns) happens in the parse
phase, all-scalar; the copy phase only runs over validated sequences.
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
_CHUNK = 2048  # sequences per parse/copy round (4 x 8KB SMEM tables)


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)


def _decode_one(clen, dict_len, comp_s, comp_v, dict_v, out_ref, meta_ref,
                t_lit, t_ll, t_off, t_ml, skip_copy: bool = False):
    """Decode one block via alternating parse/copy rounds.

    comp_s:  SMEM i32[1, 1, CAP]   LE words (scalar parse reads)
    comp_v:  VMEM i32[1, CR, 128]  same bytes as lane rows (vector reads)
    dict_v:  VMEM i32[1, DR, 128]  dictionary bytes, right-aligned
    out_ref: VMEM i32[1, OR, 128]  dict prefix + decoded bytes
    t_*:     SMEM i32[CHUNK]       per-round sequence table scratch
    """
    dr = dict_v.shape[-2] - 1
    dcap = dr * _LANES
    ocap = (out_ref.shape[-2] - 1) * _LANES
    lane = _lane_iota()
    lo = dcap - dict_len  # window floor (match offsets may reach the dict)

    @pl.when(dict_len > 0)
    def _():
        def cp(r, _):
            out_ref[0, pl.ds(r, 1), :] = dict_v[0, pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(lo // _LANES, dr, cp, 0)

    def read_byte(p):
        return comp_s[0, 0, p] & 0xFF

    def read_vle(p):
        """15+ extension: sum 255-run starting at p. Returns (value, next_p)."""

        def cond(s):
            v, q, last = s
            return (last == 255) & (q < clen)

        def body(s):
            v, q, last = s
            b = read_byte(q)
            return v + b, q + 1, b

        v0, q0, _ = jax.lax.while_loop(cond, body, (0, p, 255))
        return v0, q0

    # ---- Phase A: scalar parse of up to CHUNK sequences ------------------
    def parse_one(state):
        """state = (ip, op, ns, err, done); parses one sequence and appends
        it to the tables.  All scalar."""
        ip, op, ns, err, done = state
        w0 = comp_s[0, 0, jnp.minimum(ip, clen - 1)]
        token = w0 & 0xFF
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
            w1 = comp_s[0, 0, jnp.minimum(ip2, clen - 1)]
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
        # unroll x2: second parse guarded (scalar-only branch)
        return jax.lax.cond(parse_cond(state), parse_one, lambda s: s, state)

    # ---- Phase B: vector copies over the table ---------------------------
    def read_chunk(ref, src):
        row = src // _LANES
        ln = src % _LANES
        r0 = ref[0, pl.ds(row, 1), :]
        r1 = ref[0, pl.ds(row + 1, 1), :]
        sh = (_LANES - ln) % _LANES
        v0 = pltpu.roll(r0, shift=sh, axis=1)
        v1 = pltpu.roll(r1, shift=sh, axis=1)
        return jnp.where(lane < _LANES - ln, v0, v1)

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
        merged = (ll + ml <= 120) & ((ml == 0) | (off >= ll + ml))

        @pl.when(merged & (ll + ml > 0))
        def _():
            lit = read_chunk(comp_v, lit_at)
            mat = read_chunk(out_ref, jnp.maximum(m0 - off, 0))
            vec = jnp.where(lane < ll, lit, pltpu.roll(mat, shift=ll, axis=1))
            write_chunk(op, vec, ll + ml)

        @pl.when(~merged)
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

    # ---- outer rounds ----------------------------------------------------
    def round_cond(state):
        ip, op, err, done, cop = state
        return (~done) & (err == 0)

    def round_body(state):
        ip, op, err, done, cop = state
        ip, op, ns, err, done = jax.lax.while_loop(
            parse_cond, parse_body, (ip, op, 0, err, done)
        )

        if not skip_copy:
            cop = jax.lax.fori_loop(0, ns, copy_one, cop)
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
def pallas_decode2(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                   dict_lens=None, with_dict: bool = False,
                   skip_copy: bool = False):
    """Drop-in equivalent of `decode_pallas.pallas_decode` (v2 kernel).

    ``skip_copy`` elides the copy phase (wrong output, parse timing only —
    benchmarking knob)."""
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
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
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


def decode_blocks_pallas2(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
):
    """Host wrapper mirroring `decode_pallas.decode_blocks_pallas`."""
    comps_i32 = jnp.asarray(comps_u8, jnp.int32)
    if dicts_u8 is not None:
        out, meta = pallas_decode2(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8, jnp.int32),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
        )
    else:
        out, meta = pallas_decode2(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap
        )
    out = np.asarray(out[:, :out_cap]).astype(np.uint8)
    meta = np.asarray(meta)
    return out, meta[:, 0], meta[:, 1]
