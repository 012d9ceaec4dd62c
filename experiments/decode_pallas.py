"""Pallas TPU LZ4 block decoder — the per-chip performance path.

The XLA dense-vector decoder (`decode_jax`) is elegant but gather-bound:
TPU dynamic gathers run at ~100 Melem/s, so its ~30 full-width passes cap it
at a few MB/s per chip.  This kernel uses the mapping the hardware rewards:

- **grid over blocks** — each grid step decodes one independent LZ4 block;
- **scalar sequence walk over SMEM** — the token/VLE state machine runs on
  the scalar unit against an SMEM copy of the compressed bytes (Mosaic
  forbids dynamic-lane scalar reads from VMEM), the same loop shape as the
  reference's `LZ4_decompress_generic` (`x64/LL64.dec.cs:124-467`);
- **row+roll vector copies** — output lives as (rows, 128) i32 lanes in
  VMEM; byte-granular copies read two adjacent rows, `pltpu.roll` aligns
  them, and masked merges write exact spans — 128 bytes per step through
  the VPU (the vector analog of the reference's `WildCopy8`,
  `Internal/x64/Mem64.cs:141-151`);
- **overlap doubling** — matches with offset < 128 replicate their period by
  doubling copies until a full-width copy is safe (the vector analog of the
  inc32/dec64 overlap trick, `x64/LL64.dec.cs:408-425`).

Bytes are widened to i32 lanes (the VPU is a 32-bit machine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_tpu.constants import MIN_MATCH

_LANES = 128


def _words_le(x):
    """Per-row 4-byte little-endian words: w[b, p] = bytes p..p+3 of row b."""
    z = jnp.zeros((x.shape[0], 3), x.dtype)
    x1 = jnp.concatenate([x[:, 1:], z[:, :1]], axis=1)
    x2 = jnp.concatenate([x[:, 2:], z[:, :2]], axis=1)
    x3 = jnp.concatenate([x[:, 3:], z], axis=1)
    return x | (x1 << 8) | (x2 << 16) | (x3 << 24)


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)


def _decode_one(clen, dict_len, comp_s, comp_v, dict_v, out_ref, meta_ref):
    """Decode one block.

    comp_s:  SMEM i32[1, 1, CAP]   LE words: comp_s[p] = 4 bytes at p
             (scalar access; byte(p) = word & 0xFF, offset = word & 0xFFFF)
    comp_v:  VMEM i32[1, CR, 128]  same bytes as lane rows (vector access)
    dict_v:  VMEM i32[1, DR, 128]  dictionary bytes, right-aligned in DR rows
    out_ref: VMEM i32[1, OR, 128]  first DR rows = dictionary window, decoded
             bytes from row DR (op starts at DR*128); caller slices
    meta_ref:VMEM i32[1, 1, 128]   lane0 = produced length, lane1 = error
    """
    dr = dict_v.shape[-2] - 1  # last dict row is read slack
    dcap = dr * _LANES  # output writing starts here
    ocap = (out_ref.shape[-2] - 1) * _LANES  # last row is slack
    lane = _lane_iota()

    # window floor: match offsets may reach back into the dictionary
    lo = dcap - dict_len

    # copy the dictionary window into the output prefix so match copies see
    # one flat history space (the analog of the reference chain decoder's
    # 64KB output ring head, `Encoders/LZ4ChainDecoder.cs:11-152`)
    @pl.when(dict_len > 0)
    def _():
        def cp(r, _):
            out_ref[0, pl.ds(r, 1), :] = dict_v[0, pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(lo // _LANES, dr, cp, 0)

    def read_byte(p):
        return comp_s[0, 0, p] & 0xFF

    def read_chunk(ref, src):
        """(1,128) i32 = bytes [src, src+128) of ref's flat lane space."""
        row = src // _LANES
        ln = src % _LANES
        r0 = ref[0, pl.ds(row, 1), :]
        r1 = ref[0, pl.ds(row + 1, 1), :]
        sh = (_LANES - ln) % _LANES
        v0 = pltpu.roll(r0, shift=sh, axis=1)  # element i = r0[i+ln]
        v1 = pltpu.roll(r1, shift=sh, axis=1)
        return jnp.where(lane < _LANES - ln, v0, v1)

    def write_chunk(dst, vec, n):
        """Write the first n (<=128) bytes of vec at flat position dst."""
        row = dst // _LANES
        ln = dst % _LANES
        rolled = pltpu.roll(vec, shift=ln, axis=1)  # element i = vec[i-ln]
        m0 = (lane >= ln) & (lane < ln + n)
        r0 = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = jnp.where(m0, rolled, r0)

        @pl.when(ln + n > _LANES)  # span spills into the next row
        def _():
            m1 = lane + _LANES < ln + n
            r1 = out_ref[0, pl.ds(row + 1, 1), :]
            out_ref[0, pl.ds(row + 1, 1), :] = jnp.where(m1, rolled, r1)

    def copy_span(dst, src, n, src_ref):
        """Copy n bytes from src_ref's flat lane space into out."""

        def body(k, _):
            pos = k * _LANES
            take = jnp.minimum(_LANES, n - pos)
            write_chunk(dst + pos, read_chunk(src_ref, src + pos), take)
            return 0

        jax.lax.fori_loop(0, (n + _LANES - 1) // _LANES, body, 0)

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

    def seq_cond(state):
        ip, op, err, done = state
        return (~done) & (err == 0)

    def seq_body(state):
        ip, op, err, done = state
        bad = ip >= clen
        token = read_byte(jnp.minimum(ip, clen - 1))
        ip = ip + 1
        ll = token >> 4

        def ll_ext(_):
            v, q = read_vle(ip)
            return 15 + v, q

        ll, ip = jax.lax.cond(ll == 15, ll_ext, lambda _: (ll, ip), None)
        lit_at = ip
        bad = bad | (ip + ll > clen) | (op + ll > ocap)  # ocap includes dcap
        ip = ip + ll
        is_last = ip >= clen

        # parse match fields before any copying (the reference's token
        # shortcut, `x64/LL64.dec.cs:182-225`, parses then moves bytes)
        def parse_match(args):
            ip, bad = args
            off = comp_s[0, 0, jnp.minimum(ip, clen - 1)] & 0xFFFF
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
                | (off == 0)
                | (off > op + ll - lo)  # window floor includes the dictionary
                | (op + ll + ml > ocap)
                | (ip > clen)
            )
            return ip, bad, off, ml

        ip, bad, off, ml = jax.lax.cond(
            is_last,
            lambda a: (a[0], a[1], jnp.int32(1), jnp.int32(0)),
            parse_match,
            (ip, bad),
        )

        m0 = op + ll
        # fast path: the whole sequence output fits one chunk and the match
        # source is entirely before it -> ONE masked row write
        merged = ~bad & (ll + ml <= 120) & ((ml == 0) | (off >= ll + ml))

        @pl.when(merged & (ll + ml > 0))
        def _():
            lit = read_chunk(comp_v, lit_at)
            mat = read_chunk(out_ref, jnp.maximum(m0 - off, 0))
            vec = jnp.where(lane < ll, lit, pltpu.roll(mat, shift=ll, axis=1))
            write_chunk(op, vec, ll + ml)

        @pl.when(~merged & ~bad)
        def _():
            @pl.when(ll > 0)
            def _():
                copy_span(op, lit_at, ll, comp_v)

            @pl.when(ml > 0)
            def _():
                def dbl_cond(s):
                    dist, copied = s
                    return (dist < _LANES) & (copied < ml)

                def dbl_body(s):
                    dist, copied = s
                    n = jnp.minimum(dist, ml - copied)
                    copy_span(m0 + copied, m0 + copied - dist, n, out_ref)
                    return dist * 2, copied + n

                dist_f, copied = jax.lax.while_loop(dbl_cond, dbl_body, (off, 0))

                @pl.when(copied < ml)
                def _():
                    # dist_f is a period multiple >= 128: chunk copies are safe
                    copy_span(m0 + copied, m0 + copied - dist_f, ml - copied, out_ref)

        op = op + jnp.where(bad, 0, ll + ml)
        return ip, op, jnp.where(bad, 1, 0), is_last

    ip, op, err, _ = jax.lax.while_loop(
        seq_cond, seq_body, (0, dcap, 0, False)
    )
    errv = jnp.where(err != 0, err, jnp.where(ip != clen, 2, 0))
    meta_ref[0, :, :] = jnp.where(
        lane == 0, op - dcap, jnp.where(lane == 1, errv, 0)
    )


_DICT_ROWS = 65536 // _LANES + 1  # 64KB window + read slack row


@functools.partial(jax.jit, static_argnames=("out_cap", "with_dict"))
def pallas_decode(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                  dict_lens=None, with_dict: bool = False):
    """comps_i32: i32[B, CAP] (one byte per lane, zero padded; CAP % 128 == 0).

    With ``with_dict``, ``dicts_i32`` is i32[B, 65536] (window bytes
    right-aligned) and matches may reach back into it (chained frame blocks,
    the analog of `LZ4_decompress_safe_usingDict`).

    Returns (out i32[B, out_cap + 128], meta i32[B, 128]):
    meta[:, 0] = produced length, meta[:, 1] = error flag.  ``out`` holds the
    decoded bytes from lane 0 (the dictionary prefix is stripped).
    """
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
    orows = dcap // _LANES + out_cap // _LANES + 1  # + slack row

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
    )

    def kernel(lens_ref, dlens_ref, comp_s, comp_v, dict_v, out_ref, meta_ref):
        i = pl.program_id(0)
        _decode_one(
            lens_ref[i], dlens_ref[i], comp_s, comp_v, dict_v, out_ref, meta_ref
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


def decode_blocks_pallas(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
):
    """Host wrapper: u8[B, CAP] compressed blocks -> (u8[B, out_cap], lens,
    errs).  ``dicts_u8``: u8[B, 65536] right-aligned window bytes for
    chained blocks (`LZ4_decompress_safe_usingDict` analog)."""
    comps_i32 = jnp.asarray(comps_u8, jnp.int32)
    if dicts_u8 is not None:
        out, meta = pallas_decode(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8, jnp.int32),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
        )
    else:
        out, meta = pallas_decode(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap
        )
    out = np.asarray(out[:, :out_cap]).astype(np.uint8)
    meta = np.asarray(meta)
    return out, meta[:, 0], meta[:, 1]
