"""Pallas TPU LZ4 FAST encoder — the per-chip performance path.

Same hardware mapping as `decode_pallas`: grid over independent blocks, the
greedy hash-probe parse on the scalar unit against SMEM (the identical loop
shape to the canonical FAST compressor the reference ports,
`x64/LL64.fast.cs:35-513`, including the skip-acceleration heuristic and
backward match extension), with the byte movement vectorized:

- **match lengths** compare 128-byte chunks through the VPU and locate the
  first mismatch with a masked min-reduce (the vector analog of the
  reference's `LZ4_count` + CTZ, `x64/LL64.tools.cs:87-133`);
- **literal runs** copy via dynamic-row + lane-roll chunks;
- **sequence headers** (token, VLE runs, offset) are assembled in a lane
  register and stored with one masked row write per header.

The hash table (2^13 entries) lives in SMEM scratch — the analog of the
reference's 16 KB `LZ4_stream_t.hashTable` (`Engine/LL.types.cs:32`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_tpu.constants import LAST_LITERALS, MF_LIMIT, MIN_MATCH, compress_bound
from lz4_tpu.ops.common import align1024

from lz4_tpu.ops.common import _words_le

_LANES = 128
_HLOG = 13  # 8K-entry hash table in SMEM
_SKIP_TRIGGER = 6


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)


def _encode_one(n, acc, src_s, src_v, htab, prev, out_ref, meta_ref, attempts: int):
    """Encode one block.

    src_s:  SMEM i32[1, 1, CAP]    LE words (byte(p) = word & 0xFF)
    src_v:  VMEM i32[1, CR, 128]   same bytes as lane rows
    htab:   SMEM i32[2^HLOG]       hash table scratch
    prev:   SMEM i32[bcap] | None  hash-chain links (HC levels only)
    attempts: python int           0 = FAST single probe; >0 = HC chain
             search depth (analog of the reference clTable nbSearches,
             `x64/LL64.high.cs:1124-1138`)
    acc:     traced i32            FAST acceleration: initial skip-search
             budget = acc << SKIP_TRIGGER (reference `LZ4_compress_fast`
             acceleration, `x64/LL64.fast.cs:517-576`)
    out_ref:VMEM i32[1, OR, 128]   compressed bytes out
    meta_ref: VMEM i32[1, 1, 128]  lane0 = compressed length
    """
    lane = _lane_iota()
    ocap = (out_ref.shape[-2] - 1) * _LANES

    def byte(p):
        return src_s[0, 0, p] & 0xFF

    def read4(p):
        return src_s[0, 0, p]

    def hash4(w):
        prod = (w * jnp.int32(-1640531535)).astype(jnp.uint32)
        return (prod >> (32 - _HLOG)).astype(jnp.int32)

    def read_chunk(src):
        row = src // _LANES
        ln = src % _LANES
        r0 = src_v[0, pl.ds(row, 1), :]
        r1 = src_v[0, pl.ds(row + 1, 1), :]
        sh = (_LANES - ln) % _LANES
        v0 = pltpu.roll(r0, shift=sh, axis=1)
        v1 = pltpu.roll(r1, shift=sh, axis=1)
        return jnp.where(lane < _LANES - ln, v0, v1)

    def write_chunk(dst, vec, cnt):
        row = dst // _LANES
        ln = dst % _LANES
        rolled = pltpu.roll(vec, shift=ln, axis=1)
        m0 = (lane >= ln) & (lane < ln + cnt)
        r0 = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = jnp.where(m0, rolled, r0)

        @pl.when(ln + cnt > _LANES)  # span spills into the next row
        def _():
            m1 = lane + _LANES < ln + cnt
            r1 = out_ref[0, pl.ds(row + 1, 1), :]
            out_ref[0, pl.ds(row + 1, 1), :] = jnp.where(m1, rolled, r1)

    def copy_literals(dst, src, cnt):
        def body(k, _):
            pos = k * _LANES
            write_chunk(dst + pos, read_chunk(src + pos), jnp.minimum(_LANES, cnt - pos))
            return 0

        jax.lax.fori_loop(0, (cnt + _LANES - 1) // _LANES, body, 0)

    def match_length(a, b, limit):
        """Common run length of positions a vs b, scanning 128-byte chunks."""

        def cond(s):
            ml, alive = s
            return alive

        def body(s):
            ml, alive = s
            va = read_chunk(a + ml)
            vb = read_chunk(b + ml)
            neq = (va != vb) | (lane + b + ml >= limit)
            first = jnp.min(jnp.where(neq, lane, _LANES))
            return ml + first, first == _LANES

        ml, _ = jax.lax.while_loop(cond, body, (0, True))
        return jnp.minimum(ml, limit - b)

    def emit_header(op, lit_len, mlv, off, has_match):
        """Token + literal VLE + offset; returns new op.  VLE runs longer
        than ~120 bytes of 255s spill into extra writes (rare)."""
        t_ll = jnp.minimum(lit_len, 15)
        t_ml = jnp.where(has_match, jnp.minimum(mlv, 15), 0)
        token = (t_ll << 4) | t_ml

        # fast path: header fits in one chunk (token + <=13 VLE + offset)
        v = lit_len - 15
        n255 = jnp.where(lit_len >= 15, v // 255, -1)  # -1 = no VLE field

        def small(_):
            # lanes: 0 = token, [1, 1+n255] = 255s/terminator
            hdr = jnp.where(lane == 0, token, 255)
            hdr = jnp.where(
                (n255 >= 0) & (lane == n255 + 1), v % 255, hdr
            )
            cnt = 1 + jnp.where(n255 >= 0, n255 + 1, 0)
            write_chunk(op, hdr, cnt)
            return op + cnt

        def big(_):
            # long 255 run: write token, then chunks of 255, then remainder
            write_chunk(op, jnp.where(lane == 0, token, 255), 1)
            o = op + 1

            def body(k, o):
                write_chunk(o, jnp.full((1, _LANES), 255, jnp.int32), _LANES)
                return o + _LANES

            full_chunks = n255 // _LANES
            o = jax.lax.fori_loop(0, full_chunks, body, o)
            rem = n255 - full_chunks * _LANES
            tail = jnp.where(lane == rem, v % 255, 255)
            write_chunk(o, tail, rem + 1)
            return o + rem + 1

        return jax.lax.cond(n255 >= _LANES - 2, big, small, None)

    def emit_offset_mlv(op, off, mlv):
        v = mlv - 15
        n255 = jnp.where(mlv >= 15, v // 255, -1)

        def small(_):
            fld = jnp.where(lane == 0, off & 0xFF, 255)
            fld = jnp.where(lane == 1, off >> 8, fld)
            fld = jnp.where((n255 >= 0) & (lane == n255 + 2), v % 255, fld)
            cnt = 2 + jnp.where(n255 >= 0, n255 + 1, 0)
            write_chunk(op, fld, cnt)
            return op + cnt

        def big(_):
            fld = jnp.where(lane == 0, off & 0xFF, jnp.where(lane == 1, off >> 8, 255))
            write_chunk(op, fld, 2)
            o = op + 2

            def body(k, o):
                write_chunk(o, jnp.full((1, _LANES), 255, jnp.int32), _LANES)
                return o + _LANES

            full_chunks = n255 // _LANES
            o = jax.lax.fori_loop(0, full_chunks, body, o)
            rem = n255 - full_chunks * _LANES
            tail = jnp.where(lane == rem, v % 255, 255)
            write_chunk(o, tail, rem + 1)
            return o + rem + 1

        return jax.lax.cond(n255 >= _LANES - 3, big, small, None)

    def emit_sequence_fast(op, anchor, p, off, ml):
        """Single-write emission for the common case: the whole sequence
        (token + short literal run + offset + short match VLE) fits in one
        128-lane chunk, so header fields and literals merge into ONE masked
        row write instead of three."""
        lit_len = p - anchor
        mlv = ml - MIN_MATCH
        lv = lit_len - 15
        n255l = jnp.where(lit_len >= 15, lv // 255, -1)
        hdr_len = 1 + jnp.where(n255l >= 0, n255l + 1, 0)
        mv = mlv - 15
        n255m = jnp.where(mlv >= 15, mv // 255, -1)
        tail_len = 2 + jnp.where(n255m >= 0, n255m + 1, 0)
        total = hdr_len + lit_len + tail_len

        token = (jnp.minimum(lit_len, 15) << 4) | jnp.minimum(mlv, 15)
        # literals, shifted into their field
        lits = pltpu.roll(read_chunk(anchor), shift=hdr_len, axis=1)
        mo = hdr_len + lit_len  # offset field start
        vec = jnp.where(
            lane == 0,
            token,
            jnp.where(
                lane < hdr_len,
                jnp.where(lane == n255l + 1, lv % 255, 255),
                jnp.where(
                    lane < mo,
                    lits,
                    jnp.where(
                        lane == mo,
                        off & 0xFF,
                        jnp.where(
                            lane == mo + 1,
                            off >> 8,
                            jnp.where(lane == mo + 1 + n255m + 1, mv % 255, 255),
                        ),
                    ),
                ),
            ),
        )
        write_chunk(op, vec, total)
        return op + total, total

    def emit_sequence_slow(op, anchor, p, off, ml):
        lit_len = p - anchor
        has_match = ml > 0
        mlv = jnp.maximum(ml - MIN_MATCH, 0)
        op = emit_header(op, lit_len, mlv, off, has_match)
        copy_literals(op, anchor, lit_len)
        op = op + lit_len
        return jax.lax.cond(
            has_match, lambda o: emit_offset_mlv(o, off, mlv), lambda o: o, op
        )

    def emit_sequence(op, anchor, p, off, ml):
        """Emit literals [anchor, p) then a match (ml == 0: final literals)."""
        lit_len = p - anchor
        # fast path bound: worst header 1+1, tail 2+1+1 with lit_len <= 110
        fits = (ml > 0) & (lit_len <= 110) & (ml - MIN_MATCH < 15 + 255 * 2)

        def fast(_):
            o2, _t = emit_sequence_fast(op, anchor, p, off, ml)
            return o2

        return jax.lax.cond(fits, fast, lambda _: emit_sequence_slow(op, anchor, p, off, ml), None)

    # ---- init hash table -------------------------------------------------
    def init_body(i, _):
        htab[i] = -1
        return 0

    jax.lax.fori_loop(0, 1 << _HLOG, init_body, 0)

    mf_limit = n - MF_LIMIT
    match_limit = n - LAST_LITERALS

    def scan_cond(state):
        p, anchor, op, search = state
        return p < mf_limit

    def fast_body(state):
        """One iteration = one emitted sequence.

        The probe scan runs in its own tight while_loop containing only
        scalar ops — keeping the emit machinery out of the hot loop matters
        because Mosaic predicates `lax.cond` branches (a cond body's cost is
        paid whether taken or not)."""
        p, anchor, op, search = state

        def find_cond(s):
            p, search, cand = s
            return (cand < 0) & (p < mf_limit)

        def find_body(s):
            p, search, cand = s
            w = read4(p)
            h = hash4(w)
            c = htab[h]
            htab[h] = p
            good = (c >= 0) & (p - c <= 65535) & (read4(c) == w)
            step = jnp.where(good, 0, search >> _SKIP_TRIGGER)
            return (
                p + step,
                search + jnp.where(good, 0, 1),
                jnp.where(good, c, -1),
            )

        p, search, cand = jax.lax.while_loop(
            find_cond, find_body, (p, search, jnp.int32(-1))
        )

        def take(args):
            p, anchor, op, cand = args

            # extend backwards
            def back_cond(s):
                pp, cc = s
                return (pp > anchor) & (cc > 0) & (byte(pp - 1) == byte(cc - 1))

            def back_body(s):
                pp, cc = s
                return pp - 1, cc - 1

            p2, c2 = jax.lax.while_loop(back_cond, back_body, (p, cand))
            ml = MIN_MATCH + match_length(
                c2 + MIN_MATCH, p2 + MIN_MATCH, match_limit
            )
            op2 = emit_sequence(op, anchor, p2, p2 - c2, ml)
            np_ = p2 + ml
            # seed one in-match position (improves future finds)
            htab[hash4(read4(np_ - 2))] = np_ - 2
            return np_, np_, op2, acc << _SKIP_TRIGGER

        def no_match(args):
            p, anchor, op, _ = args
            return p, anchor, op, search

        p, anchor, op, search = jax.lax.cond(
            cand >= 0, take, no_match, (p, anchor, op, cand)
        )
        return p, anchor, op, search

    def hc_insert(p):
        w = read4(p)
        h = hash4(w)
        prev[p] = htab[h]
        htab[h] = p

    def hc_search(p):
        """Walk the chain, return (best_len, best_cand); p already inserted."""
        w = read4(p)
        max_possible = match_limit - p

        def walk_cond(s):
            cand, best_len, best_cand, k = s
            return (
                (cand >= 0)
                & (p - cand <= 65535)
                & (k < attempts)
                & (best_len < max_possible)
            )

        def walk_body(s):
            cand, best_len, best_cand, k = s
            # quick rejects: 4-byte word and the byte that would extend best
            ok = (read4(cand) == w) & (
                byte(cand + best_len) == byte(p + best_len)
            )

            def measure(_):
                l = MIN_MATCH + match_length(
                    cand + MIN_MATCH, p + MIN_MATCH, match_limit
                )
                better = l > best_len
                return (
                    jnp.where(better, l, best_len),
                    jnp.where(better, cand, best_cand),
                )

            best_len2, best_cand2 = jax.lax.cond(
                ok, measure, lambda _: (best_len, best_cand), None
            )
            return prev[cand], best_len2, best_cand2, k + 1

        cand0 = prev[p]
        _, best_len, best_cand, _ = jax.lax.while_loop(
            walk_cond, walk_body, (cand0, 0, -1, 0)
        )
        return best_len, best_cand

    def hc_body(state):
        p, anchor, op, search = state

        def find_cond(s):
            p, blen, bcand = s
            return (blen < MIN_MATCH) & (p < mf_limit)

        def find_body(s):
            p, _, _ = s
            hc_insert(p)
            blen, bcand = hc_search(p)
            found = blen >= MIN_MATCH
            return jnp.where(found, p, p + 1), blen, bcand

        p, best_len, best_cand = jax.lax.while_loop(
            find_cond, find_body, (p, jnp.int32(0), jnp.int32(-1))
        )
        hit = best_len >= MIN_MATCH

        def take(args):
            p, anchor, op, cand = args

            def back_cond(s):
                pp, cc = s
                return (pp > anchor) & (cc > 0) & (byte(pp - 1) == byte(cc - 1))

            def back_body(s):
                pp, cc = s
                return pp - 1, cc - 1

            p2, c2 = jax.lax.while_loop(back_cond, back_body, (p, cand))
            ml = best_len + (p - p2)
            op2 = emit_sequence(op, anchor, p2, p2 - c2, ml)
            np_ = p2 + ml

            # insert the skipped in-match positions so later chains see them
            def ins_body(q, _):
                hc_insert(q)
                return 0

            jax.lax.fori_loop(p + 1, jnp.minimum(np_, mf_limit), ins_body, 0)
            return np_, np_, op2, search

        def skip(args):
            p, anchor, op, _ = args
            return p + 1, anchor, op, search

        p, anchor, op, search = jax.lax.cond(
            hit, take, skip, (p, anchor, op, best_cand)
        )
        return p, anchor, op, search

    scan_body = fast_body if attempts == 0 else hc_body

    small_block = n < MF_LIMIT + 1
    p0 = jnp.where(small_block, mf_limit, 0)  # skip scan for tiny blocks
    p, anchor, op, _ = jax.lax.while_loop(
        scan_cond, scan_body, (p0, 0, 0, acc << _SKIP_TRIGGER)
    )
    # final literals
    op = emit_sequence(op, anchor, n, 0, 0)

    errv = jnp.where(op > ocap, 1, 0)
    meta_ref[0, :, :] = jnp.where(lane == 0, op, jnp.where(lane == 1, errv, 0))


# Chain-search depth per level: single source of truth lives in
# lz4_tpu.ops.common (shared with the production kernels).
from lz4_tpu.ops.common import LEVEL_ATTEMPTS  # noqa: E402


@functools.partial(jax.jit, static_argnames=("bcap", "attempts"))
def pallas_encode(src_i32, lens, bcap: int, attempts: int = 0, accs=None):
    """src_i32: i32[B, CAP] block bytes (CAP % 128 == 0, >= bcap + 128 pad).

    attempts = 0 selects the FAST single-probe parse; > 0 selects hash-chain
    search of that depth (HC levels).  ``accs``: i32[1] acceleration (traced,
    so changing it does not recompile).  Returns (out i32[B, OCAP],
    meta i32[B, 128]): meta[:,0] = compressed length, meta[:,1] = overflow.
    """
    b, cap = src_i32.shape
    # row+roll reads touch row+1, so >= 2 rows of tail pad are required
    assert cap % _LANES == 0 and cap >= bcap + 2 * _LANES, (cap, bcap)
    if accs is None:
        accs = jnp.ones((1,), jnp.int32)
    cr = cap // _LANES
    orows = align1024(compress_bound(bcap)) // _LANES + 1

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap), lambda i, lens, accs: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, cr, _LANES), lambda i, lens, accs: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orows, _LANES), lambda i, lens, accs: (i, 0, 0)),
            pl.BlockSpec((1, 1, _LANES), lambda i, lens, accs: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((1 << _HLOG,), jnp.int32),
            pltpu.SMEM((bcap if attempts else 8,), jnp.int32),
        ],
    )

    def kernel(lens_ref, accs_ref, src_s, src_v, out_ref, meta_ref, htab, prev):
        i = pl.program_id(0)
        acc = jnp.maximum(accs_ref[0], 1)
        _encode_one(
            lens_ref[i], acc, src_s, src_v, htab, prev, out_ref, meta_ref,
            attempts,
        )

    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, orows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, _LANES), jnp.int32),
        ],
    )(
        lens,
        accs,
        _words_le(src_i32).reshape(b, 1, cap),
        src_i32.reshape(b, cr, _LANES),
    )
    return out.reshape(b, orows * _LANES), meta.reshape(b, _LANES)


def encode_blocks_pallas(
    bufs_u8: np.ndarray, lens: np.ndarray, bcap: int, level: int = 0,
    acceleration: int = 1,
):
    """Host wrapper: u8[B, CAP] raw blocks -> (u8[B, OCAP], clens, errs)."""
    src = jnp.asarray(bufs_u8, jnp.int32)
    attempts = LEVEL_ATTEMPTS.get(int(level), 0)
    out, meta = pallas_encode(
        src, jnp.asarray(lens, jnp.int32), bcap, attempts,
        jnp.asarray([acceleration], jnp.int32),
    )
    meta = np.asarray(meta)
    return np.asarray(out).astype(np.uint8), meta[:, 0], meta[:, 1]
