"""Pallas TPU LZ4 encoder, v5 — all-scalar packed-word pipeline.

Same redesign as `decode_pallas5` and for the same measured reason: the
scalar pipeline is fast (SMEM load ~4 cyc, store ~6, back-edge ~6) while
the vector byte-alignment path costs ~73 cyc per `pltpu.roll` — and the v1
encoder's match-length compare and sequence emission were roll-heavy.

v5 runs the canonical FAST/HC parse (`x64/LL64.fast.cs:35-513`,
`x64/LL64.high.cs:513-800` one-step structure) entirely on the scalar core:

- source bytes come in as per-byte LE words (word[p] = bytes p..p+3): any
  4-byte window is ONE load — the hash probe, match compare, and literal
  reads all use it;
- match length: word-compare loop + mismatch-byte localization via masked
  compares (the scalar analog of `LZ4_count`+CTZ, `x64/LL64.tools.cs`);
- output is built as packed LE words with the sequential append register
  (one store per 4 bytes, overshoot allowed);
- the hash table (and HC chain ring) live in SMEM scratch as before.

No VPU/MXU involvement; grid over independent blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LAST_LITERALS, MF_LIMIT, MIN_MATCH, compress_bound
from .common import align1024
from .decode_pallas import _words_le

_LANES = 128
_HLOG = 13
_SKIP_TRIGGER = 6


def _u(x):
    return jnp.asarray(x).astype(jnp.uint32)


def _i(x):
    return jnp.asarray(x).astype(jnp.int32)


def _encode_one(n, acc0, src_s, htab, prev, out_ref, meta_ref,
                attempts: int, ocap: int):
    """Encode one block, all-scalar.

    src_s:   SMEM i32[1, 1, CAP]  per-byte LE words
    htab:    SMEM i32[2^HLOG]     hash -> most recent position
    prev:    SMEM u-ish i32[...]  chain ring (HC) or tiny stub (FAST)
    out_ref: SMEM i32[1, 1, OW]   packed compressed words
    meta_ref:SMEM i32[1, 1, 8]    [0] compressed bytes, [1] overflow flag
    """

    def W(p):
        return src_s[0, 0, p]

    def Wu(p):
        return _u(src_s[0, 0, p])

    def byte(p):
        return W(p) & 0xFF

    def hash4(w):
        prod = (w * jnp.int32(-1640531535)).astype(jnp.uint32)
        return _i(prod >> (32 - _HLOG))

    # ---- packed append ---------------------------------------------------
    def append(acc, op, w, cnt):
        """Append cnt (1..4) low bytes of uint32 w at byte position op."""
        wp = op >> 2
        f = _u(op & 3)
        merged = acc | (w << (8 * f))
        out_ref[0, 0, wp] = _i(merged)
        sh = (8 * (4 - f)) & 31
        spill = jnp.where(f > 0, w >> sh, jnp.uint32(0))
        op2 = op + cnt
        crossed = (op2 >> 2) > wp
        acc2 = jnp.where(crossed, spill, merged)
        f2 = _u(op2 & 3)
        keep = jnp.where(
            f2 > 0, (jnp.uint32(1) << (8 * f2)) - 1, jnp.uint32(0)
        )
        return acc2 & keep, op2

    def append_vle(acc, op, v):
        """15+ length extension: (v // 255) 0xFF bytes + terminator."""

        def cond(s):
            return s[0] >= 0

        # loop while there are >= 4 pending 0xFF bytes; then the final
        # (<4 x 0xFF + terminator) group.  v becomes -1 when terminated.
        def body2(s):
            v, acc, op = s
            full = v >= 255 * 4

            def emit_full(a):
                acc, op = a
                return append(acc, op, jnp.uint32(0xFFFFFFFF), 4)

            def emit_tail(a):
                acc, op = a
                n255 = v // 255
                term = v - n255 * 255
                run = jnp.where(
                    n255 > 0,
                    jnp.uint32(0xFFFFFFFF) >> _u(((4 - n255) * 8) & 31),
                    jnp.uint32(0),
                )
                w = run | (_u(term) << _u(8 * n255))
                return append(acc, op, w, n255 + 1)

            acc, op = jax.lax.cond(full, emit_full, emit_tail, (acc, op))
            return jnp.where(full, v - 255 * 4, -1), acc, op

        v, acc, op = jax.lax.while_loop(cond, body2, (v, acc, op))
        return acc, op

    def copy_literals(acc, op, lit_at, ll):
        def body(s):
            k, acc, op = s
            acc, op = append(acc, op, Wu(lit_at + k), jnp.minimum(4, ll - k))
            return k + 4, acc, op

        _, acc, op = jax.lax.while_loop(
            lambda s: s[0] < ll, body, (0, acc, op)
        )
        return acc, op

    def emit_sequence(acc, op, anchor, p, off, ml):
        """Emit literals [anchor, p) then a match (ml == 0: final literals)."""
        ll = p - anchor
        t_ll = jnp.minimum(ll, 15)
        mlv = jnp.maximum(ml - MIN_MATCH, 0)
        t_ml = jnp.where(ml > 0, jnp.minimum(mlv, 15), 0)
        token = _u((t_ll << 4) | t_ml)
        acc, op = append(acc, op, token, 1)

        def ll_ext(a):
            return append_vle(a[0], a[1], ll - 15)

        acc, op = jax.lax.cond(ll >= 15, ll_ext, lambda a: a, (acc, op))
        acc, op = copy_literals(acc, op, anchor, ll)

        def tail(a):
            acc, op = a
            acc, op = append(acc, op, _u(off), 2)

            def ml_ext(a):
                return append_vle(a[0], a[1], mlv - 15)

            return jax.lax.cond(mlv >= 15, ml_ext, lambda a: a, (acc, op))

        acc, op = jax.lax.cond(ml > 0, tail, lambda a: a, (acc, op))
        return acc, op

    # ---- match length: word compares + mismatch-byte localization --------
    def match_length(a, b, limit):
        """Common run length of positions a vs b (b < limit)."""

        def cond(s):
            k, done = s
            return ~done

        def body(s):
            k, done = s
            wa = W(a + k)
            wb = W(b + k)
            in_range = b + k + 4 <= limit
            same = (wa == wb) & in_range
            return k + jnp.where(same, 4, 0), ~same

        k, _ = jax.lax.while_loop(cond, body, (0, False))
        # localize the mismatch byte (or clip at the limit)
        z = _u(W(a + k)) ^ _u(W(b + k))
        tz = jnp.where(
            (z & 0xFF) == 0,
            1 + jnp.where(
                (z & 0xFFFF) == 0,
                1 + jnp.where((z & 0xFFFFFF) == 0, 1, 0),
                0,
            ),
            0,
        )
        tz = jnp.where(z == 0, 4, tz)
        return jnp.minimum(k + tz, limit - b)

    mf_limit = n - MF_LIMIT
    match_limit = n - LAST_LITERALS
    ocap_b = ocap

    # ---- init hash table -------------------------------------------------
    def init_body(h, _):
        htab[h] = -1
        return 0

    jax.lax.fori_loop(0, 1 << _HLOG, init_body, 0)

    # ---- FAST parse ------------------------------------------------------
    def fast_body(state):
        p, anchor, acc, op, search, err = state

        def find_cond(s):
            p, search, cand = s
            return (cand < 0) & (p < mf_limit)

        def find_body(s):
            # NOTE: a 4-way unrolled probe (precomputed miss-steps, pipelined
            # loads, first-hit select) measured SLOWER (33.9 vs 35.2 MB/s)
            # and worse ratio (0.471 vs 0.453) — post-hit bucket stores evict
            # useful candidates; the serial probe stays.
            p, search, cand = s
            w = W(p)
            h = hash4(w)
            c = htab[h]
            htab[h] = p
            good = (c >= 0) & (p - c > 0) & (p - c <= 65535) & (W(c) == w)
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
            p, anchor, acc, op, cand, err = args

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
            acc, op2 = emit_sequence(acc, op, anchor, p2, p2 - c2, ml)
            err = err | (op2 > ocap_b)
            np_ = p2 + ml
            htab[hash4(W(np_ - 2))] = np_ - 2
            return np_, np_, acc, op2, acc0 << _SKIP_TRIGGER, err

        def no_match(args):
            p, anchor, acc, op, _, err = args
            return p, anchor, acc, op, search, err

        p, anchor, acc, op, search, err = jax.lax.cond(
            cand >= 0, take, no_match, (p, anchor, acc, op, cand, err)
        )
        return p, anchor, acc, op, search, err

    # ---- HC parse (chain search, one-step-greedy on device) --------------
    def hc_insert(p):
        w = W(p)
        h = hash4(w)
        c = htab[h]

        # idempotence guard: the lazy lookahead probes p+1 before the take
        # path re-inserts the skipped range; re-inserting the chain head
        # would write a zero delta (a self-loop that wedges every walk)
        @pl.when(c != p)
        def _():
            d = jnp.where(c < 0, 0xFFFF, jnp.minimum(p - c, 0xFFFF))
            prev[p & 0xFFFF] = d
            htab[h] = p

    def hc_search(p):
        w = W(p)
        max_possible = match_limit - p
        lowest = jnp.maximum(p - 65535, 0)

        def walk_cond(s):
            cand, best_len, best_cand, k = s
            return (
                (cand >= lowest)
                & (k < attempts)
                & (best_len < max_possible)
            )

        def walk_body(s):
            cand, best_len, best_cand, k = s
            ok = (W(cand) == w) & (
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
            d = prev[cand & 0xFFFF]
            return (
                jnp.where(d > cand, -1 - 65535, cand - d),
                best_len2,
                best_cand2,
                k + 1,
            )

        # p was just inserted: its chain delta points at the previous
        # occurrence (0xFFFF sentinel yields a bogus candidate that the
        # word-compare rejects — same behavior as the native delta ring)
        c0 = p - prev[p & 0xFFFF]
        _, best_len, best_cand, _ = jax.lax.while_loop(
            walk_cond, walk_body, (c0, MIN_MATCH - 1, -1, 0)
        )
        return jnp.where(best_cand >= 0, best_len, 0), best_cand

    def hc_body(state):
        p, anchor, acc, op, search, err = state

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

        # one-step-lazy refinement: a strictly longer match starting at the
        # next byte wins a literal (lightweight analog of the reference's
        # ML2 lookahead, `x64/LL64.high.cs:568-617`)
        def lazy(args):
            p, best_len, best_cand = args

            def lbody(s):
                p, blen, bcand, _ = s
                hc_insert(p + 1)
                nlen, ncand = hc_search(p + 1)
                better = nlen > blen
                return (
                    jnp.where(better, p + 1, p),
                    jnp.where(better, nlen, blen),
                    jnp.where(better, ncand, bcand),
                    better & (p + 2 < mf_limit),
                )

            p, blen, bcand, _ = jax.lax.while_loop(
                lambda s: s[3], lbody, (p, best_len, best_cand, True)
            )
            return p, blen, bcand

        p, best_len, best_cand = jax.lax.cond(
            hit & (p + 1 < mf_limit), lazy,
            lambda a: a, (p, best_len, best_cand),
        )

        def take(args):
            p, anchor, acc, op, cand, err = args

            def back_cond(s):
                pp, cc = s
                return (pp > anchor) & (cc > 0) & (byte(pp - 1) == byte(cc - 1))

            def back_body(s):
                pp, cc = s
                return pp - 1, cc - 1

            p2, c2 = jax.lax.while_loop(back_cond, back_body, (p, cand))
            ml = best_len + (p - p2)
            acc, op2 = emit_sequence(acc, op, anchor, p2, p2 - c2, ml)
            err = err | (op2 > ocap_b)
            np_ = p2 + ml

            def ins_body(q, _):
                hc_insert(q)
                return 0

            jax.lax.fori_loop(p + 1, jnp.minimum(np_, mf_limit), ins_body, 0)
            return np_, np_, acc, op2, search, err

        def skip(args):
            p, anchor, acc, op, _, err = args
            return p + 1, anchor, acc, op, search, err

        p, anchor, acc, op, search, err = jax.lax.cond(
            hit, take, skip, (p, anchor, acc, op, best_cand, err)
        )
        return p, anchor, acc, op, search, err

    scan_body = fast_body if attempts == 0 else hc_body

    def scan_cond(state):
        p, anchor, acc, op, search, err = state
        return (p < mf_limit) & (~err)

    small_block = n < MF_LIMIT + 1
    p0 = jnp.where(small_block, mf_limit, 0)
    p, anchor, acc, op, _, err = jax.lax.while_loop(
        scan_cond, scan_body,
        (p0, 0, jnp.uint32(0), 0, acc0 << _SKIP_TRIGGER, False),
    )
    # final literals
    acc, op = emit_sequence(acc, op, anchor, n, 0, 0)
    out_ref[0, 0, op >> 2] = _i(acc)
    errv = jnp.where(err | (op > ocap_b), 1, 0)
    meta_ref[0, 0, 0] = op
    meta_ref[0, 0, 1] = errv
    for k in range(2, 8):
        meta_ref[0, 0, k] = 0


@functools.partial(jax.jit, static_argnames=("bcap", "attempts"))
def pallas_encode5(src_i32, lens, bcap: int, attempts: int = 0, accs=None):
    """src_i32: i32[B, CAP] block bytes (CAP % 128 == 0, >= bcap + pad).

    Returns (out_words i32[B, 1, OW] packed, meta i32[B, 1, 8])."""
    b, cap = src_i32.shape
    assert cap % _LANES == 0 and cap >= bcap + 2 * _LANES, (cap, bcap)
    if accs is None:
        accs = jnp.ones((1,), jnp.int32)
    ocap = align1024(compress_bound(bcap))
    ow = ocap // 4 + 4

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap), lambda i, lens, accs: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, ow), lambda i, lens, accs: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda i, lens, accs: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.SMEM((1 << _HLOG,), jnp.int32),
            pltpu.SMEM((65536 if attempts else 8,), jnp.int32),
        ],
    )

    def kernel(lens_ref, accs_ref, src_s, out_ref, meta_ref, htab, prev):
        i = pl.program_id(0)
        acc = jnp.maximum(accs_ref[0], 1)
        _encode_one(
            lens_ref[i], acc, src_s, htab, prev, out_ref, meta_ref,
            attempts, align1024(compress_bound(bcap)),
        )

    out, meta = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, ow), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        ],
    )(lens, accs, _words_le(src_i32).reshape(b, 1, cap))
    return out, meta


def encode_blocks_pallas5(
    bufs_u8: np.ndarray, lens: np.ndarray, bcap: int, level: int = 0,
    acceleration: int = 1,
):
    """Host wrapper: u8[B, CAP] raw blocks -> (u8[B, OCAP], clens, errs)."""
    from .encode_pallas import LEVEL_ATTEMPTS

    src = jnp.asarray(bufs_u8, jnp.int32)
    attempts = LEVEL_ATTEMPTS.get(int(level), 0)
    out, meta = pallas_encode5(
        src, jnp.asarray(lens, jnp.int32), bcap, attempts,
        jnp.asarray([acceleration], jnp.int32),
    )
    words = np.ascontiguousarray(np.asarray(out).reshape(out.shape[0], -1))
    u8 = words.view(np.uint8).reshape(words.shape[0], -1)
    meta = np.asarray(meta).reshape(-1, 8)
    return u8, meta[:, 0], meta[:, 1]
