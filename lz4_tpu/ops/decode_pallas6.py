"""Pallas TPU LZ4 block decoder, v6 — branch-merged parse, full-word copies.

v5 (`decode_pallas5.py`) measures ~250 cyc/sequence: ~40% parse (three
data-dependent conds per sequence at ~8 cyc each untaken, plus dependent
SMEM loads), ~45% copy (general per-group append carrying a `min`, a spill
select and a mask per 4 bytes).  v6 keeps the all-scalar packed-word design
(the measured-fastest; see PERFORMANCE.md) and attacks both halves:

- PARSE: ONE fast/slow cond per sequence.  The fast path covers tokens
  with no VLE extensions and a following match — the overwhelmingly
  common case — costing two SMEM loads (token word, offset word) and one
  combined bounds check; the slow path is v5's full logic (VLE loops,
  last-sequence handling, exact capacity checks).  The fast path also
  requires `op + 40 <= ocap`, so block-final sequences take the slow path
  and the fast path never needs exact output bounds.
- LITERAL COPY: the compressed stream is staged as per-byte LE words
  (word[p] = bytes p..p+3), so a DEST-aligned source word is ONE load at
  any byte phase: after the first (acc-merging) store, the loop body is a
  bare load+store pair — no shifts, no masks, no `min`.
- MATCH COPY, off >= 8 (replaces v5's separate far/mid paths): full-word
  stores with a constant source phase, one incremental source load per
  word (the previous iteration's high word is the next one's low word).
  The first store merges `acc`, making the head word fully valid, which
  is what licenses the incremental read-ahead for every off >= 8 (the
  fetched word index sw+j <= wp+j-1 is always below the store frontier).
- TAIL: no per-group masking anywhere; the final partial word [op2&~3,
  op2) is rebuilt in ONE step after the loop — from the literal stream
  via W(), or from the already-stored match source via an unaligned read
  — and carried in the acc register (stores overshoot into the partial
  word with garbage beyond op2, which the next merge rewrites).
- off < 8 keeps v5's seed + pattern-register replication path verbatim
  (it needs byte-granular appends; it is also the rarest).
- FUSED RUN (mode="full2", the production default): the fast arm loops
  over CONSECUTIVE fused sequences — each inner iteration copies one
  sequence and speculatively parses the next (two padded SMEM loads), so
  a run of k fast sequences pays ONE outer cond region switch instead of
  k (measured 77.0 -> 71.8 ms / 4 MiB; mode="full" keeps the one-
  sequence arm for A/B).

Same wire behavior as v5: meta layout, error codes (1 = malformed,
2 = trailing garbage), 64 KB preset-dictionary mode, same wrapper API.
Reference behavior anchor: `LZ4_decompress_generic`
(/root/reference/src/sanitized/lz4.c) / `x64/LL64.dec.cs:124-467`.
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

_LANES = 128
_DICT_WORDS = 65536 // 4


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _decode_one(clen, dict_len, comp_s, dict_w, out_ref, meta_ref, sem,
                dcapw: int, out_cap: int, mode: str = "full"):
    """Decode one block, all-scalar (see module docstring).

    comp_s:  SMEM i32[1, 1, CAP]  per-byte LE words (word[p] = bytes p..p+3)
    dict_w:  SMEM i32[1, 1, DW]   packed dictionary words (right-aligned)
    out_ref: SMEM i32[1, 1, OW]   packed output words (dict prefix + data)
    meta_ref:SMEM i32[1, 1, 8]    [0] produced bytes, [1] error
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

        Unclamped: the fused modes read SPECULATIVELY up to ~clen + 16
        (the offset/VLE word at ip+1 with a 15-nibble token near the end
        of input), so the staged buffer must carry >= 20 bytes of slack
        past the largest clen.  Every production caller stages at
        align1024(compress_bound(out_cap)) (slack >= ~700);
        decode_blocks_pallas6 enforces the bound for direct callers."""
        return _u(comp_s[0, 0, p])

    def OUTW(q):
        return _u(out_ref[0, 0, q])

    def mask8(f):
        """Low-byte mask for f in 0..3 (f == 0 -> 0)."""
        return (jnp.uint32(1) << (8 * _u(f))) - 1

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

    def append(acc, op, w, n):
        """General byte-exact append (near-match path only): n (1..4) low
        bytes of uint32 w at byte position op."""
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
        """Append ll literal bytes from stream position lit_at.

        Full-word stores only; the source read for dest word wp+j (j>=1)
        is the single load W(lit_at + 4j - f).  Degenerates correctly for
        ll == 0 (store0 writes garbage beyond op that the mask reclaims),
        so the caller needs no ll > 0 branch."""
        op2 = op + ll
        wp = op >> 2
        nw = (op2 >> 2) - wp
        f = op & 3
        lsh = _u(f) * 8
        w0 = W(lit_at)
        out_ref[0, 0, wp] = _i(acc | (w0 << lsh))
        base = lit_at - f  # word wp+j = W(base + 4j) for j >= 1

        def body(j):
            # NOTE: a 2x unroll (overshoot store into the partial word)
            # measured 51.0 vs 52.5 MB/s — copy trip counts are too short
            # to amortize it; keep the simple loop
            out_ref[0, 0, wp + j] = _i(W(base + 4 * j))
            return j + 1

        jax.lax.while_loop(lambda j: j < nw, body, 1)
        f2 = op2 & 3
        # max(0, .): the where evaluates both arms, and the unselected
        # (nw == 0) arm's index can go negative for tiny lit_at
        acc2 = jnp.where(
            nw > 0,
            W(jnp.maximum(lit_at + ll - f2, 0)),
            acc | (w0 << lsh),
        )
        return acc2 & mask8(f2), op2

    # NOTE (negative result, kept for the record): a dedicated short-match
    # path (off >= 8, ml <= 8: two unaligned reads + two appends) behind an
    # extra cond level measured 100.2 ms vs 82.4 ms per 4 MiB — 22% SLOWER
    # despite doing strictly less copy work.  A two-sided lax.cond in this
    # kernel costs ~100 cyc (live-state movement between Mosaic regions),
    # an order of magnitude above an untaken pl.when.  Branch-count
    # reduction, not path specialization, is the optimization axis.

    def copy_match_far(acc, op, off, ml):
        """off >= 8 (or ml == 0), any ml: full-word stores, constant source
        phase, one incremental source load per word after the first.

        Safety: store0 merges acc, so word wp is FULLY valid after it;
        the loop's fetched word sw+j has max byte 4(wp+j)+7-off <=
        4(wp+j)-1 for off >= 8, i.e. always below the store frontier.

        ml == 0 degenerates to a no-op (so the caller needs no ml > 0
        cond — saving one ~100 cyc region switch per sequence): off is
        clamped to >= 8 so the speculative s0/lo0 reads stay below the
        frontier, nw == 0 skips the loop, the store0 overshoot writes
        garbage above op that later stores rewrite, and the final select
        keeps the incoming acc."""
        acc_in = acc
        off = jnp.maximum(off, 8)
        op2 = op + ml
        wp = op >> 2
        f = op & 3
        nw = (op2 >> 2) - wp  # >= 1 (ml >= MIN_MATCH)
        lsh = _u(f) * 8
        s0 = read_out_u(op - off)
        out_ref[0, 0, wp] = _i(acc | (s0 << lsh))
        sb = 4 * wp + 4 - off  # src byte for dest word wp+1; phase constant
        ph = _u(sb & 3) * 8
        phc = (32 - ph) & 31
        sw = sb >> 2
        lo0 = OUTW(sw)

        def body(s):
            # 2x unrolled: the second store may overshoot into the partial
            # word wp+nw — harmless, its true bytes live in acc and the
            # next head store rewrites it.  The second fetch sw+j+1 <= wp+j
            # reads at most the word stored one instruction earlier.
            j, lov = s
            hi = OUTW(sw + j)
            w = jnp.where(ph == 0, lov, (lov >> ph) | (hi << phc))
            out_ref[0, 0, wp + j] = _i(w)
            hi2 = OUTW(sw + j + 1)
            w2 = jnp.where(ph == 0, hi, (hi >> ph) | (hi2 << phc))
            out_ref[0, 0, wp + j + 1] = _i(w2)
            return j + 2, hi2

        _, lov_fin = jax.lax.while_loop(
            lambda s: s[0] < nw, body, (1, lo0)
        )
        # CARRIED TAIL: the partial word's unaligned source spans source
        # words sw+nw-1 (lo) and sw+nw (hi).  The loop exits with
        # lov_fin = OUTW(sw + j_exit - 1), and j_exit = nw for odd nw
        # (lov_fin is the LO word; nw == 1 included via lo0) or nw + 1 for
        # even nw (lov_fin is the HI word) — so ONE load fetches the other
        # word instead of read_out_u's two.
        f2 = op2 & 3
        odd = nw & 1
        other = OUTW(sw + nw - 1 + odd)
        lo_w = jnp.where(odd == 1, lov_fin, other)
        hi_w = jnp.where(odd == 1, other, lov_fin)
        tail = jnp.where(ph == 0, lo_w, (lo_w >> ph) | (hi_w << phc))
        acc2 = tail & mask8(f2)
        return jnp.where(ml == 0, acc_in, acc2), op2

    def copy_match_near(acc, op, off, ml):
        """off < 8: store acc (the seed reads the partial word), seed
        min(ml, 12) bytes bytewise, then replicate the period from 3
        pattern registers (v5's path, kept verbatim)."""
        out_ref[0, 0, op >> 2] = _i(acc)
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
            out_ref[0, 0, op >> 2] = _i(acc)
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
        w0 = _i(W(ip))
        token = w0 & 0xFF
        ll0 = token >> 4
        mln = token & 15
        lit_at = ip + 1
        mo_at = lit_at + ll0
        # fast: no VLE on either field, a match follows (mo_at + 2 <= clen
        # implies ip < clen and not-last), and enough output slack that the
        # <= 14 + 18 bytes written (plus word overshoot) need no exact check
        fast = (
            (ll0 < 15) & (mln < 15)
            & (mo_at + 2 <= clen) & (op + 40 <= ocap)
        )

        def parse_fast(_):
            wo = _i(W(mo_at))
            off = wo & 0xFFFF
            bad = (off == 0) | (off > op + ll0 - lo)
            # bad -> ll=0/ml=0: the copy stage degenerates to a no-op, so
            # no separate cond(bad) wrapper is needed around it
            return (
                jnp.where(bad, 0, ll0), lit_at, off,
                jnp.where(bad, 0, mln + MIN_MATCH), mo_at + 2, bad,
                ll0 < 0,  # is_last: traced False
            )

        def parse_slow(_):
            def ll_ext(_):
                v, q = read_vle(lit_at)
                return 15 + v, q

            ll, ipp = jax.lax.cond(
                ll0 == 15, ll_ext, lambda _: (ll0, lit_at), None
            )
            bad = (ip >= clen) | (ipp + ll > clen) | (op + ll > ocap)
            la = ipp
            ipp = ipp + ll
            is_last = ipp >= clen

            def parse_match(args):
                ipq, badq = args
                woff = _i(W(ipq)) & 0xFFFF
                ipq = ipq + 2
                ml = mln + MIN_MATCH

                def ml_ext(_):
                    v, q = read_vle(ipq)
                    return MIN_MATCH + 15 + v, q

                ml, ipq = jax.lax.cond(
                    mln == 15, ml_ext, lambda _: (ml, ipq), None
                )
                badq = (
                    badq
                    | (woff == 0)
                    | (woff > op + ll - lo)
                    | (op + ll + ml > ocap)
                    | (ipq > clen)
                )
                return ipq, badq, woff, ml

            ip3, bad, off, ml = jax.lax.cond(
                is_last,
                lambda a: (a[0], a[1], jnp.int32(1), jnp.int32(0)),
                parse_match,
                (ipp, bad),
            )
            return (
                jnp.where(bad, 0, ll), la, off, jnp.where(bad, 0, ml),
                ip3, bad, is_last,
            )

        if mode == "full2v":
            # fused-run variant that also covers SINGLE-extension-byte
            # match VLE (ml 19..272): HC/OPT streams put 30-50% of their
            # sequences in that range, each previously paying the slow
            # arm's nested-cond machinery.  The extension byte rides in the
            # same speculative offset word (W(mo_at) >> 16), so the arm
            # costs only a few selects more than "full2".  Byte behavior
            # identical (predicates only move sequences between arms).
            wo_full = _u(W(mo_at))
            wo_s = _i(wo_full & 0xFFFF)
            isv0 = mln == 15
            ext0 = _i((wo_full >> 16) & 0xFF)
            ml0 = jnp.where(isv0, MIN_MATCH + 15 + ext0, mln + MIN_MATCH)
            adv0 = mo_at + 2 + _i(isv0)
            need0 = jnp.where(isv0, 304, 40)
            fused = (
                (ll0 < 15) & ((~isv0) | (ext0 < 255))
                & (adv0 <= clen) & (op + need0 <= ocap)
                & (wo_s >= 8) & (wo_s <= op + ll0 - lo)
            )

            def arm_fast_run_v(_):
                def fbody(st):
                    ipx, opx, accx, llx, mlv, advx, wox, ok = st
                    a2, o2 = copy_literals(accx, opx, ipx + 1, llx)
                    a3, o3 = copy_match_far(a2, o2, wox, mlv)
                    ip2 = advx
                    tokb = _i(W(ip2)) & 0xFF
                    llb = tokb >> 4
                    mlnb = tokb & 15
                    mo2 = ip2 + 1 + llb
                    w2 = _u(W(mo2))
                    wo2 = _i(w2 & 0xFFFF)
                    isv = mlnb == 15
                    ext = _i((w2 >> 16) & 0xFF)
                    mlv2 = jnp.where(isv, MIN_MATCH + 15 + ext, mlnb + MIN_MATCH)
                    adv2 = mo2 + 2 + _i(isv)
                    need = jnp.where(isv, 304, 40)
                    ok2 = (
                        (llb < 15) & ((~isv) | (ext < 255))
                        & (adv2 <= clen) & (o3 + need <= ocap)
                        & (wo2 >= 8) & (wo2 <= o3 + llb - lo)
                    )
                    return ip2, o3, a3, llb, mlv2, adv2, wo2, ok2

                ipf, opf, accf, _, _, _, _, _ = jax.lax.while_loop(
                    lambda st: st[7], fbody,
                    (ip, op, acc, ll0, ml0, adv0, wo_s, fused),
                )
                return ipf, opf, accf, err, done

            def arm_slow_v(_):
                ll, la, off, ml, ip2, bad, is_last = jax.lax.cond(
                    fast, parse_fast, parse_slow, None
                )
                a2, o2 = copy_literals(acc, op, la, ll)
                a3, o3 = jax.lax.cond(
                    (ml == 0) | (off >= 8),
                    lambda a: copy_match_far(a[0], a[1], off, ml),
                    lambda a: copy_match_near(a[0], a[1], off, ml),
                    (a2, o2),
                )
                return (
                    ip2, o3, a3, jnp.where(bad, 1, err),
                    done | is_last | bad,
                )

            return jax.lax.cond(fused, arm_fast_run_v, arm_slow_v, None)

        if mode in ("full", "full2", "parse2"):
            # Speculative offset load (mo_at <= ip + 15, inside padding):
            # lets the common case run parse + literal copy + far match
            # copy as ONE flat cond arm — a single region switch for the
            # ~85% of sequences with no VLE and off >= 8.  The slow arm
            # keeps the general machinery (its nested conds only tax the
            # rare sequences).
            wo_s = _i(W(mo_at)) & 0xFFFF
            fused = fast & (wo_s >= 8) & (wo_s <= op + ll0 - lo)

            def arm_fast(_):
                a2, o2 = copy_literals(acc, op, lit_at, ll0)
                a3, o3 = copy_match_far(a2, o2, wo_s, mln + MIN_MATCH)
                return mo_at + 2, o3, a3, err, done

            def arm_fast_run(_):  # mode full2 / parse2 (profile: no copies)
                # full2: stay inside the fast arm across CONSECUTIVE fused
                # sequences — an inner while whose body copies one fused
                # sequence and speculatively parses the next (two padded
                # SMEM loads), so a run of k fast sequences pays ONE outer
                # cond region switch instead of k.  The loop exits with
                # ip at the first non-fused sequence, which the next outer
                # iteration re-parses generically (same predicate as
                # `fused`, so wire behavior is identical to mode "full").
                def fbody(st):
                    ipx, opx, accx, llx, mlnx, moatx, wox, ok = st
                    if mode == "parse2":  # kbench profile: no byte emission
                        a3, o3 = accx, opx + llx + mlnx + MIN_MATCH
                    else:
                        a2, o2 = copy_literals(accx, opx, ipx + 1, llx)
                        a3, o3 = copy_match_far(
                            a2, o2, wox, mlnx + MIN_MATCH
                        )
                    ip2 = moatx + 2
                    tokb = _i(W(ip2)) & 0xFF
                    llb = tokb >> 4
                    mlnb = tokb & 15
                    mo2 = ip2 + 1 + llb
                    wo2 = _i(W(mo2)) & 0xFFFF
                    ok2 = (
                        (llb < 15) & (mlnb < 15)
                        & (mo2 + 2 <= clen) & (o3 + 40 <= ocap)
                        & (wo2 >= 8) & (wo2 <= o3 + llb - lo)
                    )
                    return ip2, o3, a3, llb, mlnb, mo2, wo2, ok2

                ipf, opf, accf, _, _, _, _, _ = jax.lax.while_loop(
                    lambda st: st[7], fbody,
                    (ip, op, acc, ll0, mln, mo_at, wo_s, fused),
                )
                return ipf, opf, accf, err, done

            def arm_slow(_):
                ll, la, off, ml, ip2, bad, is_last = jax.lax.cond(
                    fast, parse_fast, parse_slow, None
                )
                if mode == "parse2":
                    o3, a3 = op + ll + ml, acc
                else:
                    a2, o2 = copy_literals(acc, op, la, ll)
                    a3, o3 = jax.lax.cond(
                        (ml == 0) | (off >= 8),
                        lambda a: copy_match_far(a[0], a[1], off, ml),
                        lambda a: copy_match_near(a[0], a[1], off, ml),
                        (a2, o2),
                    )
                return (
                    ip2, o3, a3, jnp.where(bad, 1, err),
                    done | is_last | bad,
                )

            return jax.lax.cond(
                fused,
                arm_fast if mode == "full" else arm_fast_run,
                arm_slow,
                None,
            )

        ll, la, off, ml, ip2, bad, is_last = jax.lax.cond(
            fast, parse_fast, parse_slow, None
        )

        # profiling decomposition knob (kbench; mode == "full" returned
        # above) — "parse" skips all byte emission, "lit" emits literals
        # but skips match copies; both keep op/err exact so the parse walk
        # is byte-for-byte the same
        if mode == "parse":
            op = op + ll + ml
        else:  # "lit"
            acc, op = copy_literals(acc, op, la, ll)
            op = op + ml
        return (
            ip2,
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


_DECODE6_MODES = ("full", "full2", "full2v", "parse", "parse2", "lit")


@functools.partial(jax.jit, static_argnames=("out_cap", "with_dict", "mode"))
def pallas_decode6(comps_i32, comp_lens, out_cap: int, dicts_i32=None,
                   dict_lens=None, with_dict: bool = False,
                   mode: str = "full2"):
    """comps_i32: i32[B, CAP] one byte per element, zero padded.

    Returns (out_words i32[B, OW] packed LE words with the dict prefix
    stripped by the host wrapper, meta i32[B, 8]).

    Byte inputs may arrive as uint8: the widening to i32 runs ON DEVICE
    (inside this jit), so the host->device transfer ships 1 byte per
    byte instead of 4 (the tunnel moves ~35 MB/s — measured 2.9x faster
    ingestion for 8 MB payloads)."""
    if mode not in _DECODE6_MODES:
        # an unknown mode would otherwise FALL THROUGH to the 'lit'
        # profiling arm and return corrupt output with err=0
        raise ValueError(
            f"unknown decode mode {mode!r}; expected one of {_DECODE6_MODES}"
        )
    comps_i32 = comps_i32.astype(jnp.int32)
    b, cap = comps_i32.shape
    assert cap % _LANES == 0, cap
    if with_dict:
        dw = _DICT_WORDS
        assert dicts_i32 is not None and dicts_i32.shape == (b, 65536)
        packed = (
            dicts_i32.astype(jnp.int32).reshape(b, dw, 4)
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
            sem, dcapw, out_cap, mode,
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


def decode_blocks_pallas6(
    comps_u8: np.ndarray,
    comp_lens: np.ndarray,
    out_cap: int,
    dicts_u8: np.ndarray | None = None,
    dict_lens: np.ndarray | None = None,
    mode: str = "full2",
):
    """Host wrapper mirroring `decode_pallas5.decode_blocks_pallas5`.

    `mode`: "full2" (fused-run fast arm, the L00 headline) or "full2v"
    (fast arm also covers single-extension-byte match VLE — +8% on
    HC/OPT-shaped streams, -2.5% on L00; see PERFORMANCE.md)."""
    comp_lens_np = np.asarray(comp_lens)
    if comp_lens_np.size and (
        int(comp_lens_np.max()) + 20 > np.asarray(comps_u8).shape[1]
    ):
        # the kernel's fused parse reads speculatively up to ~clen + 16
        # (see W()'s contract); production staging always satisfies this
        raise ValueError(
            "compressed rows need >= 20 bytes of padding past the "
            "largest comp_len (stage at comp_capacity(out_cap))"
        )
    comps_i32 = jnp.asarray(comps_u8)  # u8: widened on device
    if dicts_u8 is not None:
        out, meta, dcapw = pallas_decode6(
            comps_i32,
            jnp.asarray(comp_lens, jnp.int32),
            out_cap,
            jnp.asarray(dicts_u8),
            jnp.asarray(dict_lens, jnp.int32),
            with_dict=True,
            mode=mode,
        )
    else:
        out, meta, dcapw = pallas_decode6(
            comps_i32, jnp.asarray(comp_lens, jnp.int32), out_cap, mode=mode
        )
    words = np.ascontiguousarray(np.asarray(out).reshape(out.shape[0], -1))
    u8 = words.view(np.uint8).reshape(words.shape[0], -1)
    out_b = np.ascontiguousarray(
        u8[:, dcapw * 4 : dcapw * 4 + out_cap]
    )
    meta = np.asarray(meta).reshape(-1, 8)
    return out_b, meta[:, 0], meta[:, 1]
