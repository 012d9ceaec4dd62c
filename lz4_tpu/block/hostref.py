"""Clean-room scalar LZ4 block codec (pure Python) — the correctness oracle.

This is an independent implementation of the public LZ4 block format
(https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md), with the same
capability surface as the reference's block engine (reference
`Engine/x64/LL64.fast.cs`, `LL64.dec.cs`, `LL64.high.cs`):

- greedy FAST compressor with acceleration parameter,
- HC hash-chain compressor (levels 3-9) and optimal-parse (levels 10-12),
- safe decompressor with partial decode and dictionary support,
- dictionary (prefix) compression for chained frame blocks.

It is intentionally simple and scalar: it exists to validate the vectorized
TPU kernels (`lz4_tpu.ops`) and the native host codec, not to be fast.
Outputs are *valid LZ4* but not guaranteed byte-identical to any other
implementation (the format permits many valid encodings); the decoder accepts
any conforming stream.
"""

from __future__ import annotations

from ..constants import (
    DISTANCE_MAX,
    HC_LEVEL_TABLE,
    LAST_LITERALS,
    MF_LIMIT,
    MIN_MATCH,
    compress_bound,
)


class LZ4Error(ValueError):
    """Malformed LZ4 data."""


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_block(
    src: bytes,
    target_length: int | None = None,
    dictionary: bytes = b"",
    partial: bool = False,
    capacity: int | None = None,
) -> bytes:
    """Decode one LZ4 block.

    ``dictionary`` is prepended history: match offsets may reach into it.
    If ``partial``, decoding stops once ``target_length`` bytes are produced
    (like the reference's `PartialDecode`, `LZ4Codec.cs:123-134`); otherwise a
    stream that does not exactly fill/end is an error only in the sense of
    malformed input (the output length is returned as produced).
    ``capacity`` rejects outputs larger than the caller's bound (a crafted
    block cannot balloon past it).
    """
    src = bytes(src)
    n = len(src)
    dlen = len(dictionary)
    out = bytearray()
    limit = target_length if partial and target_length is not None else None
    hard_cap = capacity
    if target_length is not None and not partial:
        hard_cap = target_length if hard_cap is None else min(hard_cap, target_length)
    i = 0
    if n == 0:
        raise LZ4Error("empty input")
    while True:
        if i >= n:
            raise LZ4Error("truncated block (missing token)")
        token = src[i]
        i += 1
        # literal length
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise LZ4Error("truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise LZ4Error("literal run past end of input")
        if hard_cap is not None and len(out) + lit_len > hard_cap:
            raise LZ4Error("decoded output exceeds capacity")
        out += src[i : i + lit_len]
        i += lit_len
        if limit is not None and len(out) >= limit:
            return bytes(out[:limit])
        if i == n:
            # last sequence: literals only
            break
        # match
        if i + 2 > n:
            raise LZ4Error("truncated offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise LZ4Error("invalid offset 0")
        match_len = (token & 15) + MIN_MATCH
        if (token & 15) == 15:
            while True:
                if i >= n:
                    raise LZ4Error("truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        pos = len(out) - offset
        if pos < -dlen:
            raise LZ4Error("offset beyond window start")
        if hard_cap is not None and len(out) + match_len > hard_cap and limit is None:
            raise LZ4Error("decoded output exceeds capacity")
        for k in range(match_len):
            p = pos + k
            out.append(out[p] if p >= 0 else dictionary[dlen + p])
            if limit is not None and len(out) >= limit:
                return bytes(out[:limit])
    if target_length is not None and not partial and len(out) != target_length:
        raise LZ4Error(
            f"decoded length {len(out)} != expected {target_length}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# Shared sequence emitter
# ---------------------------------------------------------------------------


def _emit(out: bytearray, buf, lit_start: int, lit_len: int, offset: int, match_len: int):
    """Emit one sequence: literals buf[lit_start:lit_start+lit_len] then a
    match of match_len at offset.  match_len == 0 means final literals."""
    ml = 0 if match_len == 0 else match_len - MIN_MATCH
    token_ll = 15 if lit_len >= 15 else lit_len
    token_ml = 15 if ml >= 15 else ml
    out.append((token_ll << 4) | token_ml)
    if lit_len >= 15:
        v = lit_len - 15
        while v >= 255:
            out.append(255)
            v -= 255
        out.append(v)
    out += buf[lit_start : lit_start + lit_len]
    if match_len == 0:
        return
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml >= 15:
        v = ml - 15
        while v >= 255:
            out.append(255)
            v -= 255
        out.append(v)


def _match_length(buf, a: int, b: int, limit: int) -> int:
    """Length of common run buf[a+k]==buf[b+k], k < limit-b."""
    k = 0
    while b + k < limit and buf[a + k] == buf[b + k]:
        k += 1
    return k


# ---------------------------------------------------------------------------
# FAST (greedy) encoder
# ---------------------------------------------------------------------------


def _hash4(v: int) -> int:
    return ((v * 2654435761) & 0xFFFFFFFF) >> 17  # 15-bit table


def _read4(buf, i: int) -> int:
    return buf[i] | (buf[i + 1] << 8) | (buf[i + 2] << 16) | (buf[i + 3] << 24)


def encode_fast(
    src: bytes, dictionary: bytes = b"", acceleration: int = 1
) -> bytes:
    """Greedy LZ4 block compression (capability analog of the reference FAST
    path, `x64/LL64.fast.cs:35-513`): hash-table match finder with skip
    acceleration, backward match extension, immediate-retry after a match."""
    src = bytes(src)
    dictionary = bytes(dictionary[-DISTANCE_MAX - 1 :])
    buf = dictionary + src
    d = len(dictionary)
    n_total = len(buf)
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    mf_limit = n_total - MF_LIMIT
    match_limit = n_total - LAST_LITERALS
    acceleration = max(1, acceleration)

    table: dict[int, int] = {}
    # preload dictionary positions (stride 2, matching the native engine's
    # sparse seeding so the two host engines stay byte-identical in
    # dictionary mode; the stride is a speed heuristic, not wire format)
    for p in range(0, max(0, d - MIN_MATCH + 1), 2):
        table[_hash4(_read4(buf, p))] = p

    anchor = d
    p = d
    if n >= MF_LIMIT + 1:
        step = 1
        search_count = acceleration << 6  # skip trigger ~ LZ4_skipTrigger=6
        while p < mf_limit:
            h = _hash4(_read4(buf, p))
            cand = table.get(h, -1)
            table[h] = p
            if (
                cand >= 0
                and p - cand <= DISTANCE_MAX
                and _read4(buf, cand) == _read4(buf, p)
            ):
                # extend backwards
                while (
                    p > anchor
                    and cand > 0
                    and buf[p - 1] == buf[cand - 1]
                ):
                    p -= 1
                    cand -= 1
                mlen = MIN_MATCH + _match_length(
                    buf, cand + MIN_MATCH, p + MIN_MATCH, match_limit
                )
                _emit(out, buf, anchor, p - anchor, p - cand, mlen)
                p += mlen
                anchor = p
                if p >= mf_limit:
                    break
                # insert a position inside the match to improve future finds
                table[_hash4(_read4(buf, p - 2))] = p - 2
                # immediate retry at new position
                step = 1
                search_count = acceleration << 6
                continue
            step = search_count >> 6
            search_count += 1
            p += step
    # final literals
    _emit(out, buf, anchor, n_total - anchor, 0, 0)
    return bytes(out)


def encode_fast_canonical(src: bytes, acceleration: int = 1) -> bytes:
    """Canonical-schedule FAST (one-shot, no dictionary): byte-identical to
    upstream `LZ4_compress_default` / the reference's Fast64 engine
    (`x64/LL64.fast.cs:35-513`, whose Silesia golden sizes it inherits).

    The pure-python twin of `native/lz4tpu.c::lz4tpu_encode_fast_canonical`
    (schedule notes there): 13-bit u16-geometry table below the 64 KB limit
    and 12-bit table with a 5-byte hash above, first-byte insert with
    probing from byte 1, hash computed one probe ahead, step lagging the
    skip ramp by one, ip-2 refill, and the zero-literal immediate retry."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    acceleration = min(max(1, acceleration), 65537)
    u16 = n < 65536 + MF_LIMIT - 1

    if u16:
        def _h(p: int) -> int:
            return ((_read4(src, p) * 2654435761) & 0xFFFFFFFF) >> 19
        table = [0] * (1 << 13)
    else:
        def _h(p: int) -> int:
            v = int.from_bytes(src[p : p + 8], "little")
            return (((v << 24) * 889523592379) & ((1 << 64) - 1)) >> 52
        table = [0] * (1 << 12)

    if n < MF_LIMIT + 1:
        _emit(out, src, 0, n, 0, 0)
        return bytes(out)
    mf1 = n - MF_LIMIT + 1
    match_limit = n - LAST_LITERALS
    anchor = 0
    table[_h(0)] = 0
    ip = 1
    fh = _h(ip)
    while True:
        # find: probe ip, hash one ahead, step lags the ramp by one
        fwd = ip
        step = 1
        ramp = acceleration << 6
        while True:
            if CANON_STATS is not None:
                CANON_STATS["probes"] += 1
            h = fh
            ip = fwd
            fwd += step
            step = ramp >> 6
            ramp += 1
            if fwd > mf1:
                _emit(out, src, anchor, n - anchor, 0, 0)
                return bytes(out)
            mi = table[h]
            fh = _h(fwd)
            table[h] = ip
            if not u16 and mi + DISTANCE_MAX < ip:
                continue
            if _read4(src, mi) == _read4(src, ip):
                if CANON_STATS is not None:
                    CANON_STATS["matches"] += 1
                match = mi
                break
        while ip > anchor and match > 0 and src[ip - 1] == src[match - 1]:
            ip -= 1
            match -= 1
        while True:  # zero-literal immediate-retry chain
            mlen = MIN_MATCH + _match_length(
                src, match + MIN_MATCH, ip + MIN_MATCH, match_limit
            )
            _emit(out, src, anchor, ip - anchor, ip - match, mlen)
            ip += mlen
            anchor = ip
            if ip >= mf1:
                _emit(out, src, anchor, n - anchor, 0, 0)
                return bytes(out)
            table[_h(ip - 2)] = ip - 2
            h2 = _h(ip)
            mi2 = table[h2]
            table[h2] = ip
            if (u16 or mi2 + DISTANCE_MAX >= ip) and _read4(src, mi2) == _read4(
                src, ip
            ):
                match = mi2  # no back-extension on the retry
                continue
            break
        ip += 1
        fh = _h(ip)


class ChainedCanonicalEncoder:
    """Canonical linked-block (continue-schedule) FAST encoder over ONE
    contiguous buffer: byte-identical to feeding consecutive slices of the
    buffer through upstream `LZ4_compress_fast_continue` (the lz4 frame
    API's linked-block mode).  Pure-python twin of
    `native/lz4tpu.c::lz4tpu_encode_fast_continue` (schedule notes there:
    persistent byU32 table with absolute positions, 5-byte hash, per-block
    first-byte insert, catch-up floored at the 64 KB prefix window)."""

    def __init__(self, buf: bytes):
        self.buf = bytes(buf)
        self.table = [0] * (1 << 12)

    def _h(self, p: int) -> int:
        v = int.from_bytes(self.buf[p : p + 8], "little")
        return (((v << 24) * 889523592379) & ((1 << 64) - 1)) >> 52

    def encode_block(
        self, block_off: int, block_len: int, acceleration: int = 1
    ) -> bytes:
        src = self.buf
        out = bytearray()
        if block_len <= 0:
            return b"\x00"
        acceleration = min(max(1, acceleration), 65537)
        iend = block_off + block_len
        mf1 = iend - MF_LIMIT + 1
        match_limit = iend - LAST_LITERALS
        anchor = block_off
        low_limit = block_off - min(block_off, 65536)
        table = self.table
        _h = self._h
        if block_len < MF_LIMIT + 1:
            _emit(out, src, anchor, iend - anchor, 0, 0)
            return bytes(out)
        table[_h(block_off)] = block_off
        ip = block_off + 1
        fh = _h(ip)
        while True:
            fwd = ip
            step = 1
            ramp = acceleration << 6
            while True:
                h = fh
                ip = fwd
                fwd += step
                step = ramp >> 6
                ramp += 1
                if fwd > mf1:
                    _emit(out, src, anchor, iend - anchor, 0, 0)
                    return bytes(out)
                mi = table[h]
                fh = _h(fwd)
                table[h] = ip
                if mi + DISTANCE_MAX < ip:
                    continue
                if _read4(src, mi) == _read4(src, ip):
                    match = mi
                    break
            while (
                ip > anchor and match > low_limit
                and src[ip - 1] == src[match - 1]
            ):
                ip -= 1
                match -= 1
            while True:
                mlen = MIN_MATCH + _match_length(
                    src, match + MIN_MATCH, ip + MIN_MATCH, match_limit
                )
                _emit(out, src, anchor, ip - anchor, ip - match, mlen)
                ip += mlen
                anchor = ip
                if ip >= mf1:
                    _emit(out, src, anchor, iend - anchor, 0, 0)
                    return bytes(out)
                table[_h(ip - 2)] = ip - 2
                h2 = _h(ip)
                mi2 = table[h2]
                table[h2] = ip
                if mi2 + DISTANCE_MAX >= ip and _read4(src, mi2) == _read4(
                    src, ip
                ):
                    match = mi2
                    continue
                break
            ip += 1
            fh = _h(ip)


# ---------------------------------------------------------------------------
# HC (hash-chain) encoder — levels 3..9
# ---------------------------------------------------------------------------


def _hash5_hc(v: int) -> int:
    return ((v * 2654435761) & 0xFFFFFFFF) >> 17


_OPTIMAL_ML = 18  # (ML_MASK - 1) + MIN_MATCH
_OPT_NUM = 4096


def _count_pattern(buf, p: int, end: int, pattern: int) -> int:
    """Forward run length over which bytes repeat the LE 4-byte pattern."""
    start = p
    while p < end and buf[p] == (pattern & 0xFF):
        p += 1
        pattern = (pattern >> 8) | ((pattern & 0xFF) << 24)
    return p - start


def _count_back_pattern(buf, p: int, low: int, pattern: int) -> int:
    start = p
    while p > low and buf[p - 1] == (pattern >> 24):
        p -= 1
        pattern = ((pattern << 8) & 0xFFFFFFFF) | (pattern >> 24)
    return start - p


# Optional search-cost census (set to a dict to count chain-walk iterations
# and searches; used by the round-3 device-HC ceiling analysis in
# PERFORMANCE.md).  None = zero overhead beyond one comparison.
WALK_STATS = None

# optional canonical-FAST scan census (round 5): set to a dict with
# "probes"/"matches" keys to count find-loop iterations — used to convert
# kbench marginal-cost deltas into cycles/probe
CANON_STATS = None


class _ChainFinder:
    """Hash-chain match finder with the reference's search semantics: u16
    delta-ring chain, wider-match with backward extension, repeated-pattern
    acceleration, chain-swap (analog of `x64/LL64.high.cs:71-383`).  Kept
    byte-for-byte output-equivalent with the native C engine
    (`native/lz4tpu.c`) so the two cross-check each other."""

    def __init__(self, buf, match_limit: int, max_attempts: int):
        self.buf = buf
        self.match_limit = match_limit
        self.max_attempts = max_attempts
        self.head = [-1] * (1 << 15)
        self.delta = [0xFFFF] * 65536
        self.next_to_insert = 0
        self.max_insert = max(0, len(buf) - MIN_MATCH + 1)

    def insert_upto(self, pos: int):
        buf = self.buf
        end = min(pos, self.max_insert)
        head = self.head
        delta = self.delta
        for q in range(self.next_to_insert, end):
            h = _hash5_hc(_read4(buf, q))
            old = head[h]
            d = 0xFFFF if old < 0 else min(q - old, 0xFFFF)
            delta[q & 0xFFFF] = d
            head[h] = q
        self.next_to_insert = max(self.next_to_insert, end)

    def wider_match(
        self,
        ip: int,
        ilow: int,
        longest: int,
        pattern_analysis: bool,
        chain_swap: bool = False,
    ):
        """Widest match at ip whose start may slide back to ilow.  Returns
        (longest, m_start, m_pos); m_pos < 0 when nothing beat ``longest``."""
        buf = self.buf
        ihigh = self.match_limit
        pos = ip
        lowest = max(0, pos - DISTANCE_MAX)
        lookback = ip - ilow
        attempts = self.max_attempts
        pattern = _read4(buf, ip)
        chain_off = 0
        repeat_tested = False
        repeat_confirmed = False
        src_pat_len = 0
        m_start, m_pos = ip, -1
        delta = self.delta

        self.insert_upto(pos)
        cand = self.head[_hash5_hc(pattern)]
        while cand >= pos:  # skip self/ahead entries from lookahead probes
            d = delta[cand & 0xFFFF]
            if d > cand:
                cand = -1
                break
            cand -= d

        if WALK_STATS is not None:
            WALK_STATS["searches"] += 1
        while cand >= lowest and attempts > 0:
            match_len = 0
            attempts -= 1
            if WALK_STATS is not None:
                WALK_STATS["iters"] += 1
            # quick reject: bytes that would extend the best must match
            if (
                buf[ilow + longest - 1 : ilow + longest + 1]
                == buf[
                    cand - lookback + longest - 1 : cand - lookback + longest + 1
                ]
                and _read4(buf, cand) == pattern
            ):
                if lookback:
                    back = 0
                    floor = max(ilow - ip, -cand)
                    while back > floor and buf[ip + back - 1] == buf[cand + back - 1]:
                        back -= 1
                else:
                    back = 0
                match_len = (
                    MIN_MATCH
                    + _match_length(
                        buf, cand + MIN_MATCH, ip + MIN_MATCH, ihigh
                    )
                    - back
                )
                if match_len > longest:
                    longest = match_len
                    m_pos = cand + back
                    m_start = ip + back

            if chain_swap and match_len == longest and cand + longest <= pos:
                # candidate is the current best: follow the chain entry
                # inside it that jumps farthest back
                best_jump, end = 1, longest - MIN_MATCH + 1
                step, accel = 1, 1 << 4
                chain_off = 0
                q = 0
                while q < end:
                    d = delta[(cand + q) & 0xFFFF]
                    step = accel >> 4
                    accel += 1
                    if d > best_jump:
                        best_jump = d
                        chain_off = q
                        accel = 1 << 4
                    q += step
                if best_jump > 1:
                    if best_jump > cand:
                        break
                    cand -= best_jump
                    continue

            next_d = delta[cand & 0xFFFF]
            if pattern_analysis and next_d == 1 and chain_off == 0:
                # candidate sits in a repeated-pattern run: jump straight to
                # the best-aligned position of the run
                cand2 = cand - 1
                if not repeat_tested:
                    repeat_tested = True
                    repeat_confirmed = (
                        (pattern & 0xFFFF) == (pattern >> 16)
                        and (pattern & 0xFF) == (pattern >> 24)
                    )
                    if repeat_confirmed:
                        src_pat_len = (
                            _count_pattern(buf, ip + 4, ihigh, pattern) + 4
                        )
                if (
                    repeat_confirmed
                    and cand2 >= lowest
                    and _read4(buf, cand2) == pattern
                ):
                    fwd = _count_pattern(buf, cand2 + 4, ihigh, pattern) + 4
                    backp = min(
                        _count_back_pattern(buf, cand2, 0, pattern),
                        cand2 - lowest,
                    )
                    seg = backp + fwd
                    if seg >= src_pat_len and fwd <= src_pat_len:
                        cand = cand2 + fwd - src_pat_len
                    else:
                        cand = cand2 - backp
                        if lookback == 0:
                            max_ml = min(seg, src_pat_len)
                            if longest < max_ml:
                                if pos - cand > DISTANCE_MAX:
                                    break
                                longest = max_ml
                                m_pos = cand
                                m_start = ip
                            d2 = delta[cand & 0xFFFF]
                            if d2 > cand:
                                break
                            cand -= d2
                    continue

            d = delta[(cand + chain_off) & 0xFFFF]
            if d > cand:
                break
            cand -= d
        return longest, m_start, m_pos


def encode_hc(src: bytes, dictionary: bytes = b"", level: int = 9) -> bytes:
    """Hash-chain compressor with the reference's 3-candidate (ML1/ML2/ML3)
    speculative lookahead parse (capability analog of the HC path,
    `x64/LL64.high.cs:513-800`; search depth per level from the canonical
    clTable, `x64/LL64.high.cs:1124-1138`)."""
    src = bytes(src)
    dictionary = bytes(dictionary[-DISTANCE_MAX - 1 :])
    buf = dictionary + src
    d = len(dictionary)
    n_total = len(buf)
    n = len(src)
    if n == 0:
        return b"\x00"
    level = min(max(level, 3), 9)
    max_attempts = HC_LEVEL_TABLE[level][0]
    pa = max_attempts > 128  # pattern analysis from L9 up
    mf_limit = n_total - MF_LIMIT
    match_limit = n_total - LAST_LITERALS
    out = bytearray()
    finder = _ChainFinder(buf, match_limit, max_attempts)
    finder.insert_upto(d)

    anchor = d
    ip = d
    while ip <= mf_limit:
        ml, _, mp = finder.wider_match(ip, ip, MIN_MATCH - 1, pa)
        if ml < MIN_MATCH or mp < 0:
            ip += 1
            continue
        ref = mp
        start0, ref0, ml0 = ip, ref, ml

        state = 2
        ml2 = ml3 = 0
        start2 = ref2 = start3 = ref3 = 0
        while True:
            if state == 2:
                if ip + ml <= mf_limit:
                    ml2, start2, p2 = finder.wider_match(
                        ip + ml - 2, ip, ml, pa
                    )
                    if p2 >= 0:
                        ref2 = p2
                else:
                    ml2 = ml
                if ml2 == ml:  # no better overlap: emit ML1
                    _emit(out, buf, anchor, ip - anchor, ip - ref, ml)
                    ip += ml
                    anchor = ip
                    break
                if start0 < ip and start2 < ip + ml0:
                    # the skipped original ML1 still fits before ML2
                    ip, ref, ml = start0, ref0, ml0
                if start2 - ip < 3:  # ML1 too short to keep
                    ml, ip, ref = ml2, start2, ref2
                    continue  # re-enter search2
                state = 3
                continue

            # state == 3
            if start2 - ip < _OPTIMAL_ML:
                new_ml = min(ml, _OPTIMAL_ML)
                if ip + new_ml > start2 + ml2 - MIN_MATCH:
                    new_ml = (start2 - ip) + ml2 - MIN_MATCH
                corr = new_ml - (start2 - ip)
                if corr > 0:
                    start2 += corr
                    ref2 += corr
                    ml2 -= corr
            if start2 + ml2 <= mf_limit:
                ml3, start3, p3 = finder.wider_match(
                    start2 + ml2 - 3, start2, ml2, pa
                )
                if p3 >= 0:
                    ref3 = p3
            else:
                ml3 = ml2
            if ml3 == ml2:  # stable pair: emit ML1 then ML2
                if start2 < ip + ml:
                    ml = start2 - ip
                _emit(out, buf, anchor, ip - anchor, ip - ref, ml)
                anchor = ip + ml
                _emit(out, buf, anchor, start2 - anchor, start2 - ref2, ml2)
                ip = start2 + ml2
                anchor = ip
                break
            if start3 < ip + ml + 3:  # ML3 kills ML2
                if start3 >= ip + ml:
                    # ML1 can be emitted now; ML3 becomes the new ML1
                    if start2 < ip + ml:
                        corr = (ip + ml) - start2
                        start2 += corr
                        ref2 += corr
                        ml2 -= corr
                        if ml2 < MIN_MATCH:
                            start2, ref2, ml2 = start3, ref3, ml3
                    _emit(out, buf, anchor, ip - anchor, ip - ref, ml)
                    anchor = ip + ml
                    ip, ref, ml = start3, ref3, ml3
                    start0, ref0, ml0 = start2, ref2, ml2
                    state = 2
                    continue
                start2, ref2, ml2 = start3, ref3, ml3
                continue  # re-enter search3
            # three ascending matches: emit ML1 (trimmed), shift the window
            if start2 < ip + ml:
                if start2 - ip < _OPTIMAL_ML:
                    ml = min(ml, _OPTIMAL_ML)
                    if ip + ml > start2 + ml2 - MIN_MATCH:
                        ml = (start2 - ip) + ml2 - MIN_MATCH
                    corr = ml - (start2 - ip)
                    if corr > 0:
                        start2 += corr
                        ref2 += corr
                        ml2 -= corr
                else:
                    ml = start2 - ip
            _emit(out, buf, anchor, ip - anchor, ip - ref, ml)
            anchor = ip + ml
            ip, ref, ml = start2, ref2, ml2
            start2, ref2, ml2 = start3, ref3, ml3
            continue  # re-enter search3

    _emit(out, buf, anchor, n_total - anchor, 0, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Optimal parse — levels 10..12
# ---------------------------------------------------------------------------


def _lit_price(litlen: int) -> int:
    price = litlen
    if litlen >= 15:
        price += 1 + (litlen - 15) // 255
    return price


def _seq_price(litlen: int, mlen: int) -> int:
    """Cost in bytes of a sequence: token + lit VLE + literals + offset +
    match VLE (same cost model as reference `LL.high.cs:267-289`)."""
    price = 1 + 2 + _lit_price(litlen)
    ml = mlen - MIN_MATCH
    if ml >= 15:
        price += 1 + (ml - 15) // 255
    return price


def encode_opt(src: bytes, dictionary: bytes = b"", level: int = 12) -> bytes:
    """Exact price-model optimal parse (capability analog of the reference
    `LZ4HC_compress_optimal`, `x64/LL64.high.cs:803-1122`): per-position DP
    over 4096-byte windows with true literal/sequence prices, sufficient-
    length early exit, and L12 fullUpdate.  Byte-identical to the native C
    engine (`native/lz4tpu.c` lz4tpu_encode_opt)."""
    src = bytes(src)
    dictionary = bytes(dictionary[-DISTANCE_MAX - 1 :])
    buf = dictionary + src
    d = len(dictionary)
    n_total = len(buf)
    n = len(src)
    if n == 0:
        return b"\x00"
    level = min(max(level, 10), 12)
    searches, sufficient = HC_LEVEL_TABLE[level]
    full_update = level == 12
    sufficient = min(sufficient, _OPT_NUM - 1)
    TRAILING = 3
    mf_limit = n_total - MF_LIMIT
    match_limit = n_total - LAST_LITERALS
    out = bytearray()
    finder = _ChainFinder(buf, match_limit, searches)
    finder.insert_upto(d)

    def find(ip: int, min_len: int):
        ln, _, mp = finder.wider_match(
            ip, ip, min_len, pattern_analysis=True, chain_swap=True
        )
        if ln <= min_len or mp < 0:
            return 0, 0
        return ln, ip - mp

    # o[pos] = (price, off, mlen, litlen) for the cheapest way to reach
    # ip+pos inside the current window
    o = [(0, 0, 0, 0)] * (_OPT_NUM + TRAILING)
    ip = d
    anchor = d
    while ip <= mf_limit:
        llen = ip - anchor
        first_len, first_off = find(ip, MIN_MATCH - 1)
        if first_len == 0:
            ip += 1
            continue
        if first_len > sufficient:
            _emit(out, buf, anchor, llen, first_off, first_len)
            ip += first_len
            anchor = ip
            continue

        for r in range(MIN_MATCH):
            o[r] = (_lit_price(llen + r), 0, 1, llen + r)
        for m in range(MIN_MATCH, first_len + 1):
            o[m] = (_seq_price(llen, m), first_off, m, llen)
        last = first_len
        for a in range(1, TRAILING + 1):
            o[last + a] = (o[last][0] + _lit_price(a), 0, 1, a)

        best_mlen = best_off = 0
        early = False
        cur = 1
        while cur < last:
            cp = ip + cur
            if cp > mf_limit:
                break
            if full_update:
                if (
                    o[cur + 1][0] <= o[cur][0]
                    and o[cur + MIN_MATCH][0] < o[cur][0] + 3
                ):
                    cur += 1
                    continue
            elif o[cur + 1][0] <= o[cur][0]:
                cur += 1
                continue
            new_len, new_off = find(
                cp, MIN_MATCH - 1 if full_update else last - cur
            )
            if new_len == 0:
                cur += 1
                continue
            if new_len > sufficient or new_len + cur >= _OPT_NUM:
                best_mlen, best_off = new_len, new_off
                last = cur + 1
                early = True
                break
            base_ll = o[cur][3]
            for l in range(1, MIN_MATCH):
                price = (
                    o[cur][0] - _lit_price(base_ll) + _lit_price(base_ll + l)
                )
                pos = cur + l
                if price < o[pos][0]:
                    o[pos] = (price, 0, 1, base_ll + l)
            for m in range(MIN_MATCH, new_len + 1):
                pos = cur + m
                if o[cur][2] == 1:
                    ll = o[cur][3]
                    price = (o[cur - ll][0] if cur > ll else 0) + _seq_price(
                        ll, m
                    )
                else:
                    ll = 0
                    price = o[cur][0] + _seq_price(0, m)
                if pos > last + TRAILING or price <= o[pos][0]:
                    if m == new_len and last < pos:
                        last = pos
                    o[pos] = (price, new_off, m, ll)
            for a in range(1, TRAILING + 1):
                o[last + a] = (o[last][0] + _lit_price(a), 0, 1, a)
            cur += 1

        if not early:
            best_mlen = o[last][2]
            best_off = o[last][1]
            cur = last - best_mlen

        # reverse the chosen path in place, then emit forward
        pos = cur
        sel_len, sel_off = best_mlen, best_off
        while True:
            price, no, nl, nll = o[pos]
            o[pos] = (price, sel_off, sel_len, nll)
            sel_len, sel_off = nl, no
            if nl > pos:
                break
            pos -= nl
        r = 0
        while r < last:
            m, off = o[r][2], o[r][1]
            if m == 1:
                ip += 1
                r += 1
                continue
            r += m
            _emit(out, buf, anchor, ip - anchor, off, m)
            ip += m
            anchor = ip

    _emit(out, buf, anchor, n_total - anchor, 0, 0)
    return bytes(out)
