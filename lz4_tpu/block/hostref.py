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
    # preload dictionary positions
    for p in range(0, max(0, d - MIN_MATCH + 1)):
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


# ---------------------------------------------------------------------------
# HC (hash-chain) encoder — levels 3..9
# ---------------------------------------------------------------------------


def _hash5_hc(v: int) -> int:
    return ((v * 2654435761) & 0xFFFFFFFF) >> 17


class _ChainFinder:
    """Hash-chain match finder over dictionary+src (analog of the reference's
    chain tables, `Engine/LL.high.cs:103-122`)."""

    def __init__(self, buf, start: int, match_limit: int, max_attempts: int):
        self.buf = buf
        self.match_limit = match_limit
        self.max_attempts = max_attempts
        self.head: dict[int, int] = {}
        self.prev: dict[int, int] = {}
        self.next_to_insert = 0

    def insert_upto(self, pos: int):
        buf = self.buf
        end = min(pos, len(buf) - MIN_MATCH + 1)
        for q in range(self.next_to_insert, end):
            h = _hash5_hc(_read4(buf, q))
            old = self.head.get(h, -1)
            self.prev[q] = old
            self.head[h] = q
        self.next_to_insert = max(self.next_to_insert, end)

    def best_match(self, p: int) -> tuple[int, int]:
        """Longest match at p (ties -> nearest). Returns (length, offset) or
        (0, 0)."""
        buf = self.buf
        if p + MIN_MATCH > self.match_limit:
            return (0, 0)
        self.insert_upto(p)
        h = _hash5_hc(_read4(buf, p))
        cand = self.head.get(h, -1)
        best_len = 0
        best_off = 0
        attempts = self.max_attempts
        w4 = _read4(buf, p)
        max_possible = self.match_limit - p
        while cand >= p:  # table may contain future positions (backward DP)
            cand = self.prev.get(cand, -1)
        while cand >= 0 and attempts > 0:
            if p - cand > DISTANCE_MAX:
                break
            attempts -= 1
            if _read4(buf, cand) == w4:
                mlen = MIN_MATCH + _match_length(
                    buf, cand + MIN_MATCH, p + MIN_MATCH, self.match_limit
                )
                if mlen > best_len:
                    best_len = mlen
                    best_off = p - cand
                    if best_len >= max_possible:
                        break  # cannot do better
            cand = self.prev.get(cand, -1)
        if best_len < MIN_MATCH:
            return (0, 0)
        return (best_len, best_off)


def encode_hc(src: bytes, dictionary: bytes = b"", level: int = 9) -> bytes:
    """Hash-chain compressor with one-step-lazy parsing (capability analog of
    the reference HC path, `x64/LL64.high.cs:513-800`; search depth per level
    from the canonical clTable, `x64/LL64.high.cs:1124-1138`)."""
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
    mf_limit = n_total - MF_LIMIT
    match_limit = n_total - LAST_LITERALS
    out = bytearray()
    finder = _ChainFinder(buf, d, match_limit, max_attempts)
    finder.insert_upto(d)

    anchor = d
    p = d
    while p < mf_limit:
        mlen, moff = finder.best_match(p)
        if mlen == 0:
            p += 1
            continue
        # one-step lazy: if a strictly better match starts at p+1, emit a
        # literal instead
        while p + 1 < mf_limit:
            nlen, noff = finder.best_match(p + 1)
            if nlen > mlen:
                p += 1
                mlen, moff = nlen, noff
            else:
                break
        # extend backwards
        cand = p - moff
        while p > anchor and cand > 0 and buf[p - 1] == buf[cand - 1]:
            p -= 1
            cand -= 1
            mlen += 1
        _emit(out, buf, anchor, p - anchor, moff, mlen)
        p += mlen
        anchor = p
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
    """Optimal-parse compressor (capability analog of the reference
    `LZ4HC_compress_optimal`, `x64/LL64.high.cs:803-1122`): dynamic program
    over positions minimizing exact encoded size."""
    src = bytes(src)
    dictionary = bytes(dictionary[-DISTANCE_MAX - 1 :])
    buf = dictionary + src
    d = len(dictionary)
    n_total = len(buf)
    n = len(src)
    if n == 0:
        return b"\x00"
    level = min(max(level, 10), 12)
    # The canonical attempt counts (up to 16384 at L12) are intractable in
    # pure Python; this oracle caps search depth — ratio differs from the
    # reference, validity does not.  The TPU kernels use the full depth.
    max_attempts = min(HC_LEVEL_TABLE[level][0], 64)
    mf_limit = n_total - MF_LIMIT
    match_limit = n_total - LAST_LITERALS

    # collect all candidate matches (longest per chain candidate) per position
    finder = _ChainFinder(buf, d, match_limit, max_attempts)
    finder.insert_upto(d)

    # Backward DP over block positions (relative to d).  cost[i] = minimal
    # approximate bytes to encode src[i..n).  Literal cost is modeled as one
    # byte per literal (VLE run overhead folded in at emission); match cost is
    # exact: token + offset + match-length VLE.  This is the same cost model
    # shape as the reference's price functions (`LL.high.cs:267-289`) without
    # cross-sequence literal-run tracking — output is always valid LZ4, ratio
    # is >= HC in practice.
    INF = float("inf")
    cost = [0.0] * (n + 1)
    choice: list[tuple[int, int] | None] = [None] * (n + 1)
    # longest known match per position, for back-extension propagation
    bl = [0] * (n + 2)
    bo = [0] * (n + 2)
    for i in range(n - 1, -1, -1):
        best = cost[i + 1] + 1  # literal
        best_choice: tuple[int, int] | None = None
        p = d + i
        if p < mf_limit:
            mlen, moff = finder.best_match(p)
            # back-extension: a match at i+1 extends to i when the preceding
            # byte also matches (recovers candidates the capped chain search
            # misses, same effect as the reference's backward extension)
            if (
                i + 1 < n
                and bl[i + 1] > 0
                and bo[i + 1] <= p
                and buf[p] == buf[p - bo[i + 1]]
                and bl[i + 1] + 1 > mlen
            ):
                ext = min(bl[i + 1] + 1, match_limit - p)
                if ext > mlen:
                    mlen, moff = ext, bo[i + 1]
            bl[i], bo[i] = mlen, moff
            if mlen >= MIN_MATCH:
                lens = {mlen}
                if mlen > 18:
                    lens.add(18)  # match-length nibble boundary (ml=14)
                for L in lens:
                    # token(1) + offset(2) + ml VLE
                    c = 3.0
                    ml = L - MIN_MATCH
                    if ml >= 15:
                        c += 1 + (ml - 15) // 255
                    c += cost[i + L]
                    if c < best:
                        best = c
                        best_choice = (L, moff)
        cost[i] = best
        choice[i] = best_choice
    out = bytearray()
    i = 0
    anchor = 0
    while i < n:
        ch = choice[i]
        if ch is None:
            i += 1
            continue
        L, off = ch
        _emit(out, buf, d + anchor, i - anchor, off, L)
        i += L
        anchor = i
    _emit(out, buf, d + anchor, n - anchor, 0, 0)
    return bytes(out)
