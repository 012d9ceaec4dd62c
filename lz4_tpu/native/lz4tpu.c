/* lz4tpu.c — clean-room host-side LZ4 block codec + xxHash32.
 *
 * The TPU framework's native runtime component: the host codec handles the
 * paths where a TPU round-trip is not worth it (small blocks, sequential
 * chained-frame tails, checksums), mirroring the role of the reference's
 * managed engine (reference Engine/x64/LL64.*.cs) without being a port of
 * it.  Implemented from the public LZ4 block format specification
 * (lz4_Block_format.md) and the xxHash32 specification.
 *
 * Exported ABI (all lengths in bytes, all return codes: >=0 length,
 * <0 error):
 *   int64 lz4tpu_decode(src, src_len, dict, dict_len, out, out_cap, target)
 *       target < 0: decode everything; target >= 0: stop once target bytes
 *       are produced (partial decode).
 *   int64 lz4tpu_encode_fast(buf, buf_len, src_off, out, out_cap, accel)
 *       buf = [dict | src]; src starts at src_off; greedy hash-table match
 *       finder with skip acceleration.
 *   int64 lz4tpu_encode_hc(buf, buf_len, src_off, out, out_cap, level)
 *       hash-chain search with lazy parsing, depth from the level ladder.
 *   uint32 lz4tpu_xxh32(ptr, len, seed)
 *   void   lz4tpu_xxh32_stripes(state[4], ptr, n_stripes)  (streaming body)
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>

#define MINMATCH 4
#define MFLIMIT 12
#define LASTLITERALS 5
#define MAXDIST 65535

#define ERR_MALFORMED (-1)
#define ERR_OUTPUT_OVERFLOW (-2)
#define ERR_INPUT_OVERRUN (-3)

static inline uint32_t read32(const uint8_t *p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v; /* little-endian hosts only (x86-64 / arm64) */
}

static inline void write16(uint8_t *p, uint16_t v) { memcpy(p, &v, 2); }

static inline uint16_t read16le(const uint8_t *p) {
    uint16_t v;
    memcpy(&v, p, 2);
    return v;
}

/* ---------------------------------------------------------------- decode */

/* Overlap-safe match copy for short distances (dist < 8).  Every copy
 * below is a FIXED size — a variable-size memcpy at these 2..50-byte
 * lengths compiles to a dispatching library call that dominates the copy
 * itself.  Distances whose period divides 8 replicate the pattern into a
 * register with a multiply and store it in 16-byte strides; 3/5/6/7 take
 * a bytewise 4-byte head, one 4-byte copy from `step4` bytes back, then
 * 8-byte strides from `step8` bytes back — step4/step8 are the smallest
 * multiples of the distance >= 4 and >= 8, so each copy reads bytes
 * already in place (no intra-copy overlap) at the same period phase.
 * May write up to 15 bytes past dst+len (both call sites sit in the fast
 * loop, whose 64-byte output margin covers it). */
static inline void overlap_copy(uint8_t *dst, int64_t dist, int64_t len) {
    uint64_t v;
    switch (dist) {
    case 1:
        v = (uint64_t)dst[-1] * 0x0101010101010101ULL;
        break;
    case 2: {
        uint16_t h;
        memcpy(&h, dst - 2, 2);
        v = (uint64_t)h * 0x0001000100010001ULL;
        break;
    }
    case 4: {
        uint32_t w;
        memcpy(&w, dst - 4, 4);
        v = (uint64_t)w * 0x0000000100000001ULL;
        break;
    }
    default: {
        static const int8_t step4[8] = {0, 0, 0, 6, 0, 5, 6, 7};
        static const int8_t step8[8] = {0, 0, 0, 9, 0, 10, 12, 14};
        dst[0] = dst[-dist];
        dst[1] = dst[1 - dist];
        dst[2] = dst[2 - dist];
        dst[3] = dst[3 - dist];
        memcpy(dst + 4, dst + 4 - step4[dist], 4);
        int64_t s8 = step8[dist];
        int64_t pos = 8;
        while (pos < len) {
            memcpy(dst + pos, dst + pos - s8, 8);
            pos += 8;
        }
        return;
    }
    }
    int64_t pos = 0;
    do {
        memcpy(dst + pos, &v, 8);
        memcpy(dst + pos + 8, &v, 8);
        pos += 16;
    } while (pos < len);
}

int64_t lz4tpu_decode(
    const uint8_t *src, int64_t src_len,
    const uint8_t *dict, int64_t dict_len,
    uint8_t *out, int64_t out_cap,
    int64_t target)
{
    const uint8_t *ip = src, *iend = src + src_len;
    uint8_t *op = out, *oend = out + out_cap;
    if (src_len <= 0) return ERR_MALFORMED;

    /* ---- fast loop: wide unguarded copies while both margins hold ----
     * Margins: >= 16 input bytes (token + VLE + 16B literal overrun) and
     * >= 64 output bytes (literal + match wildcopy overrun).  Anything
     * that cannot be proven safe rewinds to the sequence start and falls
     * through to the byte-exact guarded loop below.  Partial decode
     * (target >= 0) skips the fast loop: it needs per-byte accounting. */
    if (target < 0) {
        const uint8_t *ifast = iend - 16;
        uint8_t *ofast = oend - 64;
        /* contiguous 64 KB window (chained frames decoded in place): match
         * sources may reach dict_len bytes BELOW out — same memory, so the
         * wide-copy paths handle them like any other match */
        const uint8_t *low =
            (dict_len > 0 && dict + dict_len == out) ? out - dict_len : out;
        while (ip < ifast && op < ofast) {
            const uint8_t *ip_seq = ip;
            uint8_t *op_seq = op;
            uint32_t token = *ip++;
            int64_t lit = token >> 4;
            if (__builtin_expect((token & 15) != 15 && lit != 15, 1)) {
                /* shortcut: <=14 literals + 4..18-byte match resolve with
                 * two wide copies and a single compound branch.  Input
                 * reads stay in bounds: ip_seq <= iend-17 covers
                 * token + 14 literals + 2 offset bytes. */
                memcpy(op, ip, 16);
                op += lit; ip += lit;
                uint32_t offset = read16le(ip);
                ip += 2;
                int64_t mlen = (token & 15) + MINMATCH;
                const uint8_t *mp = op - offset;
                /* one branch covers every offset >= 8 (the 8+8+2 copy is
                 * overlap-safe there: each memcpy reads bytes already in
                 * place before it writes) */
                if (__builtin_expect(offset >= 8 && mp >= low, 1)) {
                    memcpy(op, mp, 8);
                    memcpy(op + 8, mp + 8, 8);
                    memcpy(op + 16, mp + 16, 2);
                    op += mlen;
                    continue;
                }
                if (offset == 0) return ERR_MALFORMED;
                if (mp < low) goto fast_bail;  /* dict ref: guarded loop */
                overlap_copy(op, offset, mlen);
                op += mlen;
                continue;
            }
            if (lit == 15) {
                uint32_t b;
                do {
                    if (ip >= ifast) goto fast_bail;
                    b = *ip++;
                    lit += b;
                } while (b == 255);
                if (lit > (ifast - ip) - 16 || lit > (ofast - op))
                    goto fast_bail;
                /* long literal run: 32B strides.  Output overrun (<= 31B
                 * past op+lit) is covered by the 64B margin; input reads
                 * stay < ip+lit+32 <= iend (the extra -16 above). */
                {
                    uint8_t *d = op;
                    const uint8_t *s = ip;
                    int64_t k = 0;
                    do {
                        memcpy(d + k, s + k, 16);
                        memcpy(d + k + 16, s + k + 16, 16);
                        k += 32;
                    } while (k < lit);
                }
            } else {
                memcpy(op, ip, 16);  /* lit <= 14: one wide copy */
            }
            ip += lit; op += lit;
            if (ip >= ifast) { ip = ip_seq; op = op_seq; break; }

            /* match */
            uint32_t offset = read16le(ip);
            ip += 2;
            int64_t mlen = (token & 15) + MINMATCH;
            if ((token & 15) == 15) {
                uint32_t b;
                do {
                    if (ip >= iend) goto fast_bail;
                    b = *ip++;
                    mlen += b;
                } while (b == 255);
            }
            if (offset == 0) return ERR_MALFORMED;
            const uint8_t *mp = op - offset;
            if (mp < low || mlen > (ofast - op) + 32) goto fast_bail;
            if (offset >= 16) {
                /* fixed 18B head (covers the overwhelmingly common short
                 * match with zero loop overhead), then wide strides for
                 * the tail; 32B strides need offset >= 32 so their reads
                 * stay behind the bytes they write */
                memcpy(op, mp, 16);
                memcpy(op + 16, mp + 16, 2);
                if (mlen > 18) {
                    int64_t k = 18;
                    if (offset >= 32) {
                        do {
                            memcpy(op + k, mp + k, 16);
                            memcpy(op + k + 16, mp + k + 16, 16);
                            k += 32;
                        } while (k < mlen);
                    } else {
                        do {
                            memcpy(op + k, mp + k, 16);
                            k += 16;
                        } while (k < mlen);
                    }
                }
            } else if (offset >= 8) {
                int64_t k = 0;
                do {
                    memcpy(op + k, mp + k, 8);
                    k += 8;
                } while (k < mlen);
            } else {
                overlap_copy(op, offset, mlen);
            }
            op += mlen;
            continue;
fast_bail:
            ip = ip_seq;
            op = op_seq;
            break;
        }
    }

    for (;;) {
        if (ip >= iend) return ERR_MALFORMED;
        uint32_t token = *ip++;
        /* literal run */
        int64_t lit = token >> 4;
        if (lit == 15) {
            uint32_t b;
            do {
                if (ip >= iend) return ERR_MALFORMED;
                b = *ip++;
                lit += b;
            } while (b == 255);
        }
        if (ip + lit > iend) return ERR_INPUT_OVERRUN;
        if (op + lit > oend) {
            if (target >= 0 && (op - out) + lit >= target) {
                memcpy(op, ip, (size_t)(target - (op - out)));
                return target;
            }
            return ERR_OUTPUT_OVERFLOW;
        }
        memcpy(op, ip, (size_t)lit);
        ip += lit; op += lit;
        if (target >= 0 && (op - out) >= target) return target;
        if (ip == iend) break; /* final literals-only sequence */

        /* match */
        if (ip + 2 > iend) return ERR_MALFORMED;
        uint32_t offset = ip[0] | ((uint32_t)ip[1] << 8);
        ip += 2;
        if (offset == 0) return ERR_MALFORMED;
        int64_t mlen = (token & 15) + MINMATCH;
        if ((token & 15) == 15) {
            uint32_t b;
            do {
                if (ip >= iend) return ERR_MALFORMED;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        int64_t pos = (op - out) - (int64_t)offset;
        if (pos < -dict_len) return ERR_MALFORMED;
        int64_t room = oend - op;
        int64_t copy = mlen;
        int clamp = 0;
        if (copy > room) {
            if (target < 0) return ERR_OUTPUT_OVERFLOW;
            copy = room; clamp = 1;
        }
        if (pos < 0) {
            /* leading part from dictionary */
            int64_t from_dict = -pos;
            if (from_dict > copy) from_dict = copy;
            memcpy(op, dict + dict_len + pos, (size_t)from_dict);
            op += from_dict; copy -= from_dict; pos += from_dict;
        }
        if (copy > 0) {
            const uint8_t *mp = out + pos;
            if (offset >= 8) {
                uint8_t *dst = op;
                const uint8_t *s = mp;
                int64_t k = copy;
                while (k >= 8) { memcpy(dst, s, 8); dst += 8; s += 8; k -= 8; }
                while (k--) *dst++ = *s++;
            } else {
                for (int64_t k = 0; k < copy; k++) op[k] = mp[k];
            }
            op += copy;
        }
        if (clamp || (target >= 0 && (op - out) >= target)) {
            int64_t made = op - out;
            return target >= 0 && made > target ? target : made;
        }
    }
    return op - out;
}

/* ------------------------------------------------------- shared emitter */

static inline int64_t emit_sequence(
    uint8_t **opp, uint8_t *oend,
    const uint8_t *lit, int64_t lit_len,
    uint32_t offset, int64_t mlen /* 0 = final literals */)
{
    uint8_t *op = *opp;
    int64_t ml = mlen ? mlen - MINMATCH : 0;
    int64_t need = 1 + lit_len + (lit_len >= 15 ? 1 + (lit_len - 15) / 255 : 0)
                 + (mlen ? 2 + (ml >= 15 ? 1 + (ml - 15) / 255 : 0) : 0);
    if (op + need > oend) return ERR_OUTPUT_OVERFLOW;
    uint8_t t_ll = lit_len >= 15 ? 15 : (uint8_t)lit_len;
    uint8_t t_ml = ml >= 15 ? 15 : (uint8_t)ml;
    *op++ = (uint8_t)((t_ll << 4) | (mlen ? t_ml : 0));
    if (lit_len >= 15) {
        int64_t v = lit_len - 15;
        while (v >= 255) { *op++ = 255; v -= 255; }
        *op++ = (uint8_t)v;
    }
    if (mlen && op + ((lit_len + 7) & ~(int64_t)7) <= oend) {
        /* wildcopy: 8B strides, output overshoot < 8 (bounds-checked),
         * source overshoot < 8 stays inside the buffer because
         * lit + lit_len == ip <= mflimit for in-loop sequences */
        for (int64_t k = 0; k < lit_len; k += 8) memcpy(op + k, lit + k, 8);
    } else {
        int64_t k = 0, wide = lit_len & ~(int64_t)15;
        for (; k < wide; k += 16) memcpy(op + k, lit + k, 16);
        memcpy(op + k, lit + k, (size_t)(lit_len - k));
    }
    op += lit_len;
    if (mlen) {
        write16(op, (uint16_t)offset);
        op += 2;
        if (ml >= 15) {
            int64_t v = ml - 15;
            while (v >= 255) { *op++ = 255; v -= 255; }
            *op++ = (uint8_t)v;
        }
    }
    *opp = op;
    return 0;
}

static inline int64_t run_length(
    const uint8_t *a, const uint8_t *b, const uint8_t *limit)
{
    const uint8_t *b0 = b;
    while (b + 8 <= limit) {
        uint64_t xa, xb;
        memcpy(&xa, a, 8);
        memcpy(&xb, b, 8);
        uint64_t x = xa ^ xb;
        if (x) return (b - b0) + (__builtin_ctzll(x) >> 3);
        a += 8; b += 8;
    }
    while (b < limit && *a == *b) { a++; b++; }
    return b - b0;
}

/* --------------------------------------------------------- fast encoder */

#define FAST_HASH_LOG 15
#define SKIP_TRIGGER 6

static inline uint32_t hash4(uint32_t v) {
    return (v * 2654435761u) >> (32 - FAST_HASH_LOG);
}

int64_t lz4tpu_encode_fast(
    const uint8_t *buf, int64_t buf_len, int64_t src_off,
    uint8_t *out, int64_t out_cap, int32_t accel)
{
    int64_t n = buf_len - src_off;
    uint8_t *op = out, *oend = out + out_cap;
    if (n <= 0) {
        if (out_cap < 1) return ERR_OUTPUT_OVERFLOW;
        *op++ = 0;
        return 1;
    }
    if (accel < 1) accel = 1;

    const uint8_t *base = buf;
    const uint8_t *src_end = buf + buf_len;
    const uint8_t *mflimit = src_end - MFLIMIT;
    const uint8_t *match_limit = src_end - LASTLITERALS;
    const uint8_t *anchor = buf + src_off;
    const uint8_t *p = anchor;

    /* Positions fit u16 for <=64KB buffers (every stored position is
     * <= buf_len-7, stored as pos+1 with 0 = empty): half the cache
     * footprint of the i32 table and a memset-able init.  The candidate
     * schedule is unchanged, so output stays byte-identical. */
    int use16 = buf_len <= 65540 && src_off <= 65536;
    /* (src_off > 64 KB never happens from our callers — windows cap
     * at the format's 65535 distance — but a u16 slot must never
     * wrap: pos+1 <= 65535 needs src_off-4+1 and buf_len-6 in range) */
    void *table_mem = malloc((size_t)(use16 ? 2 : 4) << FAST_HASH_LOG);
    if (!table_mem) return ERR_MALFORMED;
    uint16_t *t16 = (uint16_t *)table_mem;
    int32_t *t32 = (int32_t *)table_mem;
    if (use16) {
        memset(t16, 0, (size_t)2 << FAST_HASH_LOG);
        for (int64_t i = 0; i + MINMATCH <= src_off; i += 2)
            t16[hash4(read32(base + i))] = (uint16_t)(i + 1);
    } else {
        memset(t32, 0xFF, (size_t)4 << FAST_HASH_LOG);
        for (int64_t i = 0; i + MINMATCH <= src_off; i += 2)
            t32[hash4(read32(base + i))] = (int32_t)i;
    }

    if (n > MFLIMIT) {
/* scan instantiated twice with U16 a compile-time constant, so the
 * table-mode ternaries vanish from the hot loop (same treatment as
 * CANON_SCAN below) */
#define DENSE_SCAN(U16) do { \
        int64_t search = (int64_t)accel << SKIP_TRIGGER; \
        while (p < mflimit) { \
            uint32_t w = read32(p); \
            uint32_t h = hash4(w); \
            int64_t cand = (U16) ? (int64_t)t16[h] - 1 : (int64_t)t32[h]; \
            if (U16) t16[h] = (uint16_t)(p - base + 1); \
            else t32[h] = (int32_t)(p - base); \
            if (cand >= 0 && (p - base) - cand <= MAXDIST \
                && read32(base + cand) == w) { \
                const uint8_t *m = base + cand; \
                /* extend backwards */ \
                while (p > anchor && m > base && p[-1] == m[-1]) { \
                    p--; m--; \
                } \
                int64_t mlen = MINMATCH + run_length( \
                    m + MINMATCH, p + MINMATCH, match_limit); \
                int64_t rc = emit_sequence( \
                    &op, oend, anchor, p - anchor, \
                    (uint32_t)(p - m), mlen); \
                if (rc < 0) { free(table_mem); return rc; } \
                p += mlen; \
                anchor = p; \
                if (p >= mflimit) break; \
                if (U16) \
                    t16[hash4(read32(p - 2))] = \
                        (uint16_t)(p - 2 - base + 1); \
                else \
                    t32[hash4(read32(p - 2))] = (int32_t)(p - 2 - base); \
                search = (int64_t)accel << SKIP_TRIGGER; \
                continue; \
            } \
            p += (search++ >> SKIP_TRIGGER); \
        } \
    } while (0)
        if (use16) DENSE_SCAN(1);
        else DENSE_SCAN(0);
#undef DENSE_SCAN
    }
    int64_t rc = emit_sequence(&op, oend, anchor, src_end - anchor, 0, 0);
    free(table_mem);
    if (rc < 0) return rc;
    return op - out;
}

/* --------------------------------------- canonical-schedule fast encoder
 *
 * Byte-parity FAST path: reproduces upstream lz4 1.9.x's exact candidate
 * schedule for one-shot no-dictionary compression, so output is byte-
 * identical to LZ4_compress_default (and therefore to the reference port,
 * `x64/LL64.fast.cs:35-513`, whose Fast64 Silesia golden sizes it
 * inherits).  Byte-identity mathematically requires the same decision
 * sequence: table geometry (13-bit u16 table for < 64 KB + 11 inputs,
 * 12-bit u32 table + 5-byte hash above), probe/insert order (insert first
 * byte, probe from byte 1 with the hash computed one probe ahead), the
 * skip ramp's exact phase (step lags searchMatchNb by one), the ip-2
 * refill, and the zero-literal immediate retry without back-extension.
 * The structure below is our own; the schedule is the format's.
 * (gated byte-identical to canonical liblz4 by tests/test_liblz4_interop.py
 * and the real-bytes suite).
 */

#define CANON_HASHLOG_U16 13   /* LZ4_HASHLOG + 1 */
#define CANON_HASHLOG_U32 12   /* LZ4_HASHLOG */
#define CANON_64K_LIMIT (65536 + MFLIMIT - 1)
#define CANON_ACCEL_MAX 65537

static inline uint32_t chash_u16(uint32_t v) {
    return (v * 2654435761u) >> (32 - CANON_HASHLOG_U16);
}

static inline uint32_t chash_u32(const uint8_t *p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return (uint32_t)(((v << 24) * 889523592379ULL)
                      >> (64 - CANON_HASHLOG_U32));
}

int64_t lz4tpu_encode_fast_canonical(
    const uint8_t *src, int64_t n,
    uint8_t *out, int64_t out_cap, int32_t accel)
{
    uint8_t *op = out, *oend = out + out_cap;
    if (n <= 0) {
        if (out_cap < 1) return ERR_OUTPUT_OVERFLOW;
        *op++ = 0;
        return 1;
    }
    if (accel < 1) accel = 1;
    if (accel > CANON_ACCEL_MAX) accel = CANON_ACCEL_MAX;

    const uint8_t *base = src;
    const uint8_t *iend = src + n;
    const uint8_t *mflimit1 = iend - MFLIMIT + 1;
    const uint8_t *matchlimit = iend - LASTLITERALS;
    const uint8_t *anchor = src;
    const uint8_t *ip = src;
    int u16mode = n < CANON_64K_LIMIT;

    /* empty slot == position 0 (upstream's convention: the first-byte
     * insert makes slot 0 legitimate; false positives at position 0 are
     * resolved by the 4-byte compare) */
    uint16_t t16[1 << CANON_HASHLOG_U16];
    uint32_t t32[1 << CANON_HASHLOG_U32];
    if (u16mode) memset(t16, 0, sizeof(t16));
    else memset(t32, 0, sizeof(t32));

#define CH(P, U16) ((U16) ? chash_u16(read32(P)) : chash_u32(P))
#define CGET(H, U16) ((U16) ? (int64_t)t16[H] : (int64_t)t32[H])
#define CPUT(H, POS, U16) do { \
        if (U16) t16[H] = (uint16_t)(POS); \
        else t32[H] = (uint32_t)(POS); \
    } while (0)

    if (n < MFLIMIT + 1) goto last_literals;  /* LZ4_minLength */

/* the whole scan instantiated twice with U16 a compile-time constant, so
 * the table-mode ternaries vanish from the hot loop */
#define CANON_SCAN(U16) do { \
    CPUT(CH(ip, U16), 0, U16); \
    ip++; \
    uint32_t fh = CH(ip, U16); \
    for (;;) { \
        const uint8_t *match; \
        { \
            const uint8_t *fwd = ip; \
            int64_t step = 1; \
            int64_t ramp = (int64_t)accel << SKIP_TRIGGER; \
            for (;;) { \
                uint32_t h = fh; \
                ip = fwd; \
                int64_t cur = ip - base; \
                fwd += step; \
                step = (ramp++ >> SKIP_TRIGGER); \
                if (__builtin_expect(fwd > mflimit1, 0)) goto last_literals; \
                int64_t mi = CGET(h, U16); \
                match = base + mi; \
                fh = CH(fwd, U16); \
                CPUT(h, cur, U16); \
                if (!(U16) && mi + MAXDIST < cur) continue; \
                if (read32(match) == read32(ip)) break; \
            } \
        } \
        while (ip > anchor && match > base && ip[-1] == match[-1]) { \
            ip--; \
            match--; \
        } \
        for (;;) { \
            int64_t mlen = MINMATCH + run_length( \
                match + MINMATCH, ip + MINMATCH, matchlimit); \
            int64_t rc = emit_sequence( \
                &op, oend, anchor, ip - anchor, \
                (uint32_t)(ip - match), mlen); \
            if (__builtin_expect(rc < 0, 0)) return rc; \
            ip += mlen; \
            anchor = ip; \
            if (ip >= mflimit1) goto last_literals; \
            CPUT(CH(ip - 2, U16), ip - 2 - base, U16); \
            uint32_t h2 = CH(ip, U16); \
            int64_t cur2 = ip - base; \
            int64_t mi2 = CGET(h2, U16); \
            const uint8_t *m2 = base + mi2; \
            CPUT(h2, cur2, U16); \
            if (((U16) || mi2 + MAXDIST >= cur2) \
                && read32(m2) == read32(ip)) { \
                match = m2; \
                continue; \
            } \
            break; \
        } \
        ip++; \
        fh = CH(ip, U16); \
    } \
} while (0)

    if (u16mode) CANON_SCAN(1);
    else CANON_SCAN(0);
#undef CANON_SCAN

last_literals:
    {
        int64_t rc = emit_sequence(&op, oend, anchor, iend - anchor, 0, 0);
        if (rc < 0) return rc;
    }
    return op - out;
#undef CH
#undef CGET
#undef CPUT  /* (parameterized variants) */
}

/* ----------------------- canonical-schedule chained (continue) encoder
 *
 * Byte-parity with upstream LZ4_compress_fast_continue for the linked-
 * block frame layout: blocks are consecutive slices of ONE contiguous
 * buffer, so the stream state reduces to the persistent byU32 hash table
 * (absolute positions; caller zeroes it before the first block).  The
 * upstream bookkeeping collapses in this mode: currentOffset == block_off
 * (contiguous from zero), the prefix dictSize accumulates to
 * min(block_off, 64 KB) which makes the dictSmall rejection vacuous.
 * Positions are absolute u32 buffer offsets with NO renormalization, so
 * callers bound one-shot frames below ~2 GiB (enforced in the python
 * wrapper; upstream renorms at the same threshold).  Schedule per block is LZ4_compress_generic(byU32,
 * withPrefix64k): 5-byte hash, first-byte insert then probe from byte 1,
 * distance-capped candidates, back-extension limited to the 64 KB window
 * floor.  (Reference port anchor: `x64/LL64.fast.cs:582-667`
 * LZ4_compress_fast_continue; gated byte-identical to canonical liblz4
 * by tests/test_liblz4_interop.py.)
 */

int64_t lz4tpu_encode_fast_continue(
    const uint8_t *buf, int64_t block_off, int64_t block_len,
    uint8_t *out, int64_t out_cap, int32_t accel,
    uint32_t *table /* 1 << CANON_HASHLOG_U32 entries */)
{
    uint8_t *op = out, *oend = out + out_cap;
    if (block_len <= 0) {
        if (out_cap < 1) return ERR_OUTPUT_OVERFLOW;
        *op++ = 0;
        return 1;
    }
    if (accel < 1) accel = 1;
    if (accel > CANON_ACCEL_MAX) accel = CANON_ACCEL_MAX;

    const uint8_t *base = buf;
    const uint8_t *src = buf + block_off;
    const uint8_t *iend = src + block_len;
    const uint8_t *mflimit1 = iend - MFLIMIT + 1;
    const uint8_t *matchlimit = iend - LASTLITERALS;
    const uint8_t *anchor = src;
    const uint8_t *ip = src;
    /* prefix window floor: dictSize accumulates to min(block_off, 64 KB) */
    int64_t dict_size = block_off < 65536 ? block_off : 65536;
    const uint8_t *low_limit = src - dict_size;

    if (block_len < MFLIMIT + 1) goto last_literals;

    table[chash_u32(ip)] = (uint32_t)(ip - base);
    ip++;
    uint32_t fh = chash_u32(ip);

    for (;;) {
        const uint8_t *match;
        {
            const uint8_t *fwd = ip;
            int64_t step = 1;
            int64_t ramp = (int64_t)accel << SKIP_TRIGGER;
            for (;;) {
                uint32_t h = fh;
                ip = fwd;
                int64_t cur = ip - base;
                fwd += step;
                step = (ramp++ >> SKIP_TRIGGER);
                if (fwd > mflimit1) goto last_literals;
                int64_t mi = (int64_t)table[h];
                match = base + mi;
                fh = chash_u32(fwd);
                table[h] = (uint32_t)cur;
                if (mi + MAXDIST < cur) continue;
                if (read32(match) == read32(ip)) break;
            }
        }
        while (ip > anchor && match > low_limit && ip[-1] == match[-1]) {
            ip--;
            match--;
        }
        for (;;) {
            int64_t mlen = MINMATCH + run_length(
                match + MINMATCH, ip + MINMATCH, matchlimit);
            int64_t rc = emit_sequence(
                &op, oend, anchor, ip - anchor,
                (uint32_t)(ip - match), mlen);
            if (rc < 0) return rc;
            ip += mlen;
            anchor = ip;
            if (ip >= mflimit1) goto last_literals;
            table[chash_u32(ip - 2)] = (uint32_t)(ip - 2 - base);
            uint32_t h2 = chash_u32(ip);
            int64_t cur2 = ip - base;
            int64_t mi2 = (int64_t)table[h2];
            const uint8_t *m2 = base + mi2;
            table[h2] = (uint32_t)cur2;
            if (mi2 + MAXDIST >= cur2 && read32(m2) == read32(ip)) {
                match = m2;
                continue;
            }
            break;
        }
        ip++;
        fh = chash_u32(ip);
    }

last_literals:
    {
        int64_t rc = emit_sequence(&op, oend, anchor, iend - anchor, 0, 0);
        if (rc < 0) return rc;
    }
    return op - out;
}

/* ----------------------------------------------------------- HC encoder
 *
 * Reference-fidelity hash-chain engine: u16-delta chain ring, wider-match
 * search with backward extension, repeated-pattern acceleration, chain-swap,
 * the 3-candidate (ML1/ML2/ML3) speculative lookahead parse, and the exact
 * price-model optimal parse for L10-L12.  Capability match for
 * `x64/LL64.high.cs:71-383` (search), `:513-800` (lookahead parse),
 * `:803-1122` (optimal parse) — re-implemented from the algorithm, not the
 * code.  The dictionary is a flat prefix of `buf` (no ext-dict split). */

#define HC_HASH_LOG 15
#define OPTIMAL_ML 18          /* (ML_MASK-1) + MINMATCH */
#define OPT_NUM 4096           /* optimal-parse window */
#define CHAIN_RING 65536

typedef struct {
    int32_t *head;       /* hash -> most recent absolute position (-1 none) */
    uint16_t *delta;     /* pos & 0xFFFF -> distance to previous same-hash */
    const uint8_t *base;
    int64_t inserted;    /* positions [0, inserted) are in the tables */
    int64_t max_insert;  /* read32 must stay in bounds */
} chain_t;

static int chain_init(chain_t *c, const uint8_t *base, int64_t buf_len) {
    c->head = (int32_t *)malloc(sizeof(int32_t) << HC_HASH_LOG);
    c->delta = (uint16_t *)malloc(sizeof(uint16_t) * CHAIN_RING);
    c->base = base;
    c->inserted = 0;
    c->max_insert = buf_len - MINMATCH + 1 > 0 ? buf_len - MINMATCH + 1 : 0;
    if (!c->head || !c->delta) { free(c->head); free(c->delta); return 0; }
    /* empty = -65536: any i - head[h] then exceeds 0xFFFF, so the insert
     * clamp alone marks the chain end (no sign check per position), and a
     * fresh head lookup yields cand < 0 < lowest (no candidate) */
    for (int64_t i = 0; i < (1 << HC_HASH_LOG); i++) c->head[i] = -65536;
    memset(c->delta, 0xFF, sizeof(uint16_t) * CHAIN_RING);
    return 1;
}

static void chain_free(chain_t *c) { free(c->head); free(c->delta); }

static void chain_insert(chain_t *c, int64_t upto) {
    if (upto > c->max_insert) upto = c->max_insert;
    for (int64_t i = c->inserted; i < upto; i++) {
        uint32_t h = hash4(read32(c->base + i));
        int64_t d = i - c->head[h];  /* empty head = -65536 -> d > 0xFFFF */
        c->delta[i & 0xFFFF] = d > 0xFFFF ? 0xFFFF : (uint16_t)d;
        c->head[h] = (int32_t)i;
    }
    if (upto > c->inserted) c->inserted = upto;
}

/* bytes both ip and match can extend backward (<= 0), floors i_min / base */
static inline int64_t count_back(
    const uint8_t *ip, const uint8_t *match,
    const uint8_t *i_min, const uint8_t *m_min)
{
    int64_t back = 0;
    int64_t floor = i_min - ip;
    if (m_min - match > floor) floor = m_min - match;
    while (back > floor && ip[back - 1] == match[back - 1]) back--;
    return back;
}

/* forward length over which bytes repeat the little-endian 4-byte pattern */
static int64_t count_pattern(
    const uint8_t *p, const uint8_t *end, uint32_t pattern)
{
    const uint8_t *start = p;
    uint64_t pat8 = (uint64_t)pattern | ((uint64_t)pattern << 32);
    while (p + 8 <= end) {
        uint64_t v;
        memcpy(&v, p, 8);
        uint64_t x = v ^ pat8;
        if (x) return (p - start) + (__builtin_ctzll(x) >> 3);
        p += 8;
    }
    uint32_t rolling = pattern;
    while (p < end && *p == (uint8_t)rolling) {
        p++;
        rolling = (rolling >> 8) | (rolling << 24);
    }
    return p - start;
}

/* backward pattern run length (pattern scanned from its last byte) */
static int64_t count_back_pattern(
    const uint8_t *p, const uint8_t *low, uint32_t pattern)
{
    const uint8_t *start = p;
    while (p > low && p[-1] == (uint8_t)(pattern >> 24)) {
        p--;
        pattern = (pattern << 8) | (pattern >> 24);
    }
    return start - p;
}

/* Widest match at `ip` whose start may slide back to `ilow`.  On success
 * (return > longest_in) sets *m_start (>= ilow) and *m_pos (match source for
 * *m_start).  Mirrors the reference search semantics: would-extend peek2
 * quick reject, strict improvement, repeated-pattern chain acceleration
 * (pattern_analysis), better-chain selection inside the current best match
 * (chain_swap). */
static __attribute__((always_inline)) inline int64_t hc_wider_match(
    chain_t *c, const uint8_t *ip, const uint8_t *ilow, const uint8_t *ihigh,
    int64_t longest, const uint8_t **m_start, const uint8_t **m_pos,
    int32_t max_attempts, int pattern_analysis, int chain_swap)
{
    const uint8_t *base = c->base;
    int64_t pos = ip - base;
    int64_t lowest = pos > MAXDIST ? pos - MAXDIST : 0;
    int64_t lookback = ip - ilow;
    int32_t attempts = max_attempts;
    uint32_t pattern = read32(ip);
    int64_t chain_off = 0;       /* chain-swap: follow chain from inside match */
    int repeat_tested = 0, repeat_confirmed = 0;
    int64_t src_pat_len = 0;
    /* Best-so-far kept in LOCALS and written through the output pointers
     * once on exit: in-loop `*m_start` stores are char-typed and would
     * force the compiler to reload every cached byte read (the
     * quick-reject halfword below) on each attempt. */
    const uint8_t *best_s = *m_start, *best_p = *m_pos;
    /* the two bytes a wider match must reproduce; refreshed on improvement */
    uint16_t want = read16le(ilow + longest - 1);

    chain_insert(c, pos);
    int64_t cand = c->head[hash4(pattern)];
    while (cand >= pos) {  /* ignore self/ahead entries from lookahead probes */
        uint16_t d = c->delta[cand & 0xFFFF];
        if (d > cand) { cand = -1; break; }
        cand -= d;
    }

    while (cand >= lowest && attempts > 0) {
        int64_t match_len = 0;
        attempts--;
        const uint8_t *mp = base + cand;
        /* quick reject: the two bytes that would extend the best must match */
        if (__builtin_expect(
                want == read16le(mp - lookback + longest - 1)
                && read32(mp) == pattern, 0)) {
            int64_t back = lookback ? count_back(ip, mp, ilow, base) : 0;
            match_len = MINMATCH
                + run_length(mp + MINMATCH, ip + MINMATCH, ihigh) - back;
            if (match_len > longest) {
                longest = match_len;
                best_p = mp + back;
                best_s = ip + back;
                want = read16le(ilow + longest - 1);
            }
        }

        if (chain_swap && match_len == longest && cand + longest <= pos) {
            /* this candidate is the current best: pick the entry inside it
             * whose chain jumps farthest back, and follow that chain */
            int64_t best_jump = 1, end = longest - MINMATCH + 1;
            int64_t step = 1, accel = 1 << 4;
            chain_off = 0;
            for (int64_t q = 0; q < end; q += step) {
                uint16_t d = c->delta[(cand + q) & 0xFFFF];
                step = (accel++ >> 4);
                if (d > best_jump) {
                    best_jump = d;
                    chain_off = q;
                    accel = 1 << 4;
                }
            }
            if (best_jump > 1) {
                if (best_jump > cand) break;
                cand -= best_jump;
                continue;
            }
        }

        {
            uint16_t next_d = c->delta[cand & 0xFFFF];
            if (pattern_analysis && next_d == 1 && chain_off == 0) {
                /* candidate sits in a run of a repeated 4-byte pattern:
                 * jump straight to the best-aligned position of the run */
                int64_t cand2 = cand - 1;
                if (!repeat_tested) {
                    repeat_tested = 1;
                    repeat_confirmed =
                        (pattern & 0xFFFF) == (pattern >> 16)
                        && (pattern & 0xFF) == (pattern >> 24);
                    if (repeat_confirmed)
                        src_pat_len =
                            count_pattern(ip + 4, ihigh, pattern) + 4;
                }
                if (repeat_confirmed && cand2 >= lowest
                    && read32(base + cand2) == pattern) {
                    int64_t fwd =
                        count_pattern(base + cand2 + 4, ihigh, pattern) + 4;
                    int64_t backp =
                        count_back_pattern(base + cand2, base, pattern);
                    if (backp > cand2 - lowest) backp = cand2 - lowest;
                    int64_t seg = backp + fwd;
                    if (seg >= src_pat_len && fwd <= src_pat_len) {
                        /* run contains the source pattern: align to its end */
                        cand = cand2 + fwd - src_pat_len;
                    } else {
                        cand = cand2 - backp;  /* farthest run position */
                        if (lookback == 0) {
                            int64_t max_ml =
                                seg < src_pat_len ? seg : src_pat_len;
                            if (longest < max_ml) {
                                if (pos - cand > MAXDIST) break;
                                longest = max_ml;
                                best_p = base + cand;
                                best_s = ip;
                                want = read16le(ilow + longest - 1);
                            }
                            uint16_t d2 = c->delta[cand & 0xFFFF];
                            if (d2 > cand) break;
                            cand -= d2;
                        }
                    }
                    continue;
                }
            }
        }

        {
            uint16_t d = c->delta[(cand + chain_off) & 0xFFFF];
            if (d > cand) break;
            cand -= d;
        }
    }
    *m_start = best_s;
    *m_pos = best_p;
    return longest;
}

static const struct { int32_t strat; int32_t searches; int32_t target; }
hc_level_table[13] = {
    /* strat 0 = hashChain, 1 = optimal; mirrors clTable,
     * `x64/LL64.high.cs:1124-1138` */
    {0, 2, 16}, {0, 2, 16}, {0, 2, 16},
    {0, 4, 16}, {0, 8, 16}, {0, 16, 16}, {0, 32, 16},
    {0, 64, 16}, {0, 128, 16}, {0, 256, 16},
    {1, 96, 64}, {1, 512, 128}, {1, 16384, OPT_NUM},
};

int64_t lz4tpu_encode_hc(
    const uint8_t *buf, int64_t buf_len, int64_t src_off,
    uint8_t *out, int64_t out_cap, int32_t level)
{
    int64_t n = buf_len - src_off;
    uint8_t *op = out, *oend = out + out_cap;
    if (n <= 0) {
        if (out_cap < 1) return ERR_OUTPUT_OVERFLOW;
        *op++ = 0;
        return 1;
    }
    if (level < 3) level = 3;
    if (level > 9) level = 9;
    int32_t attempts = hc_level_table[level].searches;
    int pa = attempts > 128;  /* pattern analysis from L9 up */

    const uint8_t *base = buf;
    const uint8_t *src_end = buf + buf_len;
    const uint8_t *mflimit = src_end - MFLIMIT;
    const uint8_t *match_limit = src_end - LASTLITERALS;
    const uint8_t *anchor = buf + src_off;
    const uint8_t *ip = anchor;

    chain_t c;
    if (!chain_init(&c, base, buf_len)) return ERR_MALFORMED;
    chain_insert(&c, src_off);

    int64_t ml, ml0, ml2, ml3;
    const uint8_t *ref, *ref0, *ref2, *ref3;
    const uint8_t *start0, *start2, *start3;
    int64_t rc = 0;

    /* Three-candidate speculative lookahead: after finding ML1, probe for a
     * strictly longer ML2 overlapping it, then an ML3 beyond ML2, resolving
     * the overlaps with the OPTIMAL_ML truncation rules. */
    while (ip <= mflimit) {
        const uint8_t *mp = NULL, *ms = ip;
        ml = hc_wider_match(&c, ip, ip, match_limit, MINMATCH - 1,
                            &ms, &mp, attempts, pa, 0);
        if (ml < MINMATCH) { ip++; continue; }
        ref = mp;
        start0 = ip; ref0 = ref; ml0 = ml;

search2:
        if (ip + ml <= mflimit) {
            const uint8_t *s2 = ip + ml - 2, *p2 = NULL;
            start2 = s2;
            ml2 = hc_wider_match(&c, s2, ip, match_limit, ml,
                                 &start2, &p2, attempts, pa, 0);
            ref2 = p2;
        } else {
            ml2 = ml;
        }
        if (ml2 == ml) {  /* no better overlap: emit ML1 */
            rc = emit_sequence(&op, oend, anchor, ip - anchor,
                               (uint32_t)(ip - ref), ml);
            if (rc < 0) goto done;
            ip += ml; anchor = ip;
            continue;
        }
        if (start0 < ip && start2 < ip + ml0) {
            /* the skipped original ML1 still fits before ML2: restore it */
            ip = start0; ref = ref0; ml = ml0;
        }
        if (start2 - ip < 3) {  /* ML1 too short to keep: ML2 replaces it */
            ml = ml2; ip = start2; ref = ref2;
            goto search2;
        }

search3:
        if (start2 - ip < OPTIMAL_ML) {
            /* trim ML1 so the pair packs into one token-optimal split */
            int64_t new_ml = ml;
            if (new_ml > OPTIMAL_ML) new_ml = OPTIMAL_ML;
            if (ip + new_ml > start2 + ml2 - MINMATCH)
                new_ml = (start2 - ip) + ml2 - MINMATCH;
            int64_t corr = new_ml - (start2 - ip);
            if (corr > 0) { start2 += corr; ref2 += corr; ml2 -= corr; }
        }
        if (start2 + ml2 <= mflimit) {
            const uint8_t *s3 = start2 + ml2 - 3, *p3 = NULL;
            start3 = s3;
            ml3 = hc_wider_match(&c, s3, start2, match_limit, ml2,
                                 &start3, &p3, attempts, pa, 0);
            ref3 = p3;
        } else {
            ml3 = ml2;
        }
        if (ml3 == ml2) {  /* stable pair: emit ML1 then ML2 */
            if (start2 < ip + ml) ml = start2 - ip;
            rc = emit_sequence(&op, oend, anchor, ip - anchor,
                               (uint32_t)(ip - ref), ml);
            if (rc < 0) goto done;
            anchor = ip + ml;
            rc = emit_sequence(&op, oend, anchor, start2 - anchor,
                               (uint32_t)(start2 - ref2), ml2);
            if (rc < 0) goto done;
            ip = start2 + ml2; anchor = ip;
            continue;
        }
        if (start3 < ip + ml + 3) {  /* ML3 kills ML2 */
            if (start3 >= ip + ml) {
                /* ML1 can be emitted now; ML3 becomes the new ML1 */
                if (start2 < ip + ml) {
                    int64_t corr = (ip + ml) - start2;
                    start2 += corr; ref2 += corr; ml2 -= corr;
                    if (ml2 < MINMATCH) {
                        start2 = start3; ref2 = ref3; ml2 = ml3;
                    }
                }
                rc = emit_sequence(&op, oend, anchor, ip - anchor,
                                   (uint32_t)(ip - ref), ml);
                if (rc < 0) goto done;
                anchor = ip + ml;
                ip = start3; ref = ref3; ml = ml3;
                start0 = start2; ref0 = ref2; ml0 = ml2;
                goto search2;
            }
            start2 = start3; ref2 = ref3; ml2 = ml3;
            goto search3;
        }
        /* three ascending matches: emit ML1 (trimmed), shift the window */
        if (start2 < ip + ml) {
            if (start2 - ip < OPTIMAL_ML) {
                if (ml > OPTIMAL_ML) ml = OPTIMAL_ML;
                if (ip + ml > start2 + ml2 - MINMATCH)
                    ml = (start2 - ip) + ml2 - MINMATCH;
                int64_t corr = ml - (start2 - ip);
                if (corr > 0) { start2 += corr; ref2 += corr; ml2 -= corr; }
            } else {
                ml = start2 - ip;
            }
        }
        rc = emit_sequence(&op, oend, anchor, ip - anchor,
                           (uint32_t)(ip - ref), ml);
        if (rc < 0) goto done;
        anchor = ip + ml;
        ip = start2; ref = ref2; ml = ml2;
        start2 = start3; ref2 = ref3; ml2 = ml3;
        goto search3;
    }

    rc = emit_sequence(&op, oend, anchor, src_end - anchor, 0, 0);
done:
    chain_free(&c);
    if (rc < 0) return rc;
    return op - out;
}

/* --------------------------------------------------------------- xxh32 */

#define XP1 2654435761u
#define XP2 2246822519u
#define XP3 3266489917u
#define XP4 668265263u
#define XP5 374761393u

static inline uint32_t rotl32(uint32_t x, int r) {
    return (x << r) | (x >> (32 - r));
}

static inline uint32_t xxh_round(uint32_t acc, uint32_t lane) {
    return rotl32(acc + lane * XP2, 13) * XP1;
}

uint32_t lz4tpu_xxh32(const uint8_t *p, int64_t len, uint32_t seed) {
    const uint8_t *end = p + len;
    uint32_t acc;
    if (len >= 16) {
        uint32_t a0 = seed + XP1 + XP2, a1 = seed + XP2, a2 = seed,
                 a3 = seed - XP1;
        const uint8_t *limit = end - 16;
        do {
            a0 = xxh_round(a0, read32(p));
            a1 = xxh_round(a1, read32(p + 4));
            a2 = xxh_round(a2, read32(p + 8));
            a3 = xxh_round(a3, read32(p + 12));
            p += 16;
        } while (p <= limit);
        acc = rotl32(a0, 1) + rotl32(a1, 7) + rotl32(a2, 12) + rotl32(a3, 18);
    } else {
        acc = seed + XP5;
    }
    acc += (uint32_t)len;
    while (p + 4 <= end) {
        acc = rotl32(acc + read32(p) * XP3, 17) * XP4;
        p += 4;
    }
    while (p < end) {
        acc = rotl32(acc + (*p) * XP5, 11) * XP1;
        p++;
    }
    acc ^= acc >> 15; acc *= XP2;
    acc ^= acc >> 13; acc *= XP3;
    acc ^= acc >> 16;
    return acc;
}

/* streaming body: advance 4 accumulators over n 16-byte stripes */
void lz4tpu_xxh32_stripes(uint32_t *state, const uint8_t *p, int64_t n) {
    uint32_t a0 = state[0], a1 = state[1], a2 = state[2], a3 = state[3];
    for (int64_t i = 0; i < n; i++) {
        a0 = xxh_round(a0, read32(p));
        a1 = xxh_round(a1, read32(p + 4));
        a2 = xxh_round(a2, read32(p + 8));
        a3 = xxh_round(a3, read32(p + 12));
        p += 16;
    }
    state[0] = a0; state[1] = a1; state[2] = a2; state[3] = a3;
}

/* ------------------------------------------------- optimal parse (L10+) */

/* exact LZ4 sequence prices (reference `LL.high.cs:267-289`) */
static inline int32_t lit_price(int64_t litlen) {
    int32_t price = (int32_t)litlen;
    if (litlen >= 15) price += 1 + (int32_t)((litlen - 15) / 255);
    return price;
}

static inline int32_t seq_price(int64_t litlen, int64_t mlen) {
    int32_t price = 3 + lit_price(litlen);  /* token + 16-bit offset */
    if (mlen >= 15 + MINMATCH)
        price += 1 + (int32_t)((mlen - 15 - MINMATCH) / 255);
    return price;
}

/* best (len, off) at ip via the chain-swap + pattern-analysis search */
static inline int64_t opt_find_match(
    chain_t *c, const uint8_t *ip, const uint8_t *ihigh,
    int64_t min_len, int32_t searches, int64_t *off_out)
{
    const uint8_t *mp = NULL, *ms = ip;
    int64_t len = hc_wider_match(&c[0], ip, ip, ihigh, min_len,
                                 &ms, &mp, searches, 1, 1);
    if (len <= min_len) return 0;
    *off_out = ip - mp;
    return len;
}

typedef struct { int32_t price, off, mlen, litlen; } opt_t;

/* True price-model optimal parse over OPT_NUM windows: per-position DP with
 * exact literal/sequence prices, sufficient-length early exit, and the
 * skip-if-not-cheaper pruning; L12 re-searches every position (fullUpdate). */
int64_t lz4tpu_encode_opt(
    const uint8_t *buf, int64_t buf_len, int64_t src_off,
    uint8_t *out, int64_t out_cap, int32_t level)
{
    const int TRAILING = 3;
    int64_t n = buf_len - src_off;
    uint8_t *op = out, *oend = out + out_cap;
    if (n <= 0) {
        if (out_cap < 1) return ERR_OUTPUT_OVERFLOW;
        *op++ = 0;
        return 1;
    }
    if (level < 10) level = 10;
    if (level > 12) level = 12;
    int32_t searches = hc_level_table[level].searches;
    int64_t sufficient = hc_level_table[level].target;
    int full_update = level == 12;
    if (sufficient >= OPT_NUM) sufficient = OPT_NUM - 1;

    const uint8_t *base = buf;
    const uint8_t *src_end = buf + buf_len;
    const uint8_t *mflimit = src_end - MFLIMIT;
    const uint8_t *match_limit = src_end - LASTLITERALS;
    const uint8_t *anchor = buf + src_off;
    const uint8_t *ip = anchor;

    chain_t c;
    if (!chain_init(&c, base, buf_len)) return ERR_MALFORMED;
    chain_insert(&c, src_off);
    opt_t *o = (opt_t *)malloc(sizeof(opt_t) * (OPT_NUM + TRAILING));
    if (!o) { chain_free(&c); return ERR_MALFORMED; }

    int64_t rc = 0;
    while (ip <= mflimit) {
        int64_t llen = ip - anchor;
        int64_t first_off = 0;
        int64_t first_len = opt_find_match(
            &c, ip, match_limit, MINMATCH - 1, searches, &first_off);
        if (first_len == 0) { ip++; continue; }

        if (first_len > sufficient) {
            /* long enough: take it outright */
            rc = emit_sequence(&op, oend, anchor, llen,
                               (uint32_t)first_off, first_len);
            if (rc < 0) goto done;
            ip += first_len; anchor = ip;
            continue;
        }

        /* seed the price table: leading literals, then the first match */
        for (int64_t r = 0; r < MINMATCH; r++) {
            o[r].mlen = 1; o[r].off = 0;
            o[r].litlen = (int32_t)(llen + r);
            o[r].price = lit_price(llen + r);
        }
        for (int64_t m = MINMATCH; m <= first_len; m++) {
            o[m].mlen = (int32_t)m; o[m].off = (int32_t)first_off;
            o[m].litlen = (int32_t)llen;
            o[m].price = seq_price(llen, m);
        }
        int64_t last = first_len;
        for (int64_t a = 1; a <= TRAILING; a++) {
            o[last + a].mlen = 1; o[last + a].off = 0;
            o[last + a].litlen = (int32_t)a;
            o[last + a].price = o[last].price + lit_price(a);
        }

        int64_t best_mlen, best_off, cur;
        for (cur = 1; cur < last; cur++) {
            const uint8_t *cp = ip + cur;
            if (cp > mflimit) break;
            if (full_update) {
                if (o[cur + 1].price <= o[cur].price
                    && o[cur + MINMATCH].price < o[cur].price + 3)
                    continue;
            } else {
                if (o[cur + 1].price <= o[cur].price) continue;
            }
            int64_t new_off = 0;
            int64_t new_len = opt_find_match(
                &c, cp, match_limit,
                full_update ? MINMATCH - 1 : last - cur, searches, &new_off);
            if (new_len == 0) continue;

            if (new_len > sufficient || new_len + cur >= OPT_NUM) {
                best_mlen = new_len; best_off = new_off;
                last = cur + 1;
                goto encode;
            }

            /* literal extensions from cur */
            {
                int64_t base_ll = o[cur].litlen;
                for (int64_t l = 1; l < MINMATCH; l++) {
                    int32_t price = o[cur].price - lit_price(base_ll)
                        + lit_price(base_ll + l);
                    int64_t pos = cur + l;
                    if (price < o[pos].price) {
                        o[pos].mlen = 1; o[pos].off = 0;
                        o[pos].litlen = (int32_t)(base_ll + l);
                        o[pos].price = price;
                    }
                }
            }
            /* match lengths from cur */
            for (int64_t m = MINMATCH; m <= new_len; m++) {
                int64_t pos = cur + m;
                int32_t price;
                int64_t ll;
                if (o[cur].mlen == 1) {
                    ll = o[cur].litlen;
                    price = (cur > ll ? o[cur - ll].price : 0)
                        + seq_price(ll, m);
                } else {
                    ll = 0;
                    price = o[cur].price + seq_price(0, m);
                }
                if (pos > last + TRAILING || price <= o[pos].price) {
                    if (m == new_len && last < pos) last = pos;
                    o[pos].mlen = (int32_t)m;
                    o[pos].off = (int32_t)new_off;
                    o[pos].litlen = (int32_t)ll;
                    o[pos].price = price;
                }
            }
            for (int64_t a = 1; a <= TRAILING; a++) {
                o[last + a].mlen = 1; o[last + a].off = 0;
                o[last + a].litlen = (int32_t)a;
                o[last + a].price = o[last].price + lit_price(a);
            }
        }

        best_mlen = o[last].mlen;
        best_off = o[last].off;
        cur = last - best_mlen;

encode:
        /* reverse the chosen path in place, then emit forward */
        {
            int64_t pos = cur;
            int64_t sel_len = best_mlen, sel_off = best_off;
            for (;;) {
                int64_t nl = o[pos].mlen, no = o[pos].off;
                o[pos].mlen = (int32_t)sel_len;
                o[pos].off = (int32_t)sel_off;
                sel_len = nl; sel_off = no;
                if (nl > pos) break;  /* reached the first step */
                pos -= nl;
            }
        }
        {
            int64_t r = 0;
            while (r < last) {
                int64_t m = o[r].mlen, off = o[r].off;
                if (m == 1) { ip++; r++; continue; }
                r += m;
                rc = emit_sequence(&op, oend, anchor, ip - anchor,
                                   (uint32_t)off, m);
                if (rc < 0) goto done;
                ip += m; anchor = ip;
            }
        }
    }

    rc = emit_sequence(&op, oend, anchor, src_end - anchor, 0, 0);
done:
    chain_free(&c);
    free(o);
    if (rc < 0) return rc;
    return op - out;
}
