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

/* ---------------------------------------------------------------- decode */

int64_t lz4tpu_decode(
    const uint8_t *src, int64_t src_len,
    const uint8_t *dict, int64_t dict_len,
    uint8_t *out, int64_t out_cap,
    int64_t target)
{
    const uint8_t *ip = src, *iend = src + src_len;
    uint8_t *op = out, *oend = out + out_cap;
    if (src_len <= 0) return ERR_MALFORMED;

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
    memcpy(op, lit, (size_t)lit_len);
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

    int32_t *table = (int32_t *)malloc(sizeof(int32_t) << FAST_HASH_LOG);
    if (!table) return ERR_MALFORMED;
    for (int64_t i = 0; i < (1 << FAST_HASH_LOG); i++) table[i] = -1;
    /* seed with dictionary positions (sparse stride keeps setup cheap) */
    for (int64_t i = 0; i + MINMATCH <= src_off; i += 2)
        table[hash4(read32(base + i))] = (int32_t)i;

    if (n > MFLIMIT) {
        int64_t search = (int64_t)accel << SKIP_TRIGGER;
        while (p < mflimit) {
            uint32_t w = read32(p);
            uint32_t h = hash4(w);
            int64_t cand = table[h];
            table[h] = (int32_t)(p - base);
            if (cand >= 0 && (p - base) - cand <= MAXDIST
                && read32(base + cand) == w) {
                const uint8_t *m = base + cand;
                /* extend backwards */
                while (p > anchor && m > base && p[-1] == m[-1]) { p--; m--; }
                int64_t mlen = MINMATCH + run_length(
                    m + MINMATCH, p + MINMATCH, match_limit);
                int64_t rc = emit_sequence(
                    &op, oend, anchor, p - anchor,
                    (uint32_t)(p - m), mlen);
                if (rc < 0) { free(table); return rc; }
                p += mlen;
                anchor = p;
                if (p >= mflimit) break;
                table[hash4(read32(p - 2))] = (int32_t)(p - 2 - base);
                search = (int64_t)accel << SKIP_TRIGGER;
                continue;
            }
            p += (search++ >> SKIP_TRIGGER);
        }
    }
    int64_t rc = emit_sequence(&op, oend, anchor, src_end - anchor, 0, 0);
    free(table);
    if (rc < 0) return rc;
    return op - out;
}

/* ----------------------------------------------------------- HC encoder */

#define HC_HASH_LOG 15

typedef struct {
    int32_t *head;   /* hash -> most recent position */
    int32_t *prev;   /* position -> previous position with same hash */
    const uint8_t *base;
    int64_t inserted; /* positions [0, inserted) are in the tables */
    int64_t max_insert; /* read32 must stay in bounds: <= buf_len - 4 + 1 */
} chain_t;

static void chain_insert(chain_t *c, int64_t upto) {
    if (upto > c->max_insert) upto = c->max_insert;
    for (int64_t i = c->inserted; i < upto; i++) {
        uint32_t h = hash4(read32(c->base + i));
        c->prev[i] = c->head[h];
        c->head[h] = (int32_t)i;
    }
    if (upto > c->inserted) c->inserted = upto;
}

static int64_t chain_best_match(
    chain_t *c, const uint8_t *p, const uint8_t *match_limit,
    int32_t attempts, int64_t *best_off)
{
    const uint8_t *base = c->base;
    int64_t pos = p - base;
    uint32_t w = read32(p);
    int64_t cand = c->head[hash4(w)];
    int64_t best = 0;
    int64_t max_possible = match_limit - p;
    while (cand >= pos) cand = c->prev[cand]; /* skip self/future inserts */
    while (cand >= 0 && attempts > 0) {
        if (pos - cand > MAXDIST) break;
        attempts--;
        if (read32(base + cand) == w
            && base[cand + best] == p[best] /* quick reject */) {
            int64_t len = MINMATCH + run_length(
                base + cand + MINMATCH, p + MINMATCH, match_limit);
            if (len > best) {
                best = len;
                *best_off = pos - cand;
                if (best >= max_possible) break;
            }
        }
        cand = c->prev[cand];
    }
    return best >= MINMATCH ? best : 0;
}

static int32_t hc_attempts_for_level(int32_t level) {
    if (level <= 3) return 4;
    switch (level) {
        case 4: return 8;
        case 5: return 16;
        case 6: return 32;
        case 7: return 64;
        case 8: return 128;
        case 9: return 256;
        case 10: return 512;   /* opt levels approximated by deeper lazy HC */
        case 11: return 2048;
        default: return 16384;
    }
}

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
    const uint8_t *base = buf;
    const uint8_t *src_end = buf + buf_len;
    const uint8_t *mflimit = src_end - MFLIMIT;
    const uint8_t *match_limit = src_end - LASTLITERALS;
    const uint8_t *anchor = buf + src_off;
    const uint8_t *p = anchor;
    int32_t attempts = hc_attempts_for_level(level);

    chain_t c;
    c.head = (int32_t *)malloc(sizeof(int32_t) << HC_HASH_LOG);
    c.prev = (int32_t *)malloc(sizeof(int32_t) * (size_t)buf_len);
    c.base = base;
    c.inserted = 0;
    c.max_insert = buf_len - MINMATCH + 1 > 0 ? buf_len - MINMATCH + 1 : 0;
    if (!c.head || !c.prev) { free(c.head); free(c.prev); return ERR_MALFORMED; }
    for (int64_t i = 0; i < (1 << HC_HASH_LOG); i++) c.head[i] = -1;
    chain_insert(&c, src_off);

    while (p < mflimit) {
        chain_insert(&c, p - base + 1);
        int64_t moff = 0;
        int64_t mlen = chain_best_match(&c, p, match_limit, attempts, &moff);
        if (!mlen) { p++; continue; }
        /* lazy: better match starting at p+1 wins a literal */
        while (p + 1 < mflimit) {
            chain_insert(&c, p - base + 2);
            int64_t noff = 0;
            int64_t nlen = chain_best_match(
                &c, p + 1, match_limit, attempts, &noff);
            if (nlen > mlen) { p++; mlen = nlen; moff = noff; }
            else break;
        }
        /* extend backwards */
        {
            const uint8_t *m = p - moff;
            while (p > anchor && m > base && p[-1] == m[-1]) { p--; m--; mlen++; }
        }
        int64_t rc = emit_sequence(
            &op, oend, anchor, p - anchor, (uint32_t)moff, mlen);
        if (rc < 0) { free(c.head); free(c.prev); return rc; }
        p += mlen;
        chain_insert(&c, p - base < buf_len - MINMATCH
                         ? p - base : buf_len - MINMATCH);
        anchor = p;
    }
    int64_t rc = emit_sequence(&op, oend, anchor, src_end - anchor, 0, 0);
    free(c.head);
    free(c.prev);
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

/* Backward dynamic program minimizing encoded bytes: literal cost 1/byte
 * (VLE overhead folded at emission), match cost exact (token+offset+VLE).
 * Longest-match candidates from a full hash-chain search, with backward
 * match-extension propagation so truncated chains still yield long matches.
 * Same cost model shape as the canonical optimal parser's price functions,
 * re-derived independently (see block/hostref.py encode_opt). */
int64_t lz4tpu_encode_opt(
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
    const uint8_t *base = buf;
    const uint8_t *src_end = buf + buf_len;
    const uint8_t *mflimit = src_end - MFLIMIT;
    const uint8_t *match_limit = src_end - LASTLITERALS;
    int32_t attempts = level >= 12 ? 16384 : (level >= 11 ? 512 : 96);

    chain_t c;
    c.head = (int32_t *)malloc(sizeof(int32_t) << HC_HASH_LOG);
    c.prev = (int32_t *)malloc(sizeof(int32_t) * (size_t)buf_len);
    int32_t *cost = (int32_t *)malloc(sizeof(int32_t) * (size_t)(n + 2));
    int32_t *cml = (int32_t *)malloc(sizeof(int32_t) * (size_t)(n + 2));
    int32_t *cmo = (int32_t *)malloc(sizeof(int32_t) * (size_t)(n + 2));
    int32_t *bl = (int32_t *)malloc(sizeof(int32_t) * (size_t)(n + 2));
    int32_t *bo = (int32_t *)malloc(sizeof(int32_t) * (size_t)(n + 2));
    if (!c.head || !c.prev || !cost || !cml || !cmo || !bl || !bo) {
        free(c.head); free(c.prev); free(cost); free(cml); free(cmo);
        free(bl); free(bo);
        return ERR_MALFORMED;
    }
    c.base = base;
    c.inserted = 0;
    c.max_insert = buf_len - MINMATCH + 1 > 0 ? buf_len - MINMATCH + 1 : 0;
    for (int64_t i = 0; i < (1 << HC_HASH_LOG); i++) c.head[i] = -1;
    chain_insert(&c, buf_len - MINMATCH > 0 ? buf_len - MINMATCH : 0);

    cost[n] = 0; cost[n + 1] = 0;
    cml[n] = cml[n + 1] = 0;
    bl[n] = bl[n + 1] = 0;
    bo[n] = bo[n + 1] = 0;
    for (int64_t i = n - 1; i >= 0; i--) {
        const uint8_t *p = base + src_off + i;
        int32_t best_cost = cost[i + 1] + 1; /* literal */
        int32_t best_ml = 0, best_off = 0;
        bl[i] = 0; bo[i] = 0;
        if (p < mflimit) {
            int64_t moff = 0;
            int64_t mlen = chain_best_match(&c, p, match_limit, attempts, &moff);
            /* back-extension: the match at i+1 extends to i when the
             * preceding byte matches too */
            if (i + 1 < n && bl[i + 1] > 0) {
                int64_t o = bo[i + 1];
                if ((int64_t)(p - base) >= o && p[0] == *(p - o)) {
                    int64_t ext = bl[i + 1] + 1;
                    int64_t maxl = match_limit - p;
                    if (ext > maxl) ext = maxl;
                    if (ext > mlen) { mlen = ext; moff = o; }
                }
            }
            bl[i] = (int32_t)mlen; bo[i] = (int32_t)moff;
            if (mlen >= MINMATCH) {
                /* candidate lengths: the longest, plus the nibble boundary */
                int64_t lens[2]; int nlens = 1;
                lens[0] = mlen;
                if (mlen > 18) { lens[1] = 18; nlens = 2; }
                for (int k = 0; k < nlens; k++) {
                    int64_t L = lens[k];
                    int64_t ml = L - MINMATCH;
                    int32_t cc = 3; /* token + offset */
                    if (ml >= 15) cc += 1 + (int32_t)((ml - 15) / 255);
                    cc += cost[i + L];
                    if (cc < best_cost) {
                        best_cost = cc;
                        best_ml = (int32_t)L;
                        best_off = (int32_t)moff;
                    }
                }
            }
        }
        cost[i] = best_cost;
        cml[i] = best_ml;
        cmo[i] = best_off;
    }

    /* emit along the optimal path */
    int64_t i = 0, anchor = 0, rc = 0;
    while (i < n) {
        if (cml[i] == 0) { i++; continue; }
        rc = emit_sequence(&op, oend, base + src_off + anchor, i - anchor,
                           (uint32_t)cmo[i], cml[i]);
        if (rc < 0) goto done;
        i += cml[i];
        anchor = i;
    }
    rc = emit_sequence(&op, oend, base + src_off + anchor, n - anchor, 0, 0);
done:
    free(c.head); free(c.prev); free(cost); free(cml); free(cmo);
    free(bl); free(bo);
    if (rc < 0) return rc;
    return op - out;
}
