"""Vectorized LZ4 block decoder — TPU-native design.

The canonical decoder (reference `x64/LL64.dec.cs:124-467`) is a sequential
token scan with wildcopies.  A TPU is a vector machine, so this decoder is
re-derived as four data-parallel phases with **no sequential scan at all**
(cf. "Massively-Parallel Lossless Data Decompression", PAPERS.md):

1. **Speculative parse**: every input position parses *as if* a token started
   there; VLE runs are resolved with one reverse cumulative-min over the
   "next non-255 byte" index, giving literal length / offset / match length /
   next-token position per position in O(1) vector ops.
2. **Token-chain resolution**: the true token positions are exactly the
   positions reachable from 0 through next[]; pointer doubling marks them in
   ceil(log2(n)) gather/scatter rounds.
3. **Per-output-byte source map**: prefix sums over sequence lengths give
   every output byte either a literal source (input index) or a match source
   (output index j - offset), built with interval scatter + segment-id trick.
4. **Match-chain resolution**: matches referencing output produced by other
   matches are resolved by pointer doubling on the source map (every chain
   terminates at a literal or dictionary byte), again log2(n) rounds.

Total work: ~40 gather/scan passes over the block — all dense vector ops that
XLA fuses and tiles; per-block state fits VMEM for 64 KB blocks.

Capability parity: safe decode, partial decode (via target clamp), dictionary
(prefix or external) decode — analog of `LZ4_decompress_safe[_partial|
_usingDict|_continue]`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MIN_MATCH
from .common import (
    ceil_log2,
    exclusive_cumsum,
    gather,
    mark_reachable,
    next_not_equal,
    shift_left,
)

_PAD = 8  # trailing zero pad so speculative parses never read OOB


def _parse_and_decode(comp, comp_len, dictionary, dict_len, out_cap: int):
    """comp: i32[CAP] (zero padded), dictionary: i32[DCAP] (right-aligned:
    real dict bytes live at [DCAP - dict_len, DCAP)).

    Returns (out u8[out_cap], out_len i32, err i32).
    """
    cap = comp.shape[0]
    dcap = dictionary.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    b = comp

    # ---- phase 1: speculative per-position parse -------------------------
    # VLE helper arrays: nn255[i] = first j >= i with b[j] != 255
    nn255 = next_not_equal(b != 255, idx, cap - 1)
    ext_val = 255 * (nn255 - idx) + gather(b, nn255)
    ext_bytes = nn255 - idx + 1

    tok = b
    ll_nib = tok >> 4
    ml_nib = tok & 15
    has_ll_ext = ll_nib == 15
    i1 = jnp.minimum(idx + 1, cap - 1)
    ll = jnp.where(has_ll_ext, 15 + gather(ext_val, i1), ll_nib)
    llb = jnp.where(has_ll_ext, gather(ext_bytes, i1), 0)
    lit_start = idx + 1 + llb
    lit_end = lit_start + ll  # position of the offset field
    is_last = lit_end >= comp_len
    off = gather(b, lit_end) | (gather(b, lit_end + 1) << 8)
    has_ml_ext = ml_nib == 15
    ml_ext_at = lit_end + 2
    ml = jnp.where(
        has_ml_ext,
        MIN_MATCH + 15 + gather(ext_val, ml_ext_at),
        ml_nib + MIN_MATCH,
    )
    mlb = jnp.where(has_ml_ext, gather(ext_bytes, ml_ext_at), 0)
    ml = jnp.where(is_last, 0, ml)

    dead = cap - 1
    nxt = lit_end + 2 + mlb
    nxt = jnp.where(is_last, dead, jnp.minimum(nxt, dead))
    nxt = jnp.maximum(nxt, idx + 1)  # safety: strict progress
    nxt = nxt.at[dead].set(dead)

    # ---- phase 2: mark true token positions -----------------------------
    reach = mark_reachable(nxt, ceil_log2(cap) + 1)
    is_tok = reach & (idx < comp_len)

    # ---- sequence table (kept full-width: scatter/gather stays dense) ----
    # output start of each token's sequence = cumsum of (ll+ml) over tokens
    # *before* it, computed full-width with masked contributions.
    contrib = jnp.where(is_tok, ll + ml, 0)
    out_start = exclusive_cumsum(contrib)  # valid at token positions
    out_len = jnp.sum(contrib)

    # error detection (safe decode)
    match_at = out_start + ll  # output position where the match begins
    bad = is_tok & ~is_last & (
        (off == 0)
        | (off > match_at + dict_len)  # window underflow
        | (lit_end > comp_len)  # literal run past end of input
    )
    # the last token must consume the input exactly
    bad_last = is_tok & is_last & (lit_end != comp_len)
    # exactly one reachable terminating token must exist (catches truncation:
    # a stream whose token chain walks past comp_len never sets is_last)
    has_term = jnp.any(is_tok & is_last)
    err = (
        jnp.sum(bad.astype(jnp.int32))
        + jnp.sum(bad_last.astype(jnp.int32))
        + (out_len > out_cap).astype(jnp.int32)
        + (comp_len <= 0).astype(jnp.int32)
        + (~has_term).astype(jnp.int32)
    )

    # ---- phase 3: per-output-byte source map -----------------------------
    # segment-start markers: literal segment at out_start, match segment at
    # out_start + ll (empty segments still bump the segment counter so the
    # segment-ordinal <-> (token, kind) mapping stays aligned).
    # Segment ordinal: tokens in input order; token rank via cumsum.
    tok_i32 = is_tok.astype(jnp.int32)
    rank = exclusive_cumsum(tok_i32)  # token ordinal at token positions

    marker = jnp.zeros((out_cap + 1,), jnp.int32)
    lit_seg_start = jnp.where(is_tok, out_start, out_cap + 1)
    mat_seg_start = jnp.where(is_tok, out_start + ll, out_cap + 1)
    marker = marker.at[lit_seg_start].add(1, mode="drop")
    marker = marker.at[mat_seg_start].add(1, mode="drop")
    sid = jnp.cumsum(marker)[:out_cap]  # 1-based segment ordinal per byte

    # bases[2r] (literal segment of token r): OUT_TAG + lit_start - out_start
    # bases[2r+1] (match segment):            -off
    max_tok = out_cap  # bases sized generously; scatter by 2*rank(+1)
    n_bases = 2 * (cap // 3 + 2)
    base_lit = out_cap + lit_start - out_start  # tag: >= out_cap => literal
    base_mat = -off
    dest = jnp.where(is_tok, 2 * rank, n_bases)
    bases = jnp.zeros((n_bases,), jnp.int32).at[dest].set(base_lit, mode="drop")
    dest2 = jnp.where(is_tok, 2 * rank + 1, n_bases)
    bases = bases.at[dest2].set(base_mat, mode="drop")

    j = jnp.arange(out_cap, dtype=jnp.int32)
    src_map = gather(bases, jnp.maximum(sid - 1, 0)) + j

    # ---- phase 4: resolve match chains by pointer doubling ---------------
    def body(f, _):
        g = f[jnp.clip(f, 0, out_cap - 1)]
        f = jnp.where((f >= 0) & (f < out_cap), g, f)
        return f, None

    src_map, _ = jax.lax.scan(body, src_map, None, length=ceil_log2(out_cap) + 1)

    # negative -> dictionary byte; >= out_cap -> comp literal byte
    err = err + jnp.sum(((j < out_len) & (src_map + dict_len < 0)).astype(jnp.int32))
    from_dict = src_map < 0
    lit_idx = jnp.clip(src_map - out_cap, 0, cap - 1)
    dict_idx = jnp.clip(dcap + src_map, 0, max(dcap - 1, 0))
    out = jnp.where(
        from_dict,
        gather(dictionary, dict_idx) if dcap > 0 else jnp.zeros_like(src_map),
        comp[lit_idx],
    )
    return out.astype(jnp.uint8), out_len, err


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_block_fixed(comp_u8, comp_len, dict_u8, dict_len, out_cap: int):
    """Jitted fixed-shape decoder.

    comp_u8: u8[CAP] zero-padded (CAP >= comp_len + 8).
    dict_u8: u8[DCAP], right-aligned (pass DCAP=0-size array for no dict).
    """
    comp = comp_u8.astype(jnp.int32)
    dictionary = dict_u8.astype(jnp.int32)
    return _parse_and_decode(comp, comp_len, dictionary, dict_len, out_cap)


def _bucket(n: int, floor: int = 1 << 12) -> int:
    """Round capacity up to a power of two to bound jit cache size."""
    c = floor
    while c < n:
        c <<= 1
    return c


def decode_block_bytes(
    data: bytes, target_length: int | None = None, dictionary: bytes = b""
) -> bytes:
    """Host convenience wrapper: decode one block via the vectorized kernel."""
    from ..block.hostref import LZ4Error

    n = len(data)
    if n == 0:
        raise LZ4Error("empty input")
    cap = _bucket(n + _PAD)
    comp = np.zeros(cap, np.uint8)
    comp[:n] = np.frombuffer(data, np.uint8)
    if target_length is None:
        # worst-case expansion of LZ4 is 255x per extra byte; without a hint
        # allocate generously based on input size
        out_cap = _bucket(max(64, n * 255 // 16))
    else:
        out_cap = _bucket(max(64, target_length))
    dlen = min(len(dictionary), 65536)
    dcap = _bucket(dlen, floor=1 << 8) if dlen else 1 << 8
    d = np.zeros(dcap, np.uint8)
    if dlen:
        d[dcap - dlen :] = np.frombuffer(dictionary[-dlen:], np.uint8)
    out, out_len, err = decode_block_fixed(
        jnp.asarray(comp), jnp.int32(n), jnp.asarray(d), jnp.int32(dlen), out_cap
    )
    err = int(err)
    out_len = int(out_len)
    if err:
        raise LZ4Error(f"malformed LZ4 block (err={err})")
    result = bytes(np.asarray(out[:out_len]).tobytes())
    if target_length is not None:
        if out_len != target_length:
            raise LZ4Error(
                f"decoded length {out_len} != expected {target_length}"
            )
    return result
