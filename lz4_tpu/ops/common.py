"""Shared helpers for the vectorized LZ4 kernels.

Everything operates on int32 arrays (bytes widened to i32): TPU vector units
work on 32-bit lanes, and index arithmetic needs i32 anyway.  All shapes are
static (jit-cacheable); true lengths travel as scalar operands.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(2, n))))


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def align1024(x: int) -> int:
    """Round an array extent up to a multiple of 1024.

    TPU codegen for ops over unaligned extents (e.g. 65817) emits 4-5x more
    machine code than for aligned ones (65536/66560) — and program size is
    the serving runtime's cold-start cost — so every kernel buffer width is
    padded to a 1024 multiple.
    """
    return round_up(x, 1024)


def shift_left(b: jnp.ndarray, k: int) -> jnp.ndarray:
    """b[i+k] with zero fill past the end (no wraparound)."""
    if k == 0:
        return b
    return jnp.concatenate([b[k:], jnp.zeros((k,), b.dtype)])


def word_le(b: jnp.ndarray) -> jnp.ndarray:
    """w[i] = 4-byte little-endian word starting at i, as i32 (zero fill past
    the end)."""
    return (
        b
        | (shift_left(b, 1) << 8)
        | (shift_left(b, 2) << 16)
        | (shift_left(b, 3) << 24)
    )


def _words_le(x: jnp.ndarray) -> jnp.ndarray:
    """Per-row 4-byte little-endian words: w[b, p] = bytes p..p+3 of row b.

    The staging transform for the scalar packed-word kernels: one SMEM load
    of w[p] reads an unaligned 4-byte window at any byte phase.
    """
    z = jnp.zeros((x.shape[0], 3), x.dtype)
    x1 = jnp.concatenate([x[:, 1:], z[:, :1]], axis=1)
    x2 = jnp.concatenate([x[:, 2:], z[:, :2]], axis=1)
    x3 = jnp.concatenate([x[:, 3:], z], axis=1)
    return x | (x1 << 8) | (x2 << 16) | (x3 << 24)


# LZ4Level -> hash-chain search depth (maxNbAttempts) for the device HC
# kernels; mirrors the reference clTable (x64/LL64.high.cs:1124-1138) for
# the lz4hc strategy levels.  L10+ (optimal parse) route via opt_* flags.
LEVEL_ATTEMPTS = {
    0: 0, 1: 0, 2: 0,
    3: 4, 4: 8, 5: 16, 6: 32, 7: 64, 8: 128, 9: 256,
}


def gather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Clamped gather."""
    return arr[jnp.clip(idx, 0, arr.shape[0] - 1)]


def reverse_cummin(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse cumulative minimum along the last axis.

    Uses `lax.cummin` (a single fused XLA op, ~1 MB of TPU code) rather than
    `lax.associative_scan` (whose generic divide-and-conquer expansion
    generates ~4.5 MB of code and ~57 MB of scratch per use on TPU).
    """
    return lax.cummin(x, axis=x.ndim - 1, reverse=True)


def next_not_equal(flag_neq: jnp.ndarray, idx: jnp.ndarray, sentinel: int) -> jnp.ndarray:
    """For each i, the smallest j >= i with flag_neq[j] True (else sentinel).

    One reverse cumulative-min over masked indices.
    """
    m = jnp.where(flag_neq, idx, sentinel)
    return reverse_cummin(m)


def exclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.cumsum(x) - x


def bucket(n: int, floor: int = 1 << 12) -> int:
    """Round ``n`` up to a power of two (>= ``floor``): the shared
    jit-shape bucketing family for one-shot device calls (bounds the
    per-shape executable count on remote-compile runtimes).  The single
    source of truth — encode_jax/decode_jax re-export it."""
    cap = floor
    while cap < n:
        cap <<= 1
    return cap
