"""Pallas TPU xxHash32 — device-side checksums.

xxHash32's stripe recurrence is sequential (rotl of a 32-bit sum is not
associative), so it maps to the scalar unit: one grid step per buffer, the
bytes pre-packed as LE words in SMEM so each 16-byte stripe costs 4 scalar
loads + ~16 ALU ops.  Used for frame block/content checksums when the data
already lives in HBM (the host path uses the native C implementation).

Spec-equivalent to `lz4_tpu.xxh32` (clean-room xxHash32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import _words_le

_LANES = 128

# xxh32 primes as two's-complement int32 literals
_P1 = -1640531535  # 2654435761
_P2 = -2048144777  # 2246822519
_P3 = -1028477379  # 3266489917
_P4 = 668265263
_P5 = 374761393


def _rotl(x, r):
    ux = x.astype(jnp.uint32)
    return ((ux << r) | (ux >> (32 - r))).astype(jnp.int32)


def _xxh_kernel(len_ref, words, out_ref):
    i = pl.program_id(0)
    n = len_ref[i]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def word(p):
        return words[0, 0, p]

    def byte(p):
        return word(p) & 0xFF

    def rnd(acc, lane_v):
        return _rotl(acc + lane_v * _P2, 13) * _P1

    n_stripes = n // 16

    def stripe(k, accs):
        a0, a1, a2, a3 = accs
        p = k * 16
        return (
            rnd(a0, word(p)),
            rnd(a1, word(p + 4)),
            rnd(a2, word(p + 8)),
            rnd(a3, word(p + 12)),
        )

    seed = jnp.int32(0)
    a0, a1, a2, a3 = jax.lax.fori_loop(
        0,
        n_stripes,
        stripe,
        (seed + _P1 + _P2, seed + _P2, seed, seed - _P1),
    )
    acc = jnp.where(
        n >= 16,
        _rotl(a0, 1) + _rotl(a1, 7) + _rotl(a2, 12) + _rotl(a3, 18),
        seed + _P5,
    )
    acc = acc + n

    p0 = n_stripes * 16

    def tail4(k, s):
        acc, p = s
        return _rotl(acc + word(p) * _P3, 17) * _P4, p + 4

    acc, p = jax.lax.fori_loop(0, (n - p0) // 4, tail4, (acc, p0))

    def tail1(k, s):
        acc, p = s
        return _rotl(acc + byte(p) * _P5, 11) * _P1, p + 1

    acc, _ = jax.lax.fori_loop(0, n - p0 - ((n - p0) // 4) * 4, tail1, (acc, p))

    acc = acc ^ (acc.astype(jnp.uint32) >> 15).astype(jnp.int32)
    acc = acc * _P2
    acc = acc ^ (acc.astype(jnp.uint32) >> 13).astype(jnp.int32)
    acc = acc * _P3
    acc = acc ^ (acc.astype(jnp.uint32) >> 16).astype(jnp.int32)
    out_ref[0, :, :] = jnp.where(lane == 0, acc, 0)


@jax.jit
def pallas_xxh32(bufs_i32, lens):
    """bufs_i32: i32[B, CAP] (one byte per lane, CAP % 128 == 0).

    Returns i32[B]: xxh32 (seed 0) of the first lens[b] bytes of each row.
    """
    b, cap = bufs_i32.shape
    assert cap % _LANES == 0

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap), lambda i, lens: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[pl.BlockSpec((1, 1, _LANES), lambda i, lens: (i, 0, 0))],
    )

    (out,) = pl.pallas_call(
        _xxh_kernel,
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((b, 1, _LANES), jnp.int32)],
    )(lens, _words_le(bufs_i32).reshape(b, 1, cap))
    return out.reshape(b, _LANES)[:, 0]


def xxh32_blocks(bufs_u8: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Host wrapper: xxh32 per row as uint32."""
    out = pallas_xxh32(
        jnp.asarray(bufs_u8, jnp.int32), jnp.asarray(lens, jnp.int32)
    )
    return np.asarray(out).astype(np.uint32)
