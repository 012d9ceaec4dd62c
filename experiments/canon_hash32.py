"""32-bit-only emulation of upstream lz4's byU32 5-byte hash — the
stepping stone for streaming-kernel canonical parity above 64 KB.

Canonical (`lz4.c LZ4_hash5`, mirrored by `native/lz4tpu.c chash_u32`):

    h = (((v << 24) * 889523592379) mod 2^64) >> 52        # v = 5 LE bytes

The TPU scalar core is 32-bit, so the kernel cannot form the 64-bit
product — but the needed bits (52..63) live in the product's high word,
which decomposes exactly into 32-bit pieces.  With

    x = v << 24 (mod 2^64):  x_lo = b0 << 24,  x_hi = (v >> 8) mod 2^32
    K = K_hi8 * 2^32 + K_lo32,   K_lo32 = KL_hi16 * 2^16 + KL_lo16

    P_hi32 = ( hi32(x_lo * K_lo32)
             + lo32(x_lo * K_hi8)
             + lo32(x_hi * K_lo32) ) mod 2^32
    h      = P_hi32 >> 20

where every term is 32-bit computable:

  - hi32(x_lo*K_lo32) = (b0*K_lo32) >> 8 = (b0*KL_hi16 << 8) + (b0*KL_lo16 >> 8)
    (exact: floor((A<<16 + B)/2^8) = (A<<8) + (B>>8); both partials < 2^30)
  - lo32(x_lo*K_hi8)  = ((b0 * K_hi8) & 0xFF) << 24
  - lo32(x_hi*K_lo32) = wrapping 32x32 multiply (XLA s32 mul wraps)

Kernel-side inputs are free: b0 is the byte at p and x_hi is the
unaligned 32-bit LE read at p+1 — both already in the encoder's reach.
Cost: ~2 small muls + 1 wrapping mul + ~5 ALU ops per probe.

Status: proven bit-exact against the 64-bit formula over the full b0
range x random tails and exhaustive low/high edges
(experiments/tests/test_canon_hash32.py), and WIRED INTO the production
kernels in round 4: `ops/encode_pallas5._encode_body`'s canonical scan
uses this decomposition for the byU32 mode (inputs >= 64 KB + 11), in
both the staged and windowed-streaming instantiations — gated
byte-identical to the host canonical engines / upstream
LZ4_compress_default by tests/test_pallas_encode_stream.py and the
liblz4 interop suite.  test_kernel_constants_in_sync keeps the two
constant decompositions in lockstep.
"""

from __future__ import annotations

import numpy as np

K64 = 889523592379            # 0xCF_1BBCDCBB, 40 bits
K_HI8 = K64 >> 32             # 0xCF
KL = K64 & 0xFFFFFFFF         # 0x1BBCDCBB
KL_HI16 = KL >> 16            # 0x1BBC
KL_LO16 = KL & 0xFFFF         # 0xDCBB
HASHLOG = 12                  # canonical byU32 table (LZ4_HASHLOG)


def hash5_ref(v: int) -> int:
    """The 64-bit reference formula (chash_u32 / upstream LZ4_hash5)."""
    return (((v << 24) * K64) & 0xFFFFFFFFFFFFFFFF) >> (64 - HASHLOG)


def hash5_u32(b0: int, w_hi: int) -> int:
    """32-bit-only emulation.  b0 = byte at p; w_hi = LE32 read at p+1
    (i.e. (v >> 8) mod 2^32).  All intermediates fit 32 bits; the one
    wrapping multiply mirrors XLA's s32 mul semantics."""
    m32 = 0xFFFFFFFF
    hi_xlo_klo = ((b0 * KL_HI16) << 8) + ((b0 * KL_LO16) >> 8)   # < 2^30
    lo_xlo_khi = ((b0 * K_HI8) & 0xFF) << 24
    lo_xhi_klo = (w_hi * KL) & m32                               # wrap
    return ((hi_xlo_klo + lo_xlo_khi + lo_xhi_klo) & m32) >> (52 - 32)


def hash5_u32_np(b0: np.ndarray, w_hi: np.ndarray) -> np.ndarray:
    """Vectorized int32-typed variant exercising the exact dtype/wrap
    semantics a Pallas scalar kernel would use (int32 ops wrap; the
    final shift is logical via a uint32 view)."""
    b0 = b0.astype(np.int32)
    w_hi = w_hi.astype(np.int32)
    with np.errstate(over="ignore"):
        hi = ((b0 * np.int32(KL_HI16)) << np.int32(8)) + (
            (b0 * np.int32(KL_LO16)) >> np.int32(8)
        )
        lo1 = ((b0 * np.int32(K_HI8)) & np.int32(0xFF)) << np.int32(24)
        lo2 = w_hi * np.int32(KL)
        s = hi + lo1 + lo2
    return (s.view(np.uint32) >> np.uint32(20)).astype(np.int64)
