"""Bit-exactness of the 32-bit byU32-hash emulation vs the 64-bit
reference formula (and the native C engine's chash_u32 via the encode
path's observable behavior)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from experiments.canon_hash32 import hash5_ref, hash5_u32, hash5_u32_np


def _split(v: int):
    """v (40-bit) -> (b0, w_hi) as the kernel reads them."""
    return v & 0xFF, (v >> 8) & 0xFFFFFFFF


def test_kernel_constants_in_sync():
    """The production kernel (ops/encode_pallas5) derives its _K5_* pieces
    from the same multiplier; keep the two decompositions in lockstep."""
    from experiments import canon_hash32 as CH
    from lz4_tpu.ops import encode_pallas5 as E5

    assert E5._K5 == CH.K64
    assert E5._K5_HI8 == CH.K_HI8
    assert E5._K5_KL == CH.KL
    assert E5._K5_KL_HI16 == CH.KL_HI16
    assert E5._K5_KL_LO16 == CH.KL_LO16
    assert E5._CANON_HLOG32 == CH.HASHLOG


def test_scalar_emulation_edges():
    edges = [0, 1, 0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFFFF,
             0x100000000, 0xFFFFFFFFFF, 0x1122334455, 0xDEADBEEF01]
    for v in edges:
        b0, w = _split(v)
        assert hash5_u32(b0, w) == hash5_ref(v), hex(v)


def test_scalar_emulation_random():
    rng = np.random.default_rng(20260820)
    vs = rng.integers(0, 1 << 40, 20000, dtype=np.uint64)
    for v in vs.tolist():
        b0, w = _split(v)
        assert hash5_u32(b0, w) == hash5_ref(v), hex(v)


def test_scalar_emulation_full_b0_range():
    """Every b0 value crossed with random tails: the small-mul partials
    depend only on b0, so this exhausts their range."""
    rng = np.random.default_rng(7)
    for b0 in range(256):
        for w in rng.integers(0, 1 << 32, 16, dtype=np.uint64).tolist():
            v = (int(w) << 8) | b0
            assert hash5_u32(b0, int(w)) == hash5_ref(v), (b0, hex(w))


def test_pallas_scalar_kernel_matches():
    """The emulation written as an actual Pallas scalar-core kernel
    (SMEM loops, s32 wrap multiply, logical shift) — the exact form the
    streaming encoder's probe would compile — is bit-exact under
    interpret mode."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from experiments.canon_hash32 import KL, KL_HI16, KL_LO16, K_HI8

    def kern(b0_ref, w_ref, out_ref):
        def body(i, _):
            b0 = b0_ref[i]
            w = w_ref[i]
            hi = ((b0 * KL_HI16) << 8) + ((b0 * KL_LO16) >> 8)
            lo1 = ((b0 * K_HI8) & 0xFF) << 24
            lo2 = w * jnp.int32(np.int32(np.uint32(KL)))  # wrapping s32
            out_ref[i] = jax.lax.shift_right_logical(hi + lo1 + lo2, 20)
            return 0

        jax.lax.fori_loop(0, b0_ref.shape[0], body, 0)

    rng = np.random.default_rng(20260820)
    vs = rng.integers(0, 1 << 40, 4096, dtype=np.uint64)
    b0 = (vs & 0xFF).astype(np.int32)
    w = ((vs >> np.uint64(8)) & np.uint64(0xFFFFFFFF)).astype(
        np.uint32
    ).view(np.int32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4096,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=True,
    )
    got = np.asarray(f(jnp.asarray(b0), jnp.asarray(w)))
    want = np.array([hash5_ref(int(v)) for v in vs.tolist()], np.int32)
    assert np.array_equal(got, want)


def test_int32_typed_variant_matches():
    """The int32-typed (wrap-semantics) variant a Pallas kernel would
    compile to agrees with the python-int emulation."""
    rng = np.random.default_rng(99)
    vs = rng.integers(0, 1 << 40, 50000, dtype=np.uint64)
    b0 = (vs & 0xFF).astype(np.uint32)
    w = ((vs >> np.uint64(8)) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    got = hash5_u32_np(b0, w)
    want = np.array([hash5_ref(int(v)) for v in vs.tolist()], np.int64)
    assert np.array_equal(got, want)
