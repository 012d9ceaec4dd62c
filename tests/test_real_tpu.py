"""Real-TPU kernel validation (Mosaic codegen, not interpret mode).

Skipped unless LZ4TPU_REAL_TPU=1: the suite normally pins the CPU backend
(conftest), and only one process may own the TPU tunnel at a time.  Run
manually (never concurrently with a bench):

    LZ4TPU_REAL_TPU=1 python -m pytest tests/test_real_tpu.py -q

Uses small shapes so compiles stay cheap; exercises every device kernel
family end-to-end on the actual hardware: FAST/HC encode, staged decode,
ring-streamed decode (64 KB and 256 KB blocks), dictionary decode, xxh32.
"""

import os
import random

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("LZ4TPU_REAL_TPU") != "1",
    reason="real-TPU run not requested (set LZ4TPU_REAL_TPU=1)",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return jax


def _mk_blocks(rng, bcap, nb, pad):
    from lz4_tpu.parallel.blocks import comp_capacity

    bufs = np.zeros((nb, bcap + pad), np.uint8)
    lens = np.zeros((nb,), np.int32)
    datas = []
    for b in range(nb):
        kind = b % 3
        if kind == 0:
            words = [rng.randbytes(rng.randint(3, 8)) for _ in range(20)]
            d = b" ".join(rng.choice(words) for _ in range(bcap // 4))[:bcap]
        elif kind == 1:
            d = (rng.randbytes(97) * (bcap // 97 + 1))[:bcap]
        else:
            d = rng.randbytes(bcap // 2) + bytes(bcap // 2)
        bufs[b, : len(d)] = np.frombuffer(d, np.uint8)
        lens[b] = len(d)
        datas.append(d)
    return bufs, lens, datas, comp_capacity(bcap)


def test_fast_and_hc_encode_roundtrip(tpu):
    """The production (v5 all-scalar) encode kernel on real hardware."""
    from lz4_tpu.block import hostref
    from lz4_tpu.ops.encode_pallas5 import encode_blocks_pallas5

    rng = random.Random(21)
    bcap = 8192
    bufs, lens, datas, _ = _mk_blocks(rng, bcap, 6, 256)
    for level in (0, 9, 12):
        out, clens, errs = encode_blocks_pallas5(bufs, lens, bcap, level)
        assert not errs.any(), level
        for b, d in enumerate(datas):
            comp = out[b, : clens[b]].tobytes()
            assert hostref.decode_block(comp, len(d)) == d, (level, b)


def test_staged_decode_roundtrip(tpu):
    from lz4_tpu import native
    from lz4_tpu.ops.decode_pallas6 import decode_blocks_pallas6 as decode_blocks_pallas

    rng = random.Random(22)
    bcap = 8192
    bufs, lens, datas, cap = _mk_blocks(rng, bcap, 6, 256)
    comps = np.zeros((6, cap), np.uint8)
    clens = np.zeros((6,), np.int32)
    for b, d in enumerate(datas):
        c = native.encode(d, 9)
        comps[b, : len(c)] = np.frombuffer(c, np.uint8)
        clens[b] = len(c)
    out, olens, errs = decode_blocks_pallas(comps, clens, bcap)
    assert not errs.any()
    for b, d in enumerate(datas):
        assert out[b, : olens[b]].tobytes() == d, b


def test_scalar_decode_v6(tpu):
    """The production (v6 all-scalar) decode kernel on real hardware,
    covering the small-period pattern paths that only trigger under Mosaic
    codegen (not interpret mode)."""
    from lz4_tpu import native
    from lz4_tpu.ops.decode_pallas6 import (
        decode_blocks_pallas6 as decode_blocks_pallas5,
    )
    from lz4_tpu.parallel.blocks import comp_capacity

    rng = random.Random(23)
    bcap = 16384
    cap = comp_capacity(bcap)
    datas = [
        b" ".join(
            rng.choice([b"alpha", b"beta", b"gamma"]) for _ in range(bcap)
        )[: bcap // 2] + rng.randbytes(bcap // 4) + bytes(bcap // 4),
        bytes(bcap),                       # off=1 runs
        (b"ab" * bcap)[:bcap],             # off=2
        (b"abc" * bcap)[:bcap],            # off=3
        (b"abcde" * bcap)[:bcap],          # off=5
        (b"abcdefg" * bcap)[:bcap],        # off=7
        rng.randbytes(bcap),               # stored-ish long literals
    ]
    comps = np.zeros((len(datas), cap), np.uint8)
    clens = np.zeros((len(datas),), np.int32)
    for b, d in enumerate(datas):
        c = native.encode(d, 0)
        comps[b, : len(c)] = np.frombuffer(c, np.uint8)
        clens[b] = len(c)
    out, olens, errs = decode_blocks_pallas5(comps, clens, bcap)
    assert not errs.any()
    for b, d in enumerate(datas):
        assert out[b, : olens[b]].tobytes() == d, b


def test_streaming_decode_large_blocks(tpu):
    """The ring-streamed decoder beyond the 64 KB staged cap (256 KB)."""
    from lz4_tpu import native
    from lz4_tpu.ops.decode_pallas_stream import decode_blocks_pallas_stream
    from lz4_tpu.parallel.blocks import comp_capacity

    rng = random.Random(29)
    bcap = 262144
    cap = comp_capacity(bcap)
    d = (
        b" ".join(rng.choice([b"alpha", b"beta", b"gamma"]) for _ in range(bcap))[: bcap // 2]
        + rng.randbytes(bcap // 4)
        + bytes(bcap // 4)
    )
    c = native.encode(d, 0)
    comps = np.zeros((2, cap), np.uint8)
    clens = np.zeros((2,), np.int32)
    for b in (0, 1):
        comps[b, : len(c)] = np.frombuffer(c, np.uint8)
        clens[b] = len(c)
    out, olens, errs = decode_blocks_pallas_stream(comps, clens, bcap)
    assert not errs.any()
    for b in (0, 1):
        assert out[b, : olens[b]].tobytes() == d, b


def test_streaming_encode_large_blocks(tpu):
    """The ring-streamed encoder beyond the 64 KB staged cap (128 KB),
    byte-identical to the native host engine (same parse semantics)."""
    from lz4_tpu import native
    from lz4_tpu.ops.encode_pallas_stream import encode_blocks_pallas_stream

    rng = random.Random(33)
    bcap = 131072
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    d = (
        b" ".join(rng.choice(words) for _ in range(bcap))[: bcap // 2]
        + rng.randbytes(bcap // 4)
        + bytes(bcap // 4)
    )
    # mixed batch: block 0 full-size (byU32), block 1 small (byU16) — the
    # per-block runtime table-mode cond under real Mosaic codegen
    d_small = d[: 30000]
    bufs = np.zeros((2, bcap), np.uint8)
    bufs[0] = np.frombuffer(d, np.uint8)
    bufs[1, : len(d_small)] = np.frombuffer(d_small, np.uint8)
    lens = np.asarray([bcap, len(d_small)], np.int32)
    for level in (0, 9):
        out, clens, errs = encode_blocks_pallas_stream(bufs, lens, bcap, level)
        assert not errs.any(), level
        # one-shot FAST defaults to the canonical byU32 schedule above the
        # 64 KB limit (round 4) — byte-identical to the host default
        for b, src in ((0, d), (1, d_small)):
            ref = native.encode(src, level)
            assert out[b, : clens[b]].tobytes() == ref, (level, b)
    bufs[1] = bufs[0]
    lens = np.full((2,), bcap, np.int32)
    # the dense 15-bit geometry stays selectable
    out, clens, errs = encode_blocks_pallas_stream(
        bufs, lens, bcap, 0, fast_schedule="dense"
    )
    assert not errs.any()
    ref = native.encode(d, 0, geometry="dense")
    for b in (0, 1):
        assert out[b, : clens[b]].tobytes() == ref, b


def test_dict_decode(tpu):
    from lz4_tpu import native
    from lz4_tpu.ops.decode_pallas6 import decode_blocks_pallas6 as decode_blocks_pallas
    from lz4_tpu.parallel.blocks import comp_capacity

    rng = random.Random(24)
    dictionary = rng.randbytes(500) * 3
    data = dictionary[-400:] + b"NEW!" + dictionary[:300]
    c = native.encode(data, 0, dictionary=dictionary)
    cap = comp_capacity(4096)
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : len(c)] = np.frombuffer(c, np.uint8)
    dicts = np.zeros((1, 65536), np.uint8)
    dw = dictionary[-65536:]
    dicts[0, 65536 - len(dw):] = np.frombuffer(dw, np.uint8)
    out, olens, errs = decode_blocks_pallas(
        comps, np.asarray([len(c)], np.int32), 4096,
        dicts, np.asarray([len(dw)], np.int32),
    )
    assert errs[0] == 0
    assert out[0, : olens[0]].tobytes() == data


def test_frame_roundtrip_tpu_backend(tpu):
    """End-to-end frame compress/decompress through the device kernels
    (independent blocks -> batched Pallas path; chained -> streaming
    dictionary decoder)."""
    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings

    rng = random.Random(31)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(40)]
    data = (
        b" ".join(rng.choice(words) for _ in range(40_000))[:150_000]
        + bytes(30_000)
        + rng.randbytes(20_000)
    )
    s_ind = EncoderSettings(
        chain_blocks=False, block_size=65536, content_checksum=True
    )
    blob = frame.compress(data, settings=s_ind, backend="tpu")
    assert frame.decompress(blob, backend="tpu") == data
    assert frame.decompress(blob, backend="host") == data  # interop

    s_chain = EncoderSettings(chain_blocks=True, block_size=65536)
    blob2 = frame.compress(data, settings=s_chain, backend="host")
    assert frame.decompress(blob2, backend="tpu") == data

    # chained device ENCODE: one batched streaming-kernel call with
    # per-block plaintext dictionaries — byte-identical to the host
    # FrameWriter's sequential dict-carry
    blob3 = frame.compress(data, settings=s_chain, backend="tpu")
    assert blob3 == blob2
    assert frame.decompress(blob3, backend="host") == data


def test_xxh32_kernel(tpu):
    from lz4_tpu.ops.xxh32_pallas import xxh32_blocks
    from lz4_tpu.xxh32 import xxh32

    rng = random.Random(25)
    datas = [rng.randbytes(n) for n in (16, 1024, 8192)]
    cap = 8192
    bufs = np.zeros((3, cap), np.uint8)
    lens = np.zeros((3,), np.int32)
    for i, d in enumerate(datas):
        bufs[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    got = xxh32_blocks(bufs, lens)
    for i, d in enumerate(datas):
        assert int(got[i]) & 0xFFFFFFFF == xxh32(d), i


def test_block_api_tpu_backend_one_shots(tpu):
    """Round 4: explicit backend="tpu" one-shots ride the production
    Pallas kernels on real hardware — staged (<= 64 KB bucket), streaming
    (above), and the dictionary variants — byte-identical to the host
    canonical/dense engines."""
    import lz4_tpu
    from lz4_tpu import native
    from lz4_tpu.block import hostref

    rng = random.Random(91)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]

    def wordy(n):
        return b" ".join(rng.choice(words) for _ in range(n))[:n]

    small = wordy(3000)
    c = lz4_tpu.encode(small, backend="tpu")
    assert c == hostref.encode_fast_canonical(small, 1)
    assert lz4_tpu.decode(c, len(small), backend="tpu") == small

    big = wordy(100000)
    c = lz4_tpu.encode(big, backend="tpu")
    assert c == hostref.encode_fast_canonical(big, 1)
    assert lz4_tpu.decode(c, len(big), backend="tpu") == big

    if native.available():
        dict_ = wordy(4000)
        data = dict_[-1500:] + b"-NEW-" + dict_[:800]
        c = lz4_tpu.encode(data, dictionary=dict_, backend="tpu")
        assert c == native.encode(data, 0, dictionary=dict_,
                                  geometry="dense")
        assert lz4_tpu.decode(
            c, len(data), dictionary=dict_, backend="tpu"
        ) == data


def test_streaming_dict_encode_on_hardware(tpu):
    """Dictionary-mode streaming ENCODE under real Mosaic codegen (the
    chained-frame batch path): flat [dict | src] prefix with per-block
    src_off, byte-identical to the host engines' dense dict family."""
    from lz4_tpu import native
    from lz4_tpu.ops.encode_pallas_stream import encode_blocks_pallas_stream

    rng = random.Random(47)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]

    def wordy(n):
        return b" ".join(rng.choice(words) for _ in range(n))[:n]

    cap, dw = 8192, 65536
    cases = [(wordy(3000), wordy(cap)), (b"", wordy(cap))]
    bufs = np.zeros((len(cases), cap), np.uint8)
    lens = np.zeros((len(cases),), np.int32)
    dicts = np.zeros((len(cases), dw), np.uint8)
    dls = np.zeros((len(cases),), np.int32)
    for k, (d, s) in enumerate(cases):
        bufs[k, : len(s)] = np.frombuffer(s, np.uint8)
        lens[k] = len(s)
        if d:
            dicts[k, dw - len(d):] = np.frombuffer(d, np.uint8)
        dls[k] = len(d)
    out, clens, errs = encode_blocks_pallas_stream(
        bufs, lens, cap, 0, dicts=dicts, dict_lens=dls
    )
    assert not np.asarray(errs).any()
    for k, (d, s) in enumerate(cases):
        ref = native.encode(s, 0, dictionary=d, geometry="dense")
        assert out[k, : clens[k]].tobytes() == ref, k


def test_streaming_encode_residency_redo_on_hardware(tpu):
    """Round 5: the raw candidate-verify's stale-exit + ensured-redo path
    under REAL Mosaic codegen (interpret-mode coverage lives in
    test_pallas_encode_stream).  stale_test=True makes the residency
    oracle lie for ~1/256 positions; bytes must match the host canonical
    engine exactly."""
    import jax.numpy as jnp

    from lz4_tpu import native
    from lz4_tpu.ops.encode_pallas_stream import pallas_encode_stream

    rng = random.Random(77)
    bcap = 131072
    words = [rng.randbytes(rng.randint(3, 9)) for _ in range(25)]
    d = (
        b" ".join(rng.choice(words) for _ in range(30_000))[: bcap - 20_000]
        + rng.randbytes(20_000)
    )
    bufs = np.zeros((1, bcap), np.uint8)
    bufs[0, : len(d)] = np.frombuffer(d, np.uint8)
    out, meta = pallas_encode_stream(
        jnp.asarray(bufs), jnp.asarray([len(d)], jnp.int32), bcap, 0,
        stale_test=True,
    )
    meta = np.asarray(meta).reshape(-1, 8)
    assert int(meta[0, 1]) == 0
    words_out = np.ascontiguousarray(np.asarray(out).reshape(1, -1))
    comp = words_out.view(np.uint8)[0, : int(meta[0, 0])].tobytes()
    assert comp == native.encode(d, 0), "stale-redo path diverged"
