"""Cross-backend fuzz: random structured data encoded by every encoder must
decode identically through every decoder (the analog of the reference's
32/64-bit dual-engine equivalence tests, SURVEY.md §4)."""

import random

import pytest

from lz4_tpu.block import hostref
from lz4_tpu.block import api as block_api
from lz4_tpu import native
from lz4_tpu.ops import decode_jax, encode_jax


def _random_structured(rng: random.Random, n: int) -> bytes:
    """Mixture of runs, copies, and noise that stresses parser edge cases."""
    out = bytearray()
    while len(out) < n:
        k = rng.randrange(6)
        if k == 0:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 300)
        elif k == 1:
            out += rng.randbytes(rng.randrange(1, 200))
        elif k == 2 and out:
            start = rng.randrange(len(out))
            out += bytes(out[start : start + rng.randrange(1, 400)])
        elif k == 3:
            out += b"abcdefgh"[: rng.randrange(1, 8)] * rng.randrange(1, 60)
        elif k == 4:
            out += bytes(rng.randrange(64) for _ in range(rng.randrange(1, 64)))
        else:
            out += b"\x00" * rng.randrange(1, 100)
    return bytes(out[:n])


ENCODERS = [
    ("hostref-fast", lambda d: hostref.encode_fast(d)),
    ("hostref-hc", lambda d: hostref.encode_hc(d, level=6)),
    ("hostref-opt", lambda d: hostref.encode_opt(d, level=12)),
    ("xla", lambda d: encode_jax.encode_block_bytes(d, level=0)),
]
if native.available():
    ENCODERS += [
        ("native-fast", lambda d: native.encode(d, 0)),
        ("native-hc", lambda d: native.encode(d, 9)),
    ]

DECODERS = [
    ("hostref", lambda c, n: hostref.decode_block(c, n)),
    ("xla", lambda c, n: decode_jax.decode_block_bytes(c, target_length=n)),
]
if native.available():
    DECODERS.append(("native", lambda c, n: native.decode(c, n)))


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_cross_backend(seed):
    rng = random.Random(seed)
    n = rng.choice([17, 333, 5000, 20000])
    data = _random_structured(rng, n)
    for ename, enc in ENCODERS:
        comp = enc(data)
        for dname, dec in DECODERS:
            assert dec(comp, n) == data, (seed, ename, dname)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_pallas_production_interpret(seed, monkeypatch):
    """The production scalar kernels (encode v5 / decode v6) against the
    oracle and each other, at FAST and HC levels."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    from lz4_tpu.ops import decode_pallas6 as D6
    from lz4_tpu.ops import encode_pallas5 as E5
    from lz4_tpu.parallel.blocks import comp_capacity

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    D6.pallas_decode6.clear_cache()
    E5.pallas_encode5.clear_cache()
    try:
        rng = random.Random(200 + seed)
        N = 4096
        data = _random_structured(rng, rng.choice([100, 2000, 4000]))
        bufs = np.zeros((1, N + 1024), np.uint8)
        bufs[0, : len(data)] = np.frombuffer(data, np.uint8)
        level = (0, 9)[seed % 2]
        out, clens, errs = E5.encode_blocks_pallas5(
            bufs, np.asarray([len(data)], np.int32), N, level
        )
        assert errs[0] == 0
        comp = out[0, : clens[0]].tobytes()
        # oracle cross-check
        assert hostref.decode_block(comp, len(data)) == data
        # v6 decoder on: v5-encoded, oracle-encoded, native-encoded streams
        streams = [comp, hostref.encode_hc(data, level=6)]
        if native.available():
            streams.append(native.encode(data, 12))
        cap = comp_capacity(N)
        for ci, c in enumerate(streams):
            comps = np.zeros((1, cap), np.uint8)
            comps[0, : len(c)] = np.frombuffer(c, np.uint8)
            dec6, lens6, derr6 = D6.decode_blocks_pallas6(
                comps, np.asarray([len(c)], np.int32), N
            )
            assert derr6[0] == 0 and lens6[0] == len(data), ci
            assert dec6[0, : lens6[0]].tobytes() == data, ci
    finally:
        D6.pallas_decode6.clear_cache()
        E5.pallas_encode5.clear_cache()


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_dictionary_cross_backend(seed):
    """Dictionary-mode parity: every host engine produces identical bytes
    with the same preset window, and every decoder recovers the data."""
    if not native.available():
        pytest.skip("native engine unavailable")
    rng = random.Random(1000 + seed)
    dict_ = _random_structured(rng, rng.choice([100, 4000, 66000]))
    data = _random_structured(rng, rng.choice([500, 8000]))
    for lvl, hfn in (
        (0, lambda d, dc: hostref.encode_fast(d, dc)),
        (6, lambda d, dc: hostref.encode_hc(d, dc, level=6)),
        (12, lambda d, dc: hostref.encode_opt(d, dc, level=12)),
    ):
        c_native = native.encode(data, lvl, dictionary=dict_)
        c_host = hfn(data, dict_)
        assert c_native == c_host, (seed, lvl)
        win = dict_[-65535 - 1:]
        assert hostref.decode_block(c_native, len(data), dictionary=win) \
            == data, (seed, lvl)
        assert native.decode(c_native, len(data), dictionary=win) \
            == data, (seed, lvl)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_corrupted_blocks_device_decoder(seed, monkeypatch):
    """Randomly corrupted compressed blocks through the production device
    decoder (interpret mode): every outcome must be a clean error flag or
    a decode result — never a crash, out-of-bounds index, or hang."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    from lz4_tpu.ops import decode_pallas6 as D6
    from lz4_tpu.parallel.blocks import comp_capacity

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    D6.pallas_decode6.clear_cache()
    rng = random.Random(7000 + seed)
    n = 4096
    data = _random_structured(rng, n)
    comp = bytearray(hostref.encode_fast(data))
    # flip a handful of random bytes (headers, offsets, lengths alike)
    for _ in range(rng.randrange(1, 6)):
        comp[rng.randrange(len(comp))] ^= 1 << rng.randrange(8)
    cap = comp_capacity(n)
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : len(comp)] = np.frombuffer(bytes(comp), np.uint8)
    clens = np.asarray([len(comp)], np.int32)
    out, olens, errs = D6.decode_blocks_pallas6(comps, clens, n)
    if errs[0] == 0:
        # the corruption happened to stay parseable: the produced length
        # must be in range (bytes may legitimately differ from `data`)
        assert 0 <= int(olens[0]) <= n
    D6.pallas_decode6.clear_cache()


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_streaming_canonical_byu32_interpret(seed, monkeypatch):
    """Round-4 coverage: the streaming kernel's canonical scan fuzzed with
    sizes straddling the byU16/byU32 limit (LZ4_64Klimit = 65547) in one
    batch — every block must be byte-identical to the host canonical
    engine and decode back through the oracle."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    from lz4_tpu.ops import encode_pallas_stream as ES

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    ES.pallas_encode_stream.clear_cache()
    try:
        rng = random.Random(9000 + seed)
        sizes = [
            rng.choice([65546, 65547, 65548]),
            rng.randrange(66000, 90000),
            rng.randrange(100, 60000),
        ]
        datas = [_random_structured(rng, sz) for sz in sizes]
        bcap = max(sizes)
        cap = -(-(bcap + 1024) // 1024) * 1024
        bufs = np.zeros((len(datas), cap), np.uint8)
        lens = np.zeros((len(datas),), np.int32)
        for k, d in enumerate(datas):
            bufs[k, : len(d)] = np.frombuffer(d, np.uint8)
            lens[k] = len(d)
        accel = rng.choice([1, 1, 3])
        out, clens, errs = ES.encode_blocks_pallas_stream(
            bufs, lens, bcap, 0, acceleration=accel
        )
        assert not np.asarray(errs).any()
        for k, d in enumerate(datas):
            got = out[k, : clens[k]].tobytes()
            assert got == hostref.encode_fast_canonical(d, accel), \
                (seed, k, len(d), accel)
            assert hostref.decode_block(got, len(d)) == d, (seed, k)
    finally:
        ES.pallas_encode_stream.clear_cache()


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_corrupted_blocks_streaming_decoder(seed, monkeypatch):
    """Round 5: the corrupted-block fuzz's analog for the RING-STREAMED
    decoder (the production route for >64 KB blocks and dict batches):
    random corruptions must yield a clean error flag or an in-range
    decode — never a crash, bad DMA, or hang."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    from lz4_tpu.ops import decode_pallas_stream as DS
    from lz4_tpu.parallel.blocks import comp_capacity

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    DS.pallas_decode_stream.clear_cache()
    try:
        rng = random.Random(11000 + seed)
        n = 100 * 1024  # forces the ring path (above the staged cap)
        data = _random_structured(rng, n)
        comp = bytearray(hostref.encode_fast(data))
        for _ in range(rng.randrange(1, 6)):
            comp[rng.randrange(len(comp))] ^= 1 << rng.randrange(8)
        cap = comp_capacity(n)
        comps = np.zeros((1, cap), np.uint8)
        comps[0, : len(comp)] = np.frombuffer(bytes(comp), np.uint8)
        clens = np.asarray([len(comp)], np.int32)
        for mode in ("full", "full2v"):
            out, olens, errs = DS.decode_blocks_pallas_stream(
                comps, clens, n, mode=mode
            )
            if errs[0] == 0:
                assert 0 <= int(olens[0]) <= n, (seed, mode)
    finally:
        DS.pallas_decode_stream.clear_cache()
