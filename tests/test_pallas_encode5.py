"""v5 (all-scalar packed-word) Pallas encoder tests — interpret mode on CPU.

v5 is the production TPU encode path (`parallel.blocks.encode_blocks_device`).
"""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu.block import hostref
from lz4_tpu.ops import encode_pallas5 as E5


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    E5.pallas_encode5.clear_cache()
    yield
    E5.pallas_encode5.clear_cache()


N = 4096
CAP = N + 1024


def _encode(cases, level=0, acceleration=1):
    bufs = np.zeros((len(cases), CAP), np.uint8)
    lens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        bufs[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    return E5.encode_blocks_pallas5(bufs, lens, N, level, acceleration)


def _cases(rng):
    return [
        b"hello world hello world hello!" * 10,
        bytes(3000),
        rng.randbytes(1500),
        (b"abcdefg" * 500)[:3400],
        b"a" * 4000,
        (b" ".join([b"lorem", b"ipsum", b"dolor", b"sit"] * 250))[:4000],
        b"x",
        b"ab" * 2000,
        bytes(range(256)) * 15,
        rng.randbytes(4000),  # incompressible -> long literal VLE
    ]


def test_fast_roundtrip_via_oracle(rng):
    cases = _cases(rng)
    out, clens, errs = _encode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        comp = out[i, : clens[i]].tobytes()
        assert hostref.decode_block(comp, len(d)) == d, i


def test_hc_roundtrip_and_ratio(rng):
    cases = _cases(rng)
    out0, l0, e0 = _encode(cases, level=0)
    out9, l9, e9 = _encode(cases, level=9)
    assert not e0.any() and not e9.any()
    for i, d in enumerate(cases):
        comp = out9[i, : l9[i]].tobytes()
        assert hostref.decode_block(comp, len(d)) == d, i
    # the chain search must never compress worse overall
    assert int(l9.sum()) <= int(l0.sum())


def test_acceleration(rng):
    data = (rng.randbytes(64) * 60)[:3500]
    out1, l1, e1 = _encode([data], acceleration=1)
    out9, l9, e9 = _encode([data], acceleration=32)
    assert e1[0] == 0 and e9[0] == 0
    assert l9[0] >= l1[0]
    for out, ln in ((out1, l1), (out9, l9)):
        assert hostref.decode_block(
            out[0, : ln[0]].tobytes(), len(data)
        ) == data


def test_fuzz_roundtrip(rng):
    cases = []
    for t in range(10):
        kind = t % 4
        if kind == 0:
            cases.append(rng.randbytes(rng.randint(1, 3000)))
        elif kind == 1:
            pat = rng.randbytes(rng.randint(1, 30))
            cases.append((pat * 4000)[: rng.randint(20, 3900)])
        elif kind == 2:
            cases.append(bytes(rng.randint(1, 3900)))
        else:
            words = [rng.randbytes(rng.randint(2, 9)) for _ in range(25)]
            cases.append(
                b"".join(rng.choice(words) for _ in range(500))[:3900]
            )
    for level in (0, 6):
        out, clens, errs = _encode(cases, level=level)
        for i, d in enumerate(cases):
            assert errs[i] == 0, (level, i)
            comp = out[i, : clens[i]].tobytes()
            assert hostref.decode_block(comp, len(d)) == d, (level, i)


def test_hc_byte_identical_to_oracle(rng):
    """The device HC implements the same wider-match + ML1/ML2/ML3
    lookahead algorithm as the host oracle (including pattern analysis at
    L9) and must produce BYTE-IDENTICAL output — three independent
    implementations (device kernel, python oracle, native C) of the
    reference HC agreeing byte-for-byte."""
    cases = _cases(rng) + [
        (b"abcabcabcabd" * 300)[:3500],
        rng.randbytes(64) * 60,
        b"".join(
            rng.choice([b"the ", b"quick ", b"brown ", b"fox "])
            for _ in range(800)
        )[:3500],
    ]
    for level in (3, 6, 9):
        out, clens, errs = _encode(cases, level=level)
        for i, d in enumerate(cases):
            assert errs[i] == 0, (level, i)
            comp = out[i, : clens[i]].tobytes()
            assert comp == hostref.encode_hc(d, level=level), (level, i)


def test_opt_byte_identical_to_oracle(rng):
    """The device optimal parse (L10-L12) runs the same exact price-model
    DP as the host oracle (and the native C engine) and must produce
    BYTE-IDENTICAL output across the ladder's top levels."""
    cases = _cases(rng)
    for level in (10, 12):
        out, clens, errs = _encode(cases, level=level)
        for i, d in enumerate(cases):
            assert errs[i] == 0, (level, i)
            comp = out[i, : clens[i]].tobytes()
            assert comp == hostref.encode_opt(d, level=level), (level, i)


def test_identity_large_wordy_block():
    """Regression: a ~26 KB wordy block (repeated short phrases + noise)
    that exposed two real divergences between the device kernel and the
    host engines — a 13-bit vs 15-bit hash-table geometry mismatch (FAST
    candidates differed from ~1 KB in) and chain_off being dropped after a
    chain-swap jump (the OPT search walked the wrong chain and missed a
    longer match near mf_limit).  Identity is asserted against the native
    engine across the ladder; sizes straddle the historic 25944 threshold."""
    from lz4_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    rng = random.Random(33)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    big = 131072
    d = (
        b" ".join(rng.choice(words) for _ in range(big))[: big // 2]
        + rng.randbytes(big // 4)
        + bytes(big // 4)
    )[:26200]
    n = len(d)
    cap = -(-(n + 256) // 128) * 128
    bufs = np.zeros((1, cap), np.uint8)
    bufs[0, :n] = np.frombuffer(d, np.uint8)
    lens = np.full((1,), n, np.int32)
    for level in (0, 9, 12):
        out, clens, errs = E5.encode_blocks_pallas5(bufs, lens, n, level)
        assert errs[0] == 0, level
        comp = out[0, : clens[0]].tobytes()
        assert comp == native.encode(d, level), level


def test_acceleration_identity_device():
    """The traced acceleration scalar drives the same skip schedule as
    the host engines: device FAST output is byte-identical at accel > 1."""
    from lz4_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    rng = random.Random(91)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    d = b" ".join(rng.choice(words) for _ in range(1200))[:N]
    bufs = np.zeros((1, CAP), np.uint8)
    bufs[0, : len(d)] = np.frombuffer(d, np.uint8)
    lens = np.asarray([len(d)], np.int32)
    for acc in (2, 8):
        out, clens, errs = E5.encode_blocks_pallas5(
            bufs, lens, N, 0, acceleration=acc
        )
        assert errs[0] == 0
        comp = out[0, : clens[0]].tobytes()
        assert comp == native.encode(d, 0, acceleration=acc), acc
