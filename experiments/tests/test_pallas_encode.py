"""Pallas encoder tests (interpret mode on CPU): valid LZ4 output across data
shapes, parity with the native greedy algorithm, roundtrip through both the
oracle and the Pallas decoder."""

import functools
import random

import numpy as np
import pytest

from jax.experimental import pallas as pl

from lz4_tpu.block import hostref
from experiments import encode_pallas as EP
from experiments import decode_pallas as DP
from lz4_tpu.parallel.blocks import comp_capacity


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    EP.pallas_encode.clear_cache()
    DP.pallas_decode.clear_cache()
    yield
    EP.pallas_encode.clear_cache()
    DP.pallas_decode.clear_cache()


N = 4096
CAP = N + 1024


def _encode(cases):
    bufs = np.zeros((len(cases), CAP), np.uint8)
    lens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        bufs[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    return EP.encode_blocks_pallas(bufs, lens, N)


def test_roundtrip_via_oracle(rng):
    cases = [
        b"hello world hello world hello!",
        bytes(3000),
        rng.randbytes(1500),
        (b"abcdefg" * 500)[:3400],
        b"a" * 4000,
        (b" ".join([b"lorem", b"ipsum", b"dolor", b"sit"] * 250))[:4000],
        b"x",
        b"ab" * 2000,
        bytes(range(256)) * 15,
    ]
    out, clens, errs = _encode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        comp = out[i, : clens[i]].tobytes()
        assert hostref.decode_block(comp, len(d)) == d, i


def test_empty_block():
    out, clens, errs = _encode([b""])
    assert errs[0] == 0
    assert out[0, : clens[0]].tobytes() == b"\x00"


def test_matches_native_greedy(rng):
    """Same greedy algorithm (hash probe + skip + back-extension) as the
    native C codec: identical compressed sizes on typical data."""
    from lz4_tpu import native

    if not native.available():
        pytest.skip("no native codec")
    cases = [
        (b" ".join([b"alpha", b"beta", b"gamma"] * 300))[:4000],
        b"z" * 3000,
        (b"0123456789abcdef" * 250)[:3900],
    ]
    out, clens, errs = _encode(cases)
    for i, d in enumerate(cases):
        assert clens[i] == len(native.encode(d, 0)), i


def test_pallas_encode_decode_roundtrip(rng):
    data = (b" ".join([b"round", b"trip", b"data"] * 280))[:3500]
    out, clens, errs = _encode([data])
    assert errs[0] == 0
    cap = comp_capacity(N)
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : clens[0]] = out[0, : clens[0]]
    dec, lens, derr = DP.decode_blocks_pallas(
        comps, np.asarray([clens[0]], np.int32), N
    )
    assert derr[0] == 0
    assert dec[0, : len(data)].tobytes() == data
