"""Pallas decoder tests (interpret mode on CPU): correctness vs the scalar
oracle across data shapes, RLE overlap handling, malformed input."""

import functools
import random

import numpy as np
import pytest

from jax.experimental import pallas as pl

from lz4_tpu.block import hostref
from experiments import decode_pallas as DP


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    DP.pallas_decode.clear_cache()
    yield
    DP.pallas_decode.clear_cache()


def _decode(blobs, out_cap=4096, cap=8192):
    comps = np.zeros((len(blobs), cap), np.uint8)
    clens = np.zeros((len(blobs),), np.int32)
    for i, c in enumerate(blobs):
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    return DP.decode_blocks_pallas(comps, clens, out_cap)


def test_roundtrip_shapes(rng):
    cases = [
        b"hello world hello world hello!",
        bytes(2000),
        rng.randbytes(1500),
        (b"abcdefg" * 400)[:2800],
        b"a" * 4000,
        (b" ".join([b"lorem", b"ipsum", b"dolor"] * 300))[:4000],
        b"x",
        b"ab" * 1000,
    ]
    blobs = [hostref.encode_fast(d) for d in cases]
    out, lens, errs = _decode(blobs)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert lens[i] == len(d), i
        assert out[i, : len(d)].tobytes() == d, i


def test_hc_streams(rng):
    data = (b"the quick brown fox jumps over the lazy dog " * 60)[:2500]
    blobs = [hostref.encode_hc(data, level=9)]
    out, lens, errs = _decode(blobs)
    assert errs[0] == 0 and out[0, : len(data)].tobytes() == data


def test_malformed_flags():
    # offset 0
    out, lens, errs = _decode([b"\x10a\x00\x00\x00"])
    assert errs[0] != 0
    # truncated literal run
    out, lens, errs = _decode([b"\xf0abc"])
    assert errs[0] != 0
    # offset beyond window
    out, lens, errs = _decode([b"\x40abcd\xff\xff\x10a"])
    assert errs[0] != 0
