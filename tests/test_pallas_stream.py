"""Streaming (ring-DMA) decoder tests — interpret mode on CPU.

`decode_pallas_stream` is the production TPU path for blocks above the
64 KB staged cap; this covers input-chunk crossings, output-ring wraps,
dictionary prefixes, and malformed inputs on a 300 KB block.
"""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu import native
from lz4_tpu.block import hostref
from lz4_tpu.ops import decode_pallas_stream as DS
from lz4_tpu.parallel.blocks import comp_capacity


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    DS.pallas_decode_stream.clear_cache()
    yield
    DS.pallas_decode_stream.clear_cache()


def _enc(d, lvl=0, dictionary=b""):
    if native.available():
        return native.encode(d, lvl, dictionary=dictionary)
    if lvl < 3:
        return hostref.encode_fast(d, dictionary)
    return hostref.encode_hc(d, dictionary, lvl)


def test_large_block_roundtrip(rng):
    """300 KB block: crosses ~5 input chunks and wraps the output ring
    twice; mixed content covers long literals, far and near matches."""
    n = 300_000
    data = (
        b"".join(
            rng.choice([b"alpha", b"beta", b"gamma", b"delta", b" "])
            for _ in range(40_000)
        )
        + rng.randbytes(60_000)
        + bytes(50_000)
        + (b"0123456789abcdef" * 4000)
    )[:n]
    c = _enc(data)
    cap = comp_capacity(n)
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : len(c)] = np.frombuffer(c, np.uint8)
    out, lens, errs = DS.decode_blocks_pallas_stream(
        comps, np.asarray([len(c)], np.int32), n
    )
    assert errs[0] == 0
    assert out[0, : lens[0]].tobytes() == data


def test_dictionary_prefix(rng):
    dict_bytes = rng.randbytes(30_000) * 3
    data = (
        dict_bytes[-20_000:] + b"XYZ" + rng.randbytes(5_000) + dict_bytes[:400]
    )
    c = _enc(data, dictionary=dict_bytes)
    n = 131072
    cap = comp_capacity(n)
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : len(c)] = np.frombuffer(c, np.uint8)
    dicts = np.zeros((1, 65536), np.uint8)
    dw = dict_bytes[-65536:]
    dicts[0, 65536 - len(dw):] = np.frombuffer(dw, np.uint8)
    out, lens, errs = DS.decode_blocks_pallas_stream(
        comps, np.asarray([len(c)], np.int32), n,
        dicts, np.asarray([len(dw)], np.int32),
    )
    assert errs[0] == 0
    assert out[0, : lens[0]].tobytes() == data


def test_full2v_mode_byte_identical(rng):
    """mode="full2v" (fast arm covers 1-extension-byte match VLE) must
    match the default mode byte-for-byte on FAST and HC/OPT streams,
    including VLE boundaries and ring wraps (150 KB blocks)."""
    n = 150_000
    base = (
        b"".join(
            rng.choice([b"lorem", b"ipsum", b"dolor", b"sit", b" "])
            for _ in range(25_000)
        )
        + b"E" * 300            # ml VLE boundary runs
        + rng.randbytes(20_000)
        + (b"0123456789abcdef" * 2000)
    )[:n]
    cap = comp_capacity(n)
    for lvl in (0, 9):
        c = _enc(base, lvl)
        comps = np.zeros((1, cap), np.uint8)
        comps[0, : len(c)] = np.frombuffer(c, np.uint8)
        clens = np.asarray([len(c)], np.int32)
        o_a, l_a, e_a = DS.decode_blocks_pallas_stream(comps, clens, n)
        o_b, l_b, e_b = DS.decode_blocks_pallas_stream(
            comps, clens, n, mode="full2v"
        )
        assert np.array_equal(e_a, e_b) and np.array_equal(l_a, l_b), lvl
        assert np.array_equal(o_a, o_b), lvl
        assert e_a[0] == 0 and o_a[0, : l_a[0]].tobytes() == base, lvl


def test_full2v_malformed_flagged():
    cap = comp_capacity(131072)
    bad = np.zeros((1, cap), np.uint8)
    bad[0, 0] = 0x4F  # fast-arm ml VLE with offset 0
    bad[0, 1:5] = ord("q")
    out, lens, errs = DS.decode_blocks_pallas_stream(
        bad, np.asarray([7], np.int32), 131072, mode="full2v"
    )
    assert errs[0] != 0


def test_malformed_flagged():
    cap = comp_capacity(131072)
    bad = np.zeros((1, cap), np.uint8)
    bad[0, 0] = 0x04
    bad[0, 1] = ord("q")
    bad[0, 2] = 0xFF
    bad[0, 3] = 0xFF
    out, lens, errs = DS.decode_blocks_pallas_stream(
        bad, np.asarray([5], np.int32), 131072
    )
    assert errs[0] != 0
