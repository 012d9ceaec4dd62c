"""Fuzz for the archived round-1 vector kernels (moved from the default
suite when the kernels were archived; see experiments/__init__.py)."""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu.block import hostref
from lz4_tpu.parallel.blocks import comp_capacity

from experiments import decode_pallas as DP
from experiments import encode_pallas as EP


def _random_structured(rng: random.Random, n: int) -> bytes:
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


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_pallas_v1_interpret(seed, monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    DP.pallas_decode.clear_cache()
    EP.pallas_encode.clear_cache()
    try:
        rng = random.Random(100 + seed)
        N = 4096
        data = _random_structured(rng, rng.choice([100, 2000, 4000]))
        bufs = np.zeros((1, N + 1024), np.uint8)
        bufs[0, : len(data)] = np.frombuffer(data, np.uint8)
        out, clens, errs = EP.encode_blocks_pallas(
            bufs, np.asarray([len(data)], np.int32), N
        )
        assert errs[0] == 0
        comp = out[0, : clens[0]].tobytes()
        assert hostref.decode_block(comp, len(data)) == data
        cap = comp_capacity(N)
        comps = np.zeros((1, cap), np.uint8)
        comps[0, : len(comp)] = np.frombuffer(comp, np.uint8)
        dec, lens, derr = DP.decode_blocks_pallas(
            comps, np.asarray([len(comp)], np.int32), N
        )
        assert derr[0] == 0
        assert dec[0, : len(data)].tobytes() == data
    finally:
        DP.pallas_decode.clear_cache()
        EP.pallas_encode.clear_cache()
