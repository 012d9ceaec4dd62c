"""Pallas xxh32 kernel vs the reference Python implementation."""

import functools
import random

import numpy as np
import pytest

from jax.experimental import pallas as pl

from lz4_tpu.xxh32 import xxh32
from lz4_tpu.ops import xxh32_pallas as XP


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    XP.pallas_xxh32.clear_cache()
    yield
    XP.pallas_xxh32.clear_cache()


def test_matches_reference(rng):
    cases = [
        b"", b"a", b"abc", bytes(15), bytes(16), bytes(17),
        rng.randbytes(100), rng.randbytes(1024), rng.randbytes(4097),
    ]
    cap = 4224
    bufs = np.zeros((len(cases), cap), np.uint8)
    lens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        bufs[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    got = XP.xxh32_blocks(bufs, lens)
    for i, d in enumerate(cases):
        assert int(got[i]) == xxh32(d), i
