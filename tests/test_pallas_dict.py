"""Pallas decoder dictionary mode (interpret): chained blocks whose matches
reach into a preset 64KB window, mixed dict/no-dict batches, window-floor
violation detection.  Runs the production v6 decoder."""

import functools
import random

import numpy as np
import pytest

from jax.experimental import pallas as pl

from lz4_tpu.block import hostref
from lz4_tpu.ops import decode_pallas6 as D6


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    D6.pallas_decode6.clear_cache()
    yield
    D6.pallas_decode6.clear_cache()


def test_dict_decode_and_violation(rng):
    N, cap = 4096, 8192
    b1 = rng.randbytes(3000)  # incompressible alone
    b2 = b1[200:2200] + rng.randbytes(100)  # matches must reach the dict
    c2 = hostref.encode_fast(b2, dictionary=b1)
    c1 = hostref.encode_fast(b1)
    comps = np.zeros((2, cap), np.uint8)
    clens = np.zeros((2,), np.int32)
    comps[0, : len(c2)] = np.frombuffer(c2, np.uint8)
    clens[0] = len(c2)
    comps[1, : len(c1)] = np.frombuffer(c1, np.uint8)
    clens[1] = len(c1)
    dicts = np.zeros((2, 65536), np.uint8)
    dicts[0, 65536 - len(b1) :] = np.frombuffer(b1, np.uint8)
    dlens = np.asarray([len(b1), 0], np.int32)

    out, olens, errs = D6.decode_blocks_pallas6(comps, clens, N, dicts, dlens)
    assert errs[0] == 0 and errs[1] == 0
    assert out[0, : len(b2)].tobytes() == b2
    assert out[1, : len(b1)].tobytes() == b1

    # too-short window -> flagged, not garbage
    dlens_bad = np.asarray([100, 0], np.int32)
    _, _, errs2 = D6.decode_blocks_pallas6(comps, clens, N, dicts, dlens_bad)
    assert errs2[0] != 0


def test_chained_frame_device_path(monkeypatch, lorem, rng):
    """Chained frames route through the Pallas dict decoder when the device
    path is active (forced on here; pallas runs interpreted on CPU)."""
    from lz4_tpu import frame
    from lz4_tpu.parallel import blocks as pb

    monkeypatch.setattr(pb, "_use_pallas", lambda *a: True)
    data = lorem(200_000, rng)
    blob = frame.compress(data, backend="host")  # chained by default
    out = frame.decompress(blob, backend="tpu")
    assert out == data
