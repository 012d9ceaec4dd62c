"""Explicit backend="tpu" one-shot routing (round 4): on a real TPU the
block API routes to the production Pallas kernels (staged <= 64 KB,
streaming above, dictionary variants) instead of the XLA dense kernel.
Exercised here in interpret mode with the device gate faked."""

import functools

import numpy as np
import pytest
from jax.experimental import pallas as pl

import lz4_tpu
from lz4_tpu.block import hostref
from lz4_tpu import native
from lz4_tpu.parallel import blocks as PB


@pytest.fixture(autouse=True)
def _device(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(PB, "_on_tpu", lambda: True)
    from lz4_tpu.ops import decode_pallas6 as D6
    from lz4_tpu.ops import decode_pallas_stream as DS
    from lz4_tpu.ops import encode_pallas5 as E5
    from lz4_tpu.ops import encode_pallas_stream as ES

    for f in (E5.pallas_encode5, ES.pallas_encode_stream,
              D6.pallas_decode6, DS.pallas_decode_stream):
        f.clear_cache()
    yield
    for f in (E5.pallas_encode5, ES.pallas_encode_stream,
              D6.pallas_decode6, DS.pallas_decode_stream):
        f.clear_cache()


def _wordy(rng, n):
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    return b" ".join(rng.choice(words) for _ in range(n))[:n]


def test_small_block_staged_canonical(rng):
    data = _wordy(rng, 5000)
    comp = lz4_tpu.encode(data, backend="tpu")
    assert comp == hostref.encode_fast_canonical(data, 1)
    assert lz4_tpu.decode(comp, len(data), backend="tpu") == data


def test_big_block_streaming_canonical(rng):
    data = _wordy(rng, 90000) + rng.randbytes(9000)
    comp = lz4_tpu.encode(data, backend="tpu")
    assert comp == hostref.encode_fast_canonical(data, 1)
    assert lz4_tpu.decode(comp, len(data), backend="tpu") == data


def test_hc_level_and_acceleration(rng):
    if not native.available():
        pytest.skip("native engine unavailable")
    data = _wordy(rng, 9000)
    assert lz4_tpu.encode(data, level=9, backend="tpu") == native.encode(
        data, 9
    )
    assert lz4_tpu.encode(
        data, acceleration=4, backend="tpu"
    ) == hostref.encode_fast_canonical(data, 4)


def test_dictionary_roundtrip(rng):
    if not native.available():
        pytest.skip("native engine unavailable")
    dict_ = _wordy(rng, 4000)
    data = dict_[-1500:] + b"-NEW-" + dict_[:800]
    comp = lz4_tpu.encode(data, dictionary=dict_, backend="tpu")
    # dictionary batches use the dense schedule family (host parity)
    assert comp == native.encode(data, 0, dictionary=dict_, geometry="dense")
    assert lz4_tpu.decode(
        comp, len(data), dictionary=dict_, backend="tpu"
    ) == data


def test_decode_errors(rng):
    data = _wordy(rng, 3000)
    comp = bytearray(lz4_tpu.encode(data, backend="tpu"))
    with pytest.raises(hostref.LZ4Error):
        lz4_tpu.decode(bytes(comp), len(data) + 1, backend="tpu")
    comp[0] = 0xFF  # token demands literals beyond the stream
    with pytest.raises(hostref.LZ4Error):
        lz4_tpu.decode(bytes(comp[:4]), len(data), backend="tpu")


def test_capacity_decode(rng):
    data = _wordy(rng, 2000)
    comp = lz4_tpu.encode(data, backend="tpu")
    assert lz4_tpu.decode(comp, capacity=4096, backend="tpu") == data
    # `capacity` is a hard bound, not an allocation hint: a block that
    # decodes past it must raise (host semantics), even though the device
    # kernel decodes into a power-of-2-bucketed buffer
    with pytest.raises(hostref.LZ4Error):
        lz4_tpu.decode(comp, capacity=100, backend="tpu")
