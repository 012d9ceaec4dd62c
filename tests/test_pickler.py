"""Pickler tests (analog of the reference's PicklingTests): roundtrips across
levels, stored fallback, size query, malformed input, and wire-format
compatibility vectors derived from the reference's V0 header layout."""

import pytest

from lz4_tpu import pickler


def test_roundtrip_corpus(corpus):
    for name, data in corpus.items():
        for level in (0, 9):
            blob = pickler.pickle(data, level=level, backend="host")
            assert pickler.unpickle(blob, backend="host") == data, (name, level)


def test_empty():
    assert pickler.pickle(b"") == b""
    assert pickler.unpickle(b"") == b""
    assert pickler.unpickled_size(b"") == 0


def test_incompressible_stored(rng):
    data = rng.randbytes(500)
    blob = pickler.pickle(data, backend="host")
    assert blob == b"\x00" + data  # V0 uncompressed header is a single 0 byte
    assert pickler.unpickle(blob, backend="host") == data


def test_unpickled_size(lorem, rng):
    data = lorem(10000, rng)
    blob = pickler.pickle(data, backend="host")
    assert pickler.unpickled_size(blob) == len(data)
    assert len(blob) < len(data)


def test_header_width_ladder(lorem):
    """diff < 256 -> 1 byte field (header 0x40), < 64k -> 2 (0x80), else 4
    (0xC0) — the reference's EffectiveSizeOf/EncodeSizeOf ladder."""
    import random

    small = pickler.pickle(b"ab" * 40, backend="host")
    assert small[0] == 0x40  # diff < 256 -> 1-byte field
    mid = pickler.pickle(b"ab" * 2000, backend="host")
    assert mid[0] == 0x80  # 256 <= diff <= 0xFFFF -> 2-byte field
    huge = pickler.pickle(bytes(1_000_000), backend="host")
    assert huge[0] == 0xC0  # diff > 0xFFFF -> 4-byte field


def test_malformed():
    with pytest.raises(pickler.PickleError):
        pickler.unpickle(b"\x01abc")  # version 1 unsupported
    with pytest.raises(pickler.PickleError):
        pickler.unpickle(b"\xc0\x01")  # truncated 4-byte diff field


def test_via_package_namespace(lorem, rng):
    import lz4_tpu

    data = lorem(5000, rng)
    assert lz4_tpu.unpickle(lz4_tpu.pickle(data)) == data


def test_pickle_into_roundtrip(lorem, rng):
    """Span-target overloads (reference LZ4Pickler.pickle.cs:155,
    unpickle.cs:100-107): bytes-written return, exact-size targets,
    negative/raise on too-small."""
    data = lorem(5000, rng)
    blob = pickler.pickle(data, backend="host")
    buf = bytearray(len(blob) + 16)
    n = pickler.pickle_into(data, buf, backend="host")
    assert n == len(blob) and bytes(buf[:n]) == blob

    out = bytearray(pickler.unpickled_size(blob))  # exact size
    m = pickler.unpickle_into(bytes(buf[:n]), out, backend="host")
    assert m == len(data) and bytes(out[:m]) == data

    # too-small targets: negative total (pickle), PickleError (unpickle)
    assert pickler.pickle_into(data, bytearray(4), backend="host") == -n
    with pytest.raises(pickler.PickleError):
        pickler.unpickle_into(blob, bytearray(len(data) - 1), backend="host")


def test_pickle_into_stored_and_empty(rng):
    raw = rng.randbytes(400)  # incompressible
    blob = pickler.pickle(raw, backend="host")
    assert blob[0] == 0  # stored
    out = bytearray(len(raw) + 8)
    assert pickler.unpickle_into(blob, out, backend="host") == len(raw)
    assert bytes(out[: len(raw)]) == raw
    assert pickler.unpickle_into(b"", out, backend="host") == 0


def test_corrupt_payload_raises_pickle_error():
    """Round-5 review: corruption surfaces as PickleError (the reference
    CorruptedPickle analog), not the inner block decoder's error type."""
    import numpy as np

    from lz4_tpu import pickler

    blob = pickler.pickle(b"abcdefgh" * 64)
    # replace the compressed payload with a literal-run overrun: the
    # decoder must fail, and the failure must surface as PickleError
    hdr = blob[:2]
    bad = hdr + b"\xff" * (len(blob) - 2)
    with pytest.raises(pickler.PickleError):
        pickler.unpickle(bad)
    with pytest.raises(pickler.PickleError):
        pickler.unpickle_into(bad, np.empty(4096, np.uint8))
