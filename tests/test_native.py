"""Native (C) host codec tests: cross-validation against the scalar oracle
and the vectorized kernels, xxh32 equivalence, error paths."""

import random

import pytest

from lz4_tpu.block import hostref
from lz4_tpu.xxh32 import XXH32
from lz4_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler available"
)


def test_roundtrip_all_levels(corpus):
    for name, data in corpus.items():
        if not data:
            continue
        for lvl in (0, 3, 6, 9, 12):
            comp = native.encode(data, lvl)
            assert native.decode(comp, len(data)) == data, (name, lvl)
            assert hostref.decode_block(comp, len(data)) == data, (name, lvl)


def test_decodes_oracle_output(corpus):
    for name, data in corpus.items():
        if not data:
            continue
        for comp in (hostref.encode_fast(data), hostref.encode_hc(data, level=6)):
            assert native.decode(comp, len(data)) == data, name


def test_dictionary_roundtrip(lorem, rng):
    d = lorem(5000, rng)
    data = lorem(20000, rng)
    for lvl in (0, 9):
        comp = native.encode(data, lvl, dictionary=d)
        nodict = native.encode(data, lvl)
        assert len(comp) <= len(nodict)
        assert native.decode(comp, len(data), dictionary=d) == data
        assert hostref.decode_block(comp, len(data), dictionary=d) == data


def test_partial_decode(lorem, rng):
    data = lorem(10000, rng)
    comp = native.encode(data, 0)
    for cut in (0, 1, 100, 9999, 10000):
        assert native.decode(comp, cut, partial=True) == data[:cut]


def test_hc_beats_fast(lorem, rng):
    data = lorem(50000, rng)
    fast = len(native.encode(data, 0))
    hc = len(native.encode(data, 9))
    assert hc <= fast


def test_acceleration_tradeoff(lorem, rng):
    data = lorem(50000, rng)
    a1 = len(native.encode(data, 0, acceleration=1))
    a8 = len(native.encode(data, 0, acceleration=8))
    assert a1 <= a8 + 64  # higher acceleration may not compress better


def test_malformed_rejected():
    for bad in (b"\x10a\x00\x00\x00", b"\xf0", b"\x10a\xff\xff"):
        with pytest.raises(hostref.LZ4Error):
            native.decode(bad, 100)


def test_xxh32_matches_python(rng):
    from lz4_tpu.xxh32 import xxh32 as xxh32_fn

    for n in (0, 1, 3, 15, 16, 17, 63, 1023, 1024, 65536):
        data = rng.randbytes(n)
        # the python scalar path (below the native cutoff) and native must
        # agree; force both
        py = xxh32_fn(data[:0] + data) if n < 1024 else None
        nat = native.xxh32(data)
        if py is not None:
            assert nat == py, n
        h = XXH32()
        for i in range(0, n, 7):
            h.update(data[i : i + 7])
        assert h.digest() == nat, n


def _liblz4():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import liblz4

    if liblz4.LIB is None:
        pytest.skip("system liblz4 not available")
    return liblz4


def test_overlap_copy_every_small_offset():
    """Pin the fixed-size overlap-copy paths (offsets 1-7 pattern
    replication, 8-15 dual-8B, 16+ wide strides) across match lengths
    that cross every stride boundary, on canonical-encoded streams
    (reference overlap semantics: `x64/LL64.dec.cs:408-425`)."""
    liblz4 = _liblz4()
    for off in range(1, 18):
        period = bytes(range(1, off + 1))
        for mlen in (4, 7, 8, 11, 12, 15, 16, 17, 18, 19, 31, 33, 67, 131):
            # unique prefix defeats self-matching inside the period run,
            # long tail keeps the match away from buffer-end guards
            raw = (
                b"\xAA<unique-prefix>" + period * (2 + (mlen + off) // off)
                + bytes((i * 7) % 251 for i in range(96))
            )
            comp = liblz4.compress_block(raw)
            out = native.decode(comp, target_length=len(raw))
            assert out == raw, (off, mlen)


def test_decode_matches_canonical_on_bench_corpus():
    """The native decoder and canonical liblz4 must agree byte-for-byte
    on both encoders' streams over the mixed bench corpus."""
    liblz4 = _liblz4()
    from bench import make_corpus

    data = make_corpus(1 << 20, seed=20260818)
    for stream in (native.encode(data, 0), liblz4.compress_block(data)):
        assert native.decode(stream, target_length=len(data)) == data
        assert liblz4.decompress_block(stream, len(data)) == data
