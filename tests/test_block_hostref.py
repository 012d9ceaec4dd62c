"""Scalar host codec: roundtrips at every level, dictionary mode, partial
decode, malformed-input rejection, and decode of reference-produced golden
blocks (read-only fixtures under /root/reference/assets, skipped if absent)."""

import os
import random
import struct

import pytest

from lz4_tpu.block import hostref
from lz4_tpu.block.api import decode, encode, partial_decode
from lz4_tpu.constants import LZ4Level, compress_bound

LEVELS = [0, 3, 6, 9, 10, 12]


def _roundtrip(data: bytes, level: int, dictionary: bytes = b"") -> bytes:
    comp = encode(data, level=level, dictionary=dictionary, backend="host")
    assert len(comp) <= compress_bound(len(data))
    return decode(comp, target_length=len(data), dictionary=dictionary, backend="host")


@pytest.mark.parametrize("level", LEVELS)
def test_roundtrip_corpus(corpus, level):
    for name, data in corpus.items():
        got = _roundtrip(data, level)
        assert got == data, (name, level)


@pytest.mark.parametrize("level", LEVELS)
def test_roundtrip_random_sizes(level, rng):
    for _ in range(20):
        n = rng.randint(0, 2000)
        data = rng.randbytes(n) if rng.random() < 0.5 else bytes(
            rng.choice(b"abcd") for _ in range(n)
        )
        assert _roundtrip(data, level) == data


@pytest.mark.parametrize("level", [0, 9, 12])
def test_dictionary_roundtrip(level, rng, lorem):
    dictionary = lorem(5000, rng)
    data = lorem(8000, rng)
    comp_nodict = encode(data, level=level, backend="host")
    comp_dict = encode(data, level=level, dictionary=dictionary, backend="host")
    # dictionary must help on self-similar text
    assert len(comp_dict) <= len(comp_nodict)
    assert (
        decode(comp_dict, len(data), dictionary=dictionary, backend="host") == data
    )


def test_compression_ratio_ladder(lorem, rng):
    data = lorem(50000, rng)
    sizes = {}
    for level in [0, 3, 9, 12]:
        sizes[level] = len(encode(data, level=level, backend="host"))
    assert sizes[0] < len(data)
    assert sizes[3] <= sizes[0]
    assert sizes[9] <= sizes[3]
    assert sizes[12] <= sizes[9]


def test_incompressible_expands_within_bound(rng):
    data = rng.randbytes(4096)
    comp = encode(data, level=0, backend="host")
    assert len(comp) <= compress_bound(len(data))
    assert decode(comp, len(data), backend="host") == data


def test_empty_block():
    comp = encode(b"", level=0, backend="host")
    assert comp == b"\x00"
    assert decode(comp, 0, backend="host") == b""


def test_partial_decode(lorem, rng):
    data = lorem(10000, rng)
    comp = encode(data, level=0, backend="host")
    for cut in [0, 1, 100, 5000, 9999]:
        assert partial_decode(comp, cut, backend="host") == data[:cut]


def test_target_capacity():
    data = b"x" * 1000
    comp = encode(data, level=0, backend="host")
    assert encode(data, level=0, target_capacity=len(comp), backend="host") == comp
    assert encode(data, level=0, target_capacity=len(comp) - 1, backend="host") is None


@pytest.mark.parametrize(
    "bad",
    [
        b"",  # empty
        b"\xf0",  # literal run past end
        b"\x10a\x00\x00",  # offset 0
        b"\x10a\xff\xff",  # offset beyond window
        b"\x1fa",  # truncated extended literal length
    ],
)
def test_malformed_rejected(bad):
    with pytest.raises(hostref.LZ4Error):
        hostref.decode_block(bad, 100)


def test_exact_known_encoding_decodes():
    # Hand-constructed LZ4 block: 'abcdabcdabcdab'
    # seq1: 4 literals 'abcd', match offset 4 len 9; seq2: final literal 'b'...
    # Build: token (4<<4)|(9-4)=0x45, 'abcd', offset 04 00, then final token
    # 0x10 with literal 'b'
    comp = bytes([0x45]) + b"abcd" + bytes([4, 0]) + bytes([0x10]) + b"b"
    assert hostref.decode_block(comp) == b"abcdabcdabcdab"


def test_overlap_match_decoding():
    # RLE via offset 1: token lit=1 'a', offset 1, matchlen 19 (nibble 15 + ext 0)
    comp = bytes([0x1F]) + b"a" + bytes([1, 0, 0]) + bytes([0x50]) + b"zzzzz"
    assert hostref.decode_block(comp) == b"a" * 20 + b"zzzzz"


REF_ASSETS = "/root/reference/assets/issue64"


@pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS), reason="reference assets not mounted"
)
def test_reference_golden_chained_blocks():
    """Decode real LZ4 blocks produced by another implementation (the
    reference's Issue64 regression asset): chained blocks with external
    dictionary. Validates interop of our decoder with foreign encoders."""
    with open(os.path.join(REF_ASSETS, "input.dat"), "rb") as f:
        blob = f.read()
    with open(os.path.join(REF_ASSETS, "output.dat"), "rb") as f:
        expected = f.read()
    chunk_start = 20
    out = bytearray()
    last = b""
    while chunk_start < 16384 and blob[chunk_start : chunk_start + 4] != b"bv4$":
        usize, csize = struct.unpack(
            "<II", blob[chunk_start + 4 : chunk_start + 12]
        )
        body = blob[chunk_start + 12 : chunk_start + 12 + csize]
        last = hostref.decode_block(body, usize, dictionary=last)
        out += last
        chunk_start += 12 + csize
    assert bytes(out) == expected
