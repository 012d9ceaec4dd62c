"""Vectorized (XLA) block kernels vs the scalar oracle: encode/decode
roundtrips, cross-implementation checks, dictionary mode, malformed input."""

import os
import random
import struct

import pytest

from lz4_tpu.block import hostref
from lz4_tpu.ops import decode_jax, encode_jax


def test_decode_matches_oracle(corpus):
    for name, data in corpus.items():
        if not data:
            continue
        for comp in (
            hostref.encode_fast(data),
            hostref.encode_hc(data, level=9),
        ):
            got = decode_jax.decode_block_bytes(comp, target_length=len(data))
            assert got == data, name


def test_encode_roundtrips_via_oracle(corpus):
    for name, data in corpus.items():
        comp = encode_jax.encode_block_bytes(data, level=0)
        if not data:
            assert comp == b"\x00"
            continue
        assert hostref.decode_block(comp, len(data)) == data, name


def test_encode_decode_self_roundtrip(rng):
    for sz in [1, 13, 100, 4096, 65536]:
        data = bytes(rng.choice(b"abcdefgh") for _ in range(sz))
        comp = encode_jax.encode_block_bytes(data, level=0)
        assert decode_jax.decode_block_bytes(comp, target_length=sz) == data


def test_encode_not_worse_than_oracle_fast(corpus):
    """Exact-word nearest-previous candidates dominate single-probe hashing:
    vectorized FAST should never be significantly worse than the oracle's
    greedy FAST."""
    for name, data in corpus.items():
        if len(data) < 64:
            continue
        vec = len(encode_jax.encode_block_bytes(data, level=0))
        ref = len(hostref.encode_fast(data))
        assert vec <= ref * 1.02 + 8, (name, vec, ref)


def test_dictionary_mode(lorem, rng):
    d = lorem(5000, rng)
    data = lorem(8000, rng)
    comp = encode_jax.encode_block_bytes(data, level=0, dictionary=d)
    nodict = encode_jax.encode_block_bytes(data, level=0)
    assert len(comp) <= len(nodict)
    assert hostref.decode_block(comp, len(data), dictionary=d) == data
    assert (
        decode_jax.decode_block_bytes(comp, target_length=len(data), dictionary=d)
        == data
    )


def test_level_ladder_monotone(lorem, rng):
    data = lorem(20000, rng)
    prev = None
    for lvl in (0, 3, 6, 9):
        c = len(encode_jax.encode_block_bytes(data, level=lvl))
        if prev is not None:
            assert c <= prev + 16, lvl
        prev = c


def test_decoder_rejects_malformed():
    for bad in [b"\xf0", b"\x10a\x00\x00", b"\x10a\xff\xff", b"\x1fa"]:
        with pytest.raises(hostref.LZ4Error):
            decode_jax.decode_block_bytes(bad, target_length=100)


REF_ASSETS = "/root/reference/assets/issue64"


@pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS), reason="reference assets not mounted"
)
def test_vectorized_decoder_on_reference_golden():
    """The vectorized decoder must decode blocks produced by a third-party
    encoder (the reference's regression asset), including chained external
    dictionaries."""
    with open(os.path.join(REF_ASSETS, "input.dat"), "rb") as f:
        blob = f.read()
    with open(os.path.join(REF_ASSETS, "output.dat"), "rb") as f:
        expected = f.read()
    chunk_start = 20
    out = bytearray()
    last = b""
    while chunk_start < 16384 and blob[chunk_start : chunk_start + 4] != b"bv4$":
        usize, csize = struct.unpack("<II", blob[chunk_start + 4 : chunk_start + 12])
        body = blob[chunk_start + 12 : chunk_start + 12 + csize]
        last = decode_jax.decode_block_bytes(
            body, target_length=usize, dictionary=last
        )
        out += last
        chunk_start += 12 + csize
    assert bytes(out) == expected
