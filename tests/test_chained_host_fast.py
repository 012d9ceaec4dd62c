"""Fast chained-frame host paths: byte-identity with FrameWriter and
roundtrips through the zero-copy in-place-window codec."""

from __future__ import annotations

import random

import pytest

from lz4_tpu import frame
from lz4_tpu import native
from lz4_tpu.frame.api import (
    _try_host_chained_compress,
    _try_host_chained_decompress,
)
from lz4_tpu.frame.descriptor import DecoderSettings, EncoderSettings
from lz4_tpu.frame.header import LZ4FormatError

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable"
)


def _payload(n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        k = rng.randrange(4)
        if k == 0:
            out += rng.randbytes(rng.randrange(1, 400))
        elif k == 1:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 500)
        else:
            out += b"window carry across chained blocks " * rng.randrange(1, 20)
    return bytes(out[:n])


@pytest.mark.parametrize("level", [0, 9])
@pytest.mark.parametrize("block_size", [65536, 262144])
@pytest.mark.parametrize("checksums", [False, True])
def test_chained_fast_compress_identical_to_framewriter(
    level, block_size, checksums
):
    data = _payload(block_size * 3 + 12345, seed=level)
    s = EncoderSettings(
        chain_blocks=True,
        block_size=block_size,
        compression_level=level,
        content_checksum=checksums,
        block_checksum=checksums,
    )
    fast = _try_host_chained_compress(data, s, workers=4)
    assert fast is not None
    # sequential FrameWriter reference bytes (workers=0 disables fast paths)
    slow = frame.compress(data, settings=s, workers=0)
    assert fast == slow


def test_chained_fast_compress_with_content_length():
    data = _payload(200_000, seed=3)
    s = EncoderSettings(
        chain_blocks=True, content_length=len(data), content_checksum=True
    )
    fast = _try_host_chained_compress(data, s, workers=4)
    slow = frame.compress(data, settings=s, workers=0)
    assert fast == slow
    # content-length-aware decode path (exact uninitialized allocation)
    assert _try_host_chained_decompress(fast, DecoderSettings()) == data


@pytest.mark.parametrize("level", [0, 9])
def test_chained_fast_roundtrip_default_api(level):
    data = _payload(500_000, seed=10 + level)
    s = EncoderSettings(
        chain_blocks=True, compression_level=level, content_checksum=True
    )
    blob = frame.compress(data, settings=s)
    assert frame.decompress(blob) == data
    # and the sequential reader agrees
    assert frame.decompress(blob, workers=0) == data


def test_chained_fast_decode_stored_blocks():
    # incompressible chained payload: stored blocks still carry the window
    rng = random.Random(99)
    data = rng.randbytes(150_000) + b"A" * 70_000 + rng.randbytes(10_000)
    s = EncoderSettings(chain_blocks=True, block_size=65536)
    blob = frame.compress(data, settings=s, workers=0)
    got = _try_host_chained_decompress(blob, DecoderSettings())
    assert got == data


def test_chained_fast_decode_rejects_bad_content_checksum():
    data = _payload(200_000, seed=5)
    s = EncoderSettings(chain_blocks=True, content_checksum=True)
    blob = bytearray(frame.compress(data, settings=s, workers=0))
    blob[-1] ^= 0xFF  # corrupt the content checksum word
    with pytest.raises(LZ4FormatError):
        _try_host_chained_decompress(bytes(blob), DecoderSettings())


def test_chained_fast_decode_rejects_wrong_content_length():
    data = _payload(100_000, seed=6)
    s = EncoderSettings(chain_blocks=True, content_length=len(data))
    blob = bytearray(frame.compress(data, settings=s, workers=0))
    # lie about the content size (header byte 6..13 little-endian u64);
    # recompute the header checksum byte so only the LENGTH is wrong
    import struct

    from lz4_tpu.xxh32 import xxh32 as _x

    (clen,) = struct.unpack_from("<Q", blob, 6)
    struct.pack_into("<Q", blob, 6, clen - 1)
    blob[14] = (_x(bytes(blob[4:14])) >> 8) & 0xFF
    with pytest.raises(LZ4FormatError):
        _try_host_chained_decompress(bytes(blob), DecoderSettings())


def test_chained_fast_preset_dictionary_bails_to_reader():
    data = _payload(150_000, seed=7)
    s = EncoderSettings(chain_blocks=True)
    blob = frame.compress(data, settings=s, workers=0)
    assert (
        _try_host_chained_decompress(
            blob, DecoderSettings(dictionary=b"preset")
        )
        is None
    )


@pytest.mark.parametrize("chained", [False, True])
@pytest.mark.parametrize("checksum", [False, True])
def test_decompress_into_span_target(chained, checksum):
    """frame.decompress_into — span-target one-shot (reference
    `LZ4Frame.Decode(source, target)` analog)."""
    data = _payload(400_000, seed=21)
    s = EncoderSettings(
        chain_blocks=chained, content_checksum=checksum, block_size=65536
    )
    blob = frame.compress(data, settings=s)
    dst = bytearray(len(data) + 64)
    n = frame.decompress_into(blob, dst)
    assert n == len(data) and bytes(dst[:n]) == data


def test_decompress_into_too_small_raises():
    data = _payload(300_000, seed=22)
    blob = frame.compress(
        data, settings=EncoderSettings(chain_blocks=True)
    )
    with pytest.raises(Exception):
        frame.decompress_into(blob, bytearray(1000))


def test_decompress_into_multiframe_falls_back():
    data1 = _payload(100_000, seed=23)
    data2 = _payload(50_000, seed=24)
    blob = frame.compress(data1) + frame.compress(data2)
    dst = bytearray(len(data1) + len(data2))
    n = frame.decompress_into(blob, dst)
    assert bytes(dst[:n]) == data1 + data2


@pytest.mark.parametrize("chained", [False, True])
def test_compress_into_span_target(chained):
    data = _payload(300_000, seed=30)
    s = EncoderSettings(chain_blocks=chained, content_checksum=True)
    dst = bytearray(len(data) + len(data) // 100 + 4096)
    n = frame.compress_into(data, dst, settings=s)
    assert bytes(dst[:n]) == frame.compress(data, settings=s)
    assert frame.decompress(bytes(dst[:n])) == data


def test_compress_into_too_small_raises():
    data = _payload(100_000, seed=31)
    with pytest.raises(ValueError):
        frame.compress_into(data, bytearray(100))
