"""Legacy (lz4net) format tests — analog of the reference's
K4os.Compression.LZ4.Legacy.Tests: wrap/unwrap roundtrips, chunked stream
roundtrips (fast + HC, random write sizes), and golden interop vectors from
the reference's regression assets (assets/issue64: a real lz4net-produced
blob) decoded through the legacy chunk walker."""

import io
import os
import struct

import pytest

from lz4_tpu import legacy
from lz4_tpu.block.hostref import LZ4Error


def test_wrap_roundtrip(corpus):
    for name, data in corpus.items():
        for w in (legacy.wrap, legacy.wrap_hc):
            blob = w(data, backend="host")
            assert legacy.unwrap(blob, backend="host") == data, name


def test_wrap_header_layout(lorem, rng):
    data = lorem(10000, rng)
    blob = legacy.wrap(data, backend="host")
    original, stored = struct.unpack_from("<II", blob, 0)
    assert original == len(data)
    assert stored == len(blob) - 8
    assert stored < original  # compressible


def test_wrap_incompressible_stored(rng):
    data = rng.randbytes(300)
    blob = legacy.wrap(data, backend="host")
    assert blob[8:] == data


def test_wrap_empty():
    assert legacy.wrap(b"") == bytes(8)
    assert legacy.unwrap(bytes(8)) == b""


def test_wrap_corrupted():
    with pytest.raises(LZ4Error):
        legacy.unwrap(b"\x01\x02\x03")
    with pytest.raises(LZ4Error):
        # payload shorter than the stored length claims
        legacy.unwrap(struct.pack("<II", 1, 9) + b"1234")


def test_stream_roundtrip(corpus):
    for name, data in corpus.items():
        for hc in (False, True):
            blob = legacy.encode(data, high_compression=hc, backend="host")
            assert legacy.decode(blob, backend="host") == data, (name, hc)


def test_stream_random_chunks(lorem, rng):
    data = lorem(200_000, rng)
    sink = io.BytesIO()
    w = legacy.LegacyStreamWriter(sink, block_size=30_000, backend="host")
    i = 0
    while i < len(data):
        n = rng.randint(1, 8191)
        w.write(data[i : i + n])
        i += n
    w.close()
    r = legacy.LegacyStreamReader(io.BytesIO(sink.getvalue()), backend="host")
    out = bytearray()
    while True:
        chunk = r.read(rng.randint(1, 4099))
        if not chunk:
            break
        out += chunk
    assert bytes(out) == data


REF_ASSETS = "/root/reference/assets/issue64"


@pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS), reason="reference assets not mounted"
)
def test_interop_third_party_chained_blocks():
    """Decode a third-party-encoder blob (the reference's regression asset is
    a chained block container) through the block API with dict carry."""
    from lz4_tpu.block import api as block_api

    with open(os.path.join(REF_ASSETS, "input.dat"), "rb") as f:
        blob = f.read()
    with open(os.path.join(REF_ASSETS, "output.dat"), "rb") as f:
        expected = f.read()
    pos = 20
    out = bytearray()
    last = b""
    while pos < len(blob) and blob[pos : pos + 4] != b"bv4$":
        usize, csize = struct.unpack("<II", blob[pos + 4 : pos + 12])
        body = blob[pos + 12 : pos + 12 + csize]
        last = block_api.decode(
            body, target_length=usize, dictionary=last, backend="host"
        )
        out += last
        pos += 12 + csize
    assert bytes(out) == expected


def test_legacy_stream_bounds_crafted_chunk_lengths():
    """Round-5 review: a tiny crafted stream must not trigger a huge
    allocation — impossible expansion ratios and multi-GB chunk claims
    fail fast (the frame reader's allocation-amplification analog)."""
    import io
    import struct

    from lz4_tpu.block.hostref import LZ4Error
    from lz4_tpu.legacy.stream import LegacyStreamReader, _write_varint

    def varint(v):
        buf = io.BytesIO()
        _write_varint(buf, v)
        return buf.getvalue()

    # compressed chunk claiming a 2^40 original from 10 stored bytes
    blob = varint(0x03) + varint(1 << 40) + varint(10) + b"x" * 10
    with pytest.raises(LZ4Error, match="expansion|sanity"):
        LegacyStreamReader(io.BytesIO(blob)).read()
    # stored (uncompressed) chunk claiming 2 GiB: flags 0x00
    blob2 = varint(0x00) + varint(1 << 31) + b"x" * 8
    with pytest.raises(LZ4Error, match="sanity"):
        LegacyStreamReader(io.BytesIO(blob2)).read()


def test_wrap_unwrap_tolerates_stored_longer_than_original():
    """Reference LZ4Wrapper.Unwrap returns the stored payload whenever
    stored >= original (LZ4Wrapper.cs:130-136); tolerant producers may
    emit stored > original and we must accept it like the reference."""
    import struct

    from lz4_tpu import legacy

    payload = b"123456789"
    blob = struct.pack("<II", 5, len(payload)) + payload
    assert legacy.unwrap(blob) == payload
