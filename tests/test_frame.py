"""Frame layer tests: roundtrips across settings (analog of the reference's
Streams.Tests roundtrip/checksum suites), header codec, skippable frames,
multi-frame streams, stream facade, error detection."""

import dataclasses
import io
import random
import struct

import pytest

from lz4_tpu import frame
from lz4_tpu.frame.descriptor import EncoderSettings
from lz4_tpu.frame.header import LZ4FormatError, build_header, parse_header
from lz4_tpu.xxh32 import xxh32


SETTINGS_MATRIX = [
    EncoderSettings(),
    EncoderSettings(chain_blocks=False),
    EncoderSettings(content_checksum=True),
    EncoderSettings(block_checksum=True),
    EncoderSettings(chain_blocks=False, content_checksum=True, block_checksum=True),
    EncoderSettings(block_size=256 * 1024),
    EncoderSettings(compression_level=9),
    EncoderSettings(chain_blocks=False, compression_level=12),
]


def test_header_roundtrip():
    for s in SETTINGS_MATRIX + [
        EncoderSettings(content_length=123456789),
        EncoderSettings(dictionary_id=0xDEADBEEF),
    ]:
        d = s.to_descriptor()
        hdr = build_header(d)
        info = parse_header(io.BytesIO(hdr).read)
        assert info.kind == "frame"
        got = info.descriptor
        assert got.block_chaining == d.block_chaining
        assert got.block_checksum == d.block_checksum
        assert got.content_checksum == d.content_checksum
        assert got.content_length == d.content_length
        assert got.dictionary_id == d.dictionary_id
        assert got.block_size_code == d.block_size_code


def test_header_checksum_detects_corruption():
    hdr = bytearray(build_header(EncoderSettings().to_descriptor()))
    hdr[4] ^= 0x04  # flip content-checksum flag
    with pytest.raises(LZ4FormatError):
        parse_header(io.BytesIO(bytes(hdr)).read)


def test_frame_roundtrip_matrix(corpus):
    for s in SETTINGS_MATRIX:
        for name, data in corpus.items():
            blob = frame.compress(data, settings=s, backend="host")
            out = frame.decompress(blob, backend="host")
            assert out == data, (name, s)


def test_frame_roundtrip_large_chained(lorem, rng):
    data = lorem(300_000, rng)
    blob = frame.compress(data, backend="host")
    assert frame.decompress(blob, backend="host") == data
    assert len(blob) < len(data) // 2


def test_frame_roundtrip_independent_parallel(lorem, rng):
    """Independent-block one-shot routes through the batched device path."""
    data = lorem(300_000, rng)
    s = EncoderSettings(chain_blocks=False, block_size=65536, content_checksum=True)
    blob = frame.compress(data, settings=s)
    assert frame.decompress(blob) == data


def test_content_size_written_and_honored(lorem, rng):
    data = lorem(10_000, rng)
    blob = frame.compress(data, store_size=True, backend="host")
    r = frame.FrameReader(io.BytesIO(blob), backend="host")
    assert r.frame_length() == len(data)
    assert r.read_all() == data

    # the writer refuses to close a frame whose declared size was not met
    s = EncoderSettings(content_length=len(data) + 1)
    w = frame.FrameWriter(io.BytesIO(), s, backend="host")
    w.write(data)
    with pytest.raises(ValueError):
        w.close()

    # a frame whose header lies about the content size (crafted by patching
    # the 8-byte size field + header checksum) must be rejected on decode
    from lz4_tpu.frame.header import _header_checksum

    patched = bytearray(blob)
    (wrong,) = struct.unpack_from("<Q", patched, 6)
    struct.pack_into("<Q", patched, 6, wrong + 1)
    patched[14] = _header_checksum(bytes(patched[4:14]))
    with pytest.raises(LZ4FormatError):
        frame.decompress(bytes(patched), backend="host")


def test_random_write_chunks_roundtrip(lorem, rng):
    """Randomized topup sizes (analog of reference FrameRountripTests)."""
    data = lorem(100_000, rng)
    sink = io.BytesIO()
    w = frame.FrameWriter(sink, EncoderSettings(block_size=65536), backend="host")
    i = 0
    while i < len(data):
        n = rng.randint(1, 9973)
        w.write(data[i : i + n])
        i += n
    w.close()
    assert frame.decompress(sink.getvalue(), backend="host") == data


def test_random_read_chunks_roundtrip(lorem, rng):
    data = lorem(100_000, rng)
    blob = frame.compress(data, backend="host")
    r = frame.FrameReader(io.BytesIO(blob), backend="host")
    out = bytearray()
    while True:
        chunk = r.read(rng.randint(1, 7919))
        if not chunk:
            break
        out += chunk
    assert bytes(out) == data


def test_slow_source_interactive(lorem, rng):
    """1-byte-at-a-time source (analog of FakeNetworkStream tests)."""

    class Slow:
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n):
            return self._b.read(min(1, n))

    data = lorem(5000, rng)
    blob = frame.compress(data, backend="host")
    r = frame.FrameReader(Slow(blob), backend="host")
    assert r.read_all() == data


def test_multi_frame_concatenation(lorem, rng):
    a, b = lorem(5000, rng), lorem(7000, rng)
    blob = frame.compress(a, backend="host") + frame.compress(b, backend="host")
    assert frame.decompress(blob, backend="host") == a + b


def test_skippable_frame():
    payload = b"user metadata"
    skip = struct.pack("<II", 0x184D2A50, len(payload)) + payload
    data = b"hello lz4 world" * 10
    blob = skip + frame.compress(data, backend="host")
    assert frame.decompress(blob, backend="host") == data


def test_skippable_frame_writer(lorem, rng):
    """`frame.skippable_frame` output is ignored by our reader at any
    position/nibble, and by the CANONICAL liblz4 frame decoder."""
    data = lorem(4000, rng)
    meta = frame.skippable_frame(b"app-metadata", nibble=7)
    blob = meta + frame.compress(data, backend="host") + \
        frame.skippable_frame(b"", nibble=15)
    assert frame.decompress(blob, backend="host") == data

    import liblz4

    if liblz4.LIB is not None:
        assert liblz4.decompress_frame(blob) == data

    with pytest.raises(ValueError):
        frame.skippable_frame(b"x", nibble=16)


def test_legacy_frame_decode():
    """lz4 CLI legacy format: magic 0x184C2102 + [u32 csize][block]*."""
    from lz4_tpu.block import api as block_api

    data = b"legacy format payload " * 100
    comp = block_api.encode(data, backend="host")
    blob = struct.pack("<I", 0x184C2102) + struct.pack("<I", len(comp)) + comp
    assert frame.decompress(blob, backend="host") == data


def test_block_checksum_detects_corruption(lorem, rng):
    data = lorem(5000, rng)
    s = EncoderSettings(block_checksum=True)
    blob = bytearray(frame.compress(data, settings=s, backend="host"))
    blob[12] ^= 0xFF  # flip a payload byte
    with pytest.raises((LZ4FormatError, Exception)):
        frame.decompress(bytes(blob), backend="host")


def test_content_checksum_detects_truncation(lorem, rng):
    data = lorem(5000, rng)
    s = EncoderSettings(content_checksum=True)
    blob = frame.compress(data, settings=s, backend="host")
    with pytest.raises(LZ4FormatError):
        frame.decompress(blob[:-2], backend="host")


def test_stream_facade_roundtrip(tmp_path, lorem, rng):
    data = lorem(50_000, rng)
    path = tmp_path / "x.lz4"
    with frame.open(path, "wb", backend="host") as f:
        for i in range(0, len(data), 1000):
            f.write(data[i : i + 1000])
    with frame.open(path, "rb", backend="host") as f:
        assert f.read() == data
    with frame.open(path, "rb", backend="host") as f:
        import io as _io

        buffered = _io.BufferedReader(f)
        assert buffered.read() == data


def test_invalid_magic_rejected():
    with pytest.raises(LZ4FormatError):
        frame.decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_empty_content_frame():
    blob = frame.compress(b"", backend="host")
    assert frame.decompress(blob, backend="host") == b""
    blob2 = frame.compress(
        b"", settings=EncoderSettings(content_checksum=True), backend="host"
    )
    assert frame.decompress(blob2, backend="host") == b""


def test_preset_dictionary_writer_reader(lorem, rng):
    """Writer-side preset dictionary pairs with FrameReader(dictionary=...)
    — a capability beyond the reference (which reserves but does not
    implement frame dictionaries)."""
    d = lorem(30_000, rng)
    data = d[:8000] + lorem(4000, rng)  # correlates with the dictionary
    sink = io.BytesIO()
    w = frame.FrameWriter(sink, EncoderSettings(), backend="host", dictionary=d)
    w.write(data)
    w.close()
    with_dict = sink.getvalue()
    plain = frame.compress(data, backend="host")
    assert len(with_dict) < len(plain)
    r = frame.FrameReader(io.BytesIO(with_dict), dictionary=d, backend="host")
    assert r.read_all() == data
    # stored-blocks frame must reject a dict-on-independent-blocks writer
    with pytest.raises(ValueError):
        frame.FrameWriter(
            io.BytesIO(), EncoderSettings(chain_blocks=False), dictionary=d
        )


def test_async_facades(lorem, rng):
    import asyncio

    from lz4_tpu.frame import aio

    data = lorem(30_000, rng)

    async def run():
        blob = await aio.compress(data, backend="host")
        out = await aio.decompress(blob, backend="host")
        return blob, out

    blob, out = asyncio.run(run())
    assert out == data

    class Sink:
        def __init__(self):
            self.parts = []

        async def write(self, b):
            self.parts.append(bytes(b))

    class Source:
        """Bounded async source: returns at most n bytes per pull and
        records each request so the test can assert incremental reads."""

        def __init__(self, data):
            self.data = data
            self.pos = 0
            self.requests = []

        async def read(self, n):
            self.requests.append(n)
            out = self.data[self.pos : self.pos + n]
            self.pos += len(out)
            return out

    async def run_stream():
        sink = Sink()
        async with aio.AsyncFrameWriter(sink, backend="host") as w:
            for i in range(0, len(data), 7000):
                await w.write(data[i : i + 7000])
        blob = b"".join(sink.parts)
        src = Source(blob)
        r = aio.AsyncFrameReader(src, backend="host")
        # incremental: reading a prefix must not consume the whole source
        head = await r.read(100)
        assert src.pos < len(blob)
        rest = await r.read(-1)
        # streaming pulls are block-sized, never a whole-stream slurp
        assert all(0 < n <= 4 * 1024 * 1024 + 8 for n in src.requests)
        return head + rest

    assert asyncio.run(run_stream()) == data


def test_host_parallel_matches_single_thread(lorem, rng):
    """The threaded independent-block path must produce byte-identical
    frames to the sequential writer path."""
    data = lorem(700_000, rng)
    s = EncoderSettings(
        chain_blocks=False, block_size=65536, content_checksum=True,
        block_checksum=True,
    )
    multi = frame.compress(data, settings=s, workers=4)
    single = frame.compress(data, settings=s, workers=0)
    assert multi == single
    assert frame.decompress(multi, workers=4) == data
    assert frame.decompress(multi, workers=0) == data


def test_legacy_then_modern_concatenation(lorem, rng):
    """A legacy frame has no end mark — the reader must re-dispatch on the
    next magic (reader._reenter_after_legacy) and keep decoding."""
    from lz4_tpu.block import api as block_api

    a = lorem(8000, rng)
    b = lorem(6000, rng)
    comp_a = block_api.encode(a, backend="host")
    legacy = struct.pack("<I", 0x184C2102) + struct.pack("<I", len(comp_a)) + comp_a
    modern = frame.compress(b, backend="host")
    skip = struct.pack("<II", 0x184D2A50, 4) + b"meta"
    blob = legacy + skip + modern
    assert frame.decompress(blob, backend="host") == a + b


def test_all_block_size_codes_roundtrip(lorem, rng):
    """Every frame BD code (64KB/256KB/1MB/4MB) roundtrips, independent and
    chained."""
    data = lorem(1_500_000, rng)
    for bs in (65536, 262144, 1 << 20, 4 << 20):
        for chain in (False, True):
            s = EncoderSettings(chain_blocks=chain, block_size=bs)
            blob = frame.compress(data, settings=s, backend="host")
            assert frame.decompress(blob, backend="host") == data, (bs, chain)


def test_read1_byte_budget(lorem, rng):
    """Interactive reads honor a byte budget without losing surplus
    (reference interactive-mode semantics: return once any bytes are
    ready, fill at most the caller's buffer)."""
    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings
    from lz4_tpu.frame.reader import FrameReader

    data = lorem(50_000, rng)
    blob = frame.compress(
        data, settings=EncoderSettings(block_size=65536, chain_blocks=False)
    )
    r = FrameReader(io.BytesIO(blob))
    got = bytearray()
    while True:
        chunk = r.read1(777)
        if not chunk:
            break
        assert len(chunk) <= 777
        got += chunk
    assert bytes(got) == data
    # mixed budgets: read1(n) surplus must remain available to read()
    r2 = FrameReader(io.BytesIO(blob))
    first = r2.read1(100)
    rest = r2.read(-1)
    assert first + rest == data


def test_roundtrip_with_serializer(tmp_path):
    """Reference RoundtripWithSerializer analog: a serializer writing
    straight through the frame stream object (here: stdlib pickle over
    frame.open), reading back through the same file-like surface."""
    import pickle as py_pickle

    from lz4_tpu import frame

    payload = {
        "rows": [{"id": i, "name": f"row-{i}", "data": bytes(i % 7)}
                 for i in range(5000)],
        "blob": b"x" * 100_000,
    }
    path = tmp_path / "obj.lz4"
    with frame.open(str(path), "wb") as f:
        py_pickle.dump(payload, f)
    with frame.open(str(path), "rb") as f:
        assert py_pickle.load(f) == payload


def test_frame_geometry_knob(lorem, rng):
    """EncoderSettings.geometry selects the FAST schedule family for
    independent-block frames: canonical (default, byte-parity with the
    lz4 CLI's one-shot blocks) vs dense (smaller output); both decode on
    every path and the knob round-trips through threaded and sequential
    writers identically."""
    from lz4_tpu.frame.descriptor import EncoderSettings

    data = lorem(300_000, rng) + rng.randbytes(100_000)
    sc = EncoderSettings(chain_blocks=False, block_size=65536)
    sd = EncoderSettings(
        chain_blocks=False, block_size=65536, geometry="dense"
    )
    bc = frame.compress(data, settings=sc, backend="host")
    bd = frame.compress(data, settings=sd, backend="host")
    assert bc != bd  # different (both valid) schedules; relative size is
    # payload-dependent (the corpus-level gates live in test_real_bytes)
    assert frame.decompress(bc, backend="host") == data
    assert frame.decompress(bd, backend="host") == data
    # threaded and sequential writers agree per geometry
    assert frame.compress(data, settings=sc, backend="host", workers=0) == bc
    assert frame.compress(data, settings=sd, backend="host", workers=0) == bd


def test_canonical_chain_guards(lorem, rng):
    """Explicit device requests cannot silently bypass the sequential
    canonical chained path, and HC canonical chains route through the
    normal engines (which already match HC_continue byte-for-byte)."""
    import pytest as _pytest

    from lz4_tpu.frame.descriptor import EncoderSettings

    data = lorem(300_000, rng)
    s = EncoderSettings(chain_blocks=True, geometry="canonical")
    with _pytest.raises(ValueError):
        frame.compress(data, settings=s, backend="tpu")
    # HC levels: no error on any routing, including the streaming writer
    s9 = EncoderSettings(
        chain_blocks=True, geometry="canonical", compression_level=9
    )
    blob = frame.compress(data, settings=s9, workers=0)
    assert frame.decompress(blob) == data


def test_workers_zero_is_single_threaded(monkeypatch):
    """Round-5 review: workers=0 must stay single-threaded on EVERY path,
    including the FrameWriter fallthrough whose block batches otherwise
    parallelize over the shared pool."""
    from lz4_tpu import frame, pool
    from lz4_tpu.frame.descriptor import EncoderSettings

    def boom(*a, **k):  # any pool use under workers=0 is a bug
        raise AssertionError("thread pool used despite workers=0")

    monkeypatch.setattr(pool, "map_all", boom)
    monkeypatch.setattr(pool, "shared_pool", boom)
    data = (b"threadless " * 40000)[: 5 * 65536]
    s = EncoderSettings(chain_blocks=False, block_size=65536)
    blob = frame.compress(data, settings=s, workers=0)
    assert frame.decompress(blob, workers=0) == data


def test_legacy_block_length_bounded():
    """Round-5 review: a crafted legacy stream with a huge length word
    must fail fast (allocation-amplification bound), like the non-legacy
    path — not buffer gigabytes from the source."""
    import struct

    from lz4_tpu.frame.header import LZ4FormatError
    from lz4_tpu.frame.reader import FrameReader

    blob = struct.pack("<II", 0x184C2102, 0x7F000000) + b"x" * 64
    r = FrameReader(io.BytesIO(blob))
    with pytest.raises(LZ4FormatError, match="legacy block length"):
        r.read_all()


def test_decompress_into_empty_frame():
    """Round-5 soak finding: an EMPTY frame (header + EndMark, zero
    blocks) crashed decompress_into with IndexError on the independent
    path (lens[-1] with no blocks).  Both block modes, both checksum
    flags, must return 0."""
    import numpy as np

    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings

    dst = np.empty(8, np.uint8)
    for chain in (False, True):
        for cs in (False, True):
            blob = frame.compress(
                b"",
                settings=EncoderSettings(
                    chain_blocks=chain, content_checksum=cs
                ),
            )
            assert frame.decompress(blob) == b""
            assert frame.decompress_into(blob, dst) == 0, (chain, cs)
