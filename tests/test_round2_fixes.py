"""Round-2 hardening tests: ADVICE findings, footguns, and reference issue
replications (assets/issue72, assets/issue76)."""

import io
import struct

import pytest

from lz4_tpu import frame
from lz4_tpu.block import api as block_api
from lz4_tpu.frame.descriptor import DecoderSettings, EncoderSettings
from lz4_tpu.frame.header import LZ4FormatError


def test_scan_rejects_oversized_block_length(lorem, rng):
    """A crafted length word above the block-size limit must raise
    LZ4FormatError, not reach the decoders (ADVICE frame/api.py:227)."""
    data = lorem(200_000, rng)
    s = EncoderSettings(chain_blocks=False, block_size=65536)
    blob = bytearray(frame.compress(data, settings=s, backend="host"))
    # first block's length word sits right after the 7-byte header
    hdr_len = 7
    struct.pack_into("<I", blob, hdr_len, 0x00FFFFFF)  # 16 MB "compressed"
    with pytest.raises(LZ4FormatError):
        frame.decompress(bytes(blob), backend="host", workers=4)
    with pytest.raises(LZ4FormatError):
        frame.decompress(bytes(blob), backend="host", workers=0)


def test_decode_without_hint_grows_not_preallocates():
    """decode() with no target/capacity must still handle high-expansion
    blocks (grow-on-overflow) and reject malformed ones."""
    # a megabyte of zeros compresses to a few dozen bytes -> ~20,000x
    # smaller input; decoding without a hint must still recover it
    raw = bytes(1 << 20)
    comp = block_api.encode(raw, backend="host")
    assert len(comp) < 5000
    out = block_api.decode(comp, backend="host")
    assert out == raw


def test_extra_memory_batching_identical_output(lorem, rng):
    """extra_memory (extra buffered blocks) must not change the frame
    bytes, only the batching."""
    data = lorem(500_000, rng)
    base = EncoderSettings(chain_blocks=False, block_size=65536)
    extra = EncoderSettings(
        chain_blocks=False, block_size=65536, extra_memory=4 * 65536
    )
    sink_a, sink_b = io.BytesIO(), io.BytesIO()
    wa = frame.FrameWriter(sink_a, base, backend="host")
    wb = frame.FrameWriter(sink_b, extra, backend="host")
    for i in range(0, len(data), 30_000):
        wa.write(data[i : i + 30_000])
        wb.write(data[i : i + 30_000])
    wa.close()
    wb.close()
    assert sink_a.getvalue() == sink_b.getvalue()
    assert frame.decompress(sink_b.getvalue(), backend="host") == data


def test_decoder_extra_memory_read_ahead(lorem, rng):
    data = lorem(300_000, rng)
    s = EncoderSettings(chain_blocks=False, block_size=65536)
    blob = frame.compress(data, settings=s, backend="host")
    r0 = frame.FrameReader(io.BytesIO(blob), backend="host")
    first_plain = r0.read1()
    r1 = frame.FrameReader(
        io.BytesIO(blob), backend="host", extra_memory=2 * 65536
    )
    first_ahead = r1.read1()
    assert len(first_ahead) >= len(first_plain)
    assert first_ahead + r1.read_all() == data
    # settings path
    out = frame.decompress(
        blob, settings=DecoderSettings(extra_memory=131072), backend="host"
    )
    assert out == data


def test_acceleration_device_kernels(monkeypatch):
    """acceleration must reach the Pallas FAST kernel: higher acceleration
    skips harder -> output no smaller, still roundtrips."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    from lz4_tpu.ops import encode_pallas5 as e5

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    e5.pallas_encode5.clear_cache()
    rng = np.random.default_rng(7)
    chunk = rng.integers(0, 255, 512, dtype=np.uint8)
    raw = np.tile(chunk, 8)  # repetitive -> plenty of matches
    bcap = 4096
    bufs = np.zeros((1, bcap + 1024), np.uint8)
    bufs[0, : raw.size] = raw
    lens = np.asarray([raw.size], np.int32)

    out1, l1, e1 = e5.encode_blocks_pallas5(bufs, lens, bcap, 0, acceleration=1)
    out9, l9, e9 = e5.encode_blocks_pallas5(bufs, lens, bcap, 0, acceleration=32)
    e5.pallas_encode5.clear_cache()
    assert not e1[0] and not e9[0]
    assert l9[0] >= l1[0]  # more skipping -> no better compression
    for out, ln in ((out1, l1), (out9, l9)):
        dec = block_api.decode(
            bytes(out[0, : int(ln[0])]), backend="host", capacity=bcap
        )
        assert dec == raw.tobytes()


def test_issue72_repeated_chunk_compresses(rng):
    """Reference assets/issue72: a 64 KB buffer of one repeated 256-byte
    random chunk must compress (ratio well below 1)."""
    import numpy as np

    chunk = bytes(np.random.default_rng(0).integers(0, 256, 256, dtype=np.uint8))
    data = chunk * 256  # 65536 bytes
    for s in (
        EncoderSettings(),
        EncoderSettings(chain_blocks=False, block_size=65536),
    ):
        blob = frame.compress(data, settings=s, backend="host")
        assert len(blob) / len(data) < 0.10, len(blob)
        assert frame.decompress(blob, backend="host") == data


def test_issue76_legacy_large_stream_roundtrip(lorem, rng):
    """Reference assets/issue76: lz4net legacy stream over a large payload
    (multi-chunk) must roundtrip bit-exact."""
    from lz4_tpu.legacy import stream as legacy_stream

    data = lorem(3_000_000, rng)
    sink = io.BytesIO()
    w = legacy_stream.LegacyStreamWriter(sink)
    # write in awkward chunk sizes to exercise the varint chunk framing
    for i in range(0, len(data), 700_001):
        w.write(data[i : i + 700_001])
    w.close()
    r = legacy_stream.LegacyStreamReader(io.BytesIO(sink.getvalue()))
    out = r.read(-1)
    assert out == data


def test_frame_reader_peek(lorem, rng):
    """peek returns decoded bytes without consuming (reference Peek)."""
    data = lorem(100_000, rng)
    blob = frame.compress(data, backend="host")
    r = frame.FrameReader(io.BytesIO(blob), backend="host")
    head = r.peek(100)
    assert head == data[:100]
    assert r.peek(100) == head  # idempotent
    assert r.read_all() == data  # nothing consumed


def test_encode_decode_into(rng):
    """Caller-buffer overloads (reference Span-target Encode/Decode)."""
    import lz4_tpu

    data = (b"span overload parity " * 500) + rng.randbytes(300)
    dest = bytearray(lz4_tpu.maximum_output_size(len(data)))
    n = lz4_tpu.encode_into(data, dest, level=9)
    assert n > 0
    comp = bytes(dest[:n])
    back = bytearray(len(data))
    m = lz4_tpu.decode_into(comp, back)
    assert m == len(data) and bytes(back) == data
    # too-small destination: negative length (encode) / typed error (decode)
    small = bytearray(8)
    assert lz4_tpu.encode_into(data, small) < 0
    from lz4_tpu.block.hostref import LZ4Error

    with pytest.raises(LZ4Error):
        lz4_tpu.decode_into(comp, small)


def test_frame_corruption_fuzz(lorem, rng):
    """Random single-byte corruptions of checksummed frames: every mutation
    must either raise a typed LZ4FormatError/LZ4Error or (for bytes the
    format genuinely cannot protect, e.g. inside skippable content) decode
    to something — never crash with an unrelated exception."""
    import random as _random

    from lz4_tpu.block.hostref import LZ4Error

    data = lorem(80_000, rng)
    s = EncoderSettings(
        chain_blocks=False, block_size=16384,
        content_checksum=True, block_checksum=True,
    )
    blob = bytearray(frame.compress(data, settings=s, backend="host"))
    mut = _random.Random(77)
    outcomes = {"error": 0, "ok": 0}
    for _ in range(60):
        pos = mut.randrange(len(blob))
        old = blob[pos]
        blob[pos] ^= 1 + mut.randrange(255)
        try:
            out = frame.decompress(bytes(blob), backend="host", workers=0)
            assert out == data  # only possible if the flip was a no-op path
            outcomes["ok"] += 1
        except (LZ4FormatError, LZ4Error, ValueError):
            outcomes["error"] += 1
        finally:
            blob[pos] = old
    # with both checksums on, essentially every corruption is caught
    assert outcomes["error"] >= 55, outcomes


def test_encode_into_zero_copy_path(rng):
    """With compress_bound room, encode_into writes the caller's buffer
    via the native zero-copy path — byte-identical to encode(); small
    buffers still report the needed size as a negative length."""
    import lz4_tpu
    from lz4_tpu import native
    from lz4_tpu.constants import compress_bound

    if not native.available():
        pytest.skip("native engine unavailable")
    d = (b"spam eggs " * 800 + rng.randbytes(1500))[:8000]
    for lvl in (0, 9, 12):
        buf = bytearray(compress_bound(len(d)))
        rc = lz4_tpu.encode_into(d, buf, level=lvl)
        assert bytes(buf[:rc]) == native.encode(d, lvl), lvl
        small = bytearray(4)
        assert lz4_tpu.encode_into(d, small, level=lvl) == -rc, lvl


def test_tar_of_chunks_roundtrip(rng, tmp_path):
    """Reference `TarTests` analog: a tar of random-sized member files
    compressed through the frame stream facade and recovered intact via
    the standard tarfile module on both ends."""
    import io
    import tarfile

    from lz4_tpu import frame

    members = {}
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for k in range(12):
            name = f"chunk{k:02}.bin"
            payload = (
                rng.randbytes(rng.randint(0, 3000))
                + b"lorem ipsum " * rng.randint(0, 200)
            )
            members[name] = payload
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    raw_tar = buf.getvalue()

    path = tmp_path / "archive.tar.lz4"
    with frame.open(str(path), "wb") as f:
        # random-sized writes exercise the writer's topup batching
        pos = 0
        while pos < len(raw_tar):
            step = rng.randint(1, 100_000)
            f.write(raw_tar[pos : pos + step])
            pos += step
    with frame.open(str(path), "rb") as f:
        recovered = f.read()
    assert recovered == raw_tar
    with tarfile.open(fileobj=io.BytesIO(recovered)) as tf:
        for name, payload in members.items():
            assert tf.extractfile(name).read() == payload


def test_issue96_frame_size_estimation_roundtrip():
    """Reference Issue96 analog (Streams.Tests/Issue96.cs): a frame
    compressed once yields an exact size estimate; compress_into a buffer
    of exactly that size reproduces the same bytes, and the worst-case
    bound (19 + blocks * (4 + compress_bound + 4) + 8) always suffices."""
    from lz4_tpu import compress_bound, frame

    for length in (1337, 0x10000):
        data = (b"lorem ipsum dolor sit amet " * 3000)[:length]
        blob = frame.compress(data)
        expected = len(blob)
        buf = bytearray(expected)
        n = frame.compress_into(data, buf)
        assert n == expected
        assert bytes(buf[:n]) == blob
        assert expected <= 19 + (4 + compress_bound(len(data)) + 4) + 8
        # too-small destination raises, never truncates
        import pytest as _pytest

        with _pytest.raises(ValueError):
            frame.compress_into(data, bytearray(8))
