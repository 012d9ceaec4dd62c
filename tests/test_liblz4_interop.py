"""Cross-implementation interop against the canonical upstream liblz4.

The reference validates its frames against the canonical `lz4.exe` CLI
(reference `Streams.Tests/Internal/ReferenceLZ4.cs:9-47`,
`DecoderTests.cs:13-23`, `EncoderTests.cs`); this image carries the
canonical C library (liblz4 1.9.x) instead, which is a strictly stronger
oracle: block, dictionary, partial, and frame APIs in both directions.

Headline properties pinned here:
  * every block we emit (L0-L12) decodes bit-exact with canonical
    LZ4_decompress_safe, and vice versa;
  * our HC/OPT output (L3-L12) is BYTE-IDENTICAL to canonical
    LZ4_compress_HC — the clean-room engine reproduces the canonical
    parse exactly (the BASELINE "size <= reference per level" gate,
    proven at equality);
  * our FAST output is smaller than canonical (15-bit vs 12-bit table);
  * frames interop both directions across block sizes, chaining modes,
    and checksum flags.
"""

from __future__ import annotations

import random

import pytest

import lz4_tpu
from lz4_tpu import frame, native
from lz4_tpu.block import hostref
from lz4_tpu.frame.descriptor import EncoderSettings

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import liblz4

pytestmark = pytest.mark.skipif(
    liblz4.LIB is None, reason="system liblz4 not available"
)


def _mixed(n: int, seed: int = 5) -> bytes:
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        kind = rng.randrange(4)
        if kind == 0:
            out += rng.randbytes(rng.randrange(1, 200))
        elif kind == 1:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 300)
        elif kind == 2:
            word = rng.randbytes(rng.randrange(2, 9))
            out += word * rng.randrange(2, 40)
        else:
            out += b"the quick brown fox jumps over the lazy dog "
    return bytes(out[:n])


SAMPLES = {
    "mixed64k": _mixed(1 << 16),
    "mixed300k": _mixed(300_000, seed=6),
    "text": b"hello world, hello hello world again and again " * 800,
    "zeros": bytes(50_000),
    "random": random.Random(11).randbytes(20_000),
    "tiny": b"abc",
}


@pytest.mark.parametrize("level", [0, 3, 9, 12])
@pytest.mark.parametrize("name", sorted(SAMPLES))
def test_our_blocks_decode_with_canonical(name, level):
    data = SAMPLES[name]
    comp = native.encode(data, level)
    assert liblz4.decompress_block(comp, len(data)) == data


@pytest.mark.parametrize("level", [0, 9])
@pytest.mark.parametrize("name", sorted(SAMPLES))
def test_canonical_blocks_decode_with_ours(name, level):
    data = SAMPLES[name]
    comp = liblz4.compress_block(data, level)
    assert native.decode(comp, target_length=len(data)) == data
    assert hostref.decode_block(comp, target_length=len(data)) == data


@pytest.mark.parametrize("level", [3, 6, 9, 10, 12])
def test_hc_opt_bytes_identical_to_canonical(level):
    """The clean-room HC/OPT engines reproduce the canonical parse exactly
    (liblz4 1.9.x, same lineage as the reference's 1.9.2 port)."""
    for name, data in SAMPLES.items():
        if not data:
            continue
        ours = native.encode(data, level)
        theirs = liblz4.compress_block(data, level)
        assert ours == theirs, (name, level, len(ours), len(theirs))


@pytest.mark.parametrize("name", ["mixed64k", "text", "mixed300k"])
def test_fast_size_close_to_canonical(name):
    """FAST output need not match bytes (table geometry is a free choice).
    Ours trades a larger (15-bit) table for ratio: on Silesia-like mixes it
    compresses ~8% smaller than canonical (see bench.py / PERFORMANCE.md);
    on this adversarial random-heavy mix it must stay within 0.2%."""
    data = SAMPLES[name]
    ours = len(native.encode(data, 0))
    theirs = len(liblz4.compress_block(data, 0))
    assert ours <= theirs * 1.002 + 2


def test_fast_size_beats_canonical_on_bench_corpus():
    import bench

    data = bench.make_corpus(1 << 20, seed=3)
    # default geometry: canonical schedule -> byte-identical, equal size
    assert native.encode(data, 0) == liblz4.compress_block(data, 0)
    # dense geometry: the 15-bit table beats canonical's ratio (~8%)
    ours = len(native.encode(data, 0, geometry="dense"))
    theirs = len(liblz4.compress_block(data, 0))
    assert ours < theirs * 0.95  # measured ~8% smaller


def test_fast_canonical_byte_identity_fuzz():
    """Default FAST is byte-identical to canonical LZ4_compress_default on
    structured fuzz across the byU16/byU32 table boundary."""
    import random

    rng = random.Random(424242)
    for trial in range(8):
        n = rng.choice([40, 5000, 65500, 65547, 70000, 200000])
        parts = []
        total = 0
        while total < n:
            k = rng.randrange(4)
            if k == 0:
                piece = bytes([rng.randrange(256)]) * rng.randrange(1, 200)
            elif k == 1:
                piece = rng.randbytes(rng.randrange(1, 300))
            elif k == 2:
                piece = b"abcdefgh"[: rng.randrange(1, 8)] * rng.randrange(1, 50)
            else:
                piece = bytes(rng.randrange(32) for _ in range(rng.randrange(1, 80)))
            parts.append(piece)
            total += len(piece)
        data = b"".join(parts)[:n]
        assert native.encode(data, 0) == liblz4.compress_block(data, 0), trial


def test_partial_decode_matches_canonical():
    data = SAMPLES["mixed64k"]
    comp = native.encode(data, 0)
    for target in (0, 1, 100, 5000, len(data)):
        theirs = liblz4.decompress_block_partial(comp, target, len(data))
        ours = native.decode(comp, target_length=target, partial=True)
        assert ours == theirs == data[:target]


@pytest.mark.parametrize("level", [0, 9])
def test_dictionary_interop_both_directions(level):
    dictionary = _mixed(40_000, seed=77)
    data = _mixed(30_000, seed=78)
    # ours encode+dict -> canonical decode+dict
    ours = native.encode(data, level, dictionary=dictionary)
    assert (
        liblz4.decompress_block_with_dict(ours, len(data), dictionary) == data
    )
    # canonical encode+dict -> our decoders
    theirs = liblz4.compress_block_with_dict(data, dictionary, level)
    assert (
        native.decode(theirs, target_length=len(data), dictionary=dictionary)
        == data
    )
    assert (
        hostref.decode_block(
            theirs, target_length=len(data), dictionary=dictionary
        )
        == data
    )


@pytest.mark.parametrize("level", [3, 9, 12])
def test_dictionary_hc_bytes_identical_to_canonical(level):
    dictionary = _mixed(65_536, seed=79)
    data = _mixed(50_000, seed=80)
    ours = native.encode(data, level, dictionary=dictionary)
    theirs = liblz4.compress_block_with_dict(data, dictionary, level)
    assert ours == theirs


@pytest.mark.parametrize("independent", [False, True])
@pytest.mark.parametrize("content_checksum", [False, True])
def test_our_frames_decode_with_canonical(independent, content_checksum):
    data = _mixed(200_000, seed=13)
    settings = EncoderSettings(
        chain_blocks=not independent,
        content_checksum=content_checksum,
        block_checksum=independent,  # cover both flags across the matrix
        block_size=65536,
    )
    blob = frame.compress(data, settings=settings)
    assert liblz4.decompress_frame(blob, len(data)) == data


@pytest.mark.parametrize("block_size_id", [4, 5, 6, 7])
def test_canonical_frames_decode_with_ours(block_size_id):
    data = _mixed(600_000, seed=14)
    blob = liblz4.compress_frame(
        data,
        block_size_id=block_size_id,
        content_checksum=True,
        content_size=True,
    )
    assert frame.decompress(blob) == data


def test_canonical_linked_hc_frame_decodes_with_ours():
    data = _mixed(500_000, seed=15)
    blob = liblz4.compress_frame(
        data, level=9, independent=False, block_checksum=True
    )
    assert frame.decompress(blob) == data


def test_canonical_frame_roundtrips_through_frame_file_api(tmp_path):
    data = _mixed(120_000, seed=16)
    blob = liblz4.compress_frame(data, content_checksum=True)
    p = tmp_path / "c.lz4"
    p.write_bytes(blob)
    with frame.open(str(p), "rb") as f:
        assert f.read() == data


def test_block_api_roundtrip_vs_canonical_levels():
    """block-facade encode at every ladder level decodes with canonical."""
    data = SAMPLES["mixed64k"]
    for level in range(13):
        comp = lz4_tpu.encode(data, level=level, backend="host")
        assert liblz4.decompress_block(comp, len(data)) == data


def test_chained_continue_byte_identity_fuzz():
    """The canonical continue-schedule engine (both the C engine and its
    pure-python twin) is byte-identical to upstream
    LZ4_compress_fast_continue over linked blocks of one contiguous
    buffer, across block sizes and accelerations."""
    import random

    from lz4_tpu.block.hostref import ChainedCanonicalEncoder

    rng = random.Random(77)
    for trial in range(6):
        n = rng.choice([40, 9000, 90000, 250000])
        bs = rng.choice([10, 4096, 16384, 65536])
        accel = rng.choice([1, 1, 3])
        data = _mixed(n, seed=7000 + trial)
        ref = liblz4.compress_blocks_continue(data, bs, accel)
        got = native.chained_canonical_blocks(data, bs, accel)
        assert got == ref, (trial, n, bs, accel, "native")
        if trial % 2 == 0:  # the python twin is slow; sample it
            enc = ChainedCanonicalEncoder(data)
            py = [
                enc.encode_block(off, min(bs, n - off), accel)
                for off in range(0, n, bs)
            ]
            assert py == ref, (trial, n, bs, accel, "python")


def test_chained_canonical_frame_matches_continue_stream():
    """frame.compress(chained, geometry="canonical") emits blocks
    byte-identical to LZ4_compress_fast_continue (stored blocks excepted —
    exactly when compressed >= raw — with stream-state continuity across
    them), and the frame decodes on our reader and canonical liblz4."""
    import io
    import struct

    import bench
    from lz4_tpu import frame
    from lz4_tpu.frame import header as H
    from lz4_tpu.frame.descriptor import EncoderSettings

    data = bench.make_corpus(1 << 20, seed=55)
    s = EncoderSettings(
        chain_blocks=True, block_size=65536, geometry="canonical",
        content_checksum=True,
    )
    blob = frame.compress(data, settings=s)
    assert frame.decompress(blob) == data
    assert liblz4.decompress_frame(blob, len(data)) == data
    ref = liblz4.compress_blocks_continue(data, 65536)
    bio = io.BytesIO(blob)
    H.parse_header(bio.read)
    pos = bio.tell()
    matched = 0
    for i, r in enumerate(ref):
        ln = struct.unpack("<I", blob[pos : pos + 4])[0]
        pos += 4
        size = ln & 0x7FFFFFFF
        payload = blob[pos : pos + size]
        pos += size
        if ln & 0x80000000:
            assert len(r) >= size, i  # stored iff compressed >= raw
        else:
            assert payload == r, i
            matched += 1
    assert matched >= len(ref) // 2

    # the streaming writer cannot provide the sequential stream state
    import pytest as _pytest

    with _pytest.raises(ValueError):
        frame.FrameWriter(io.BytesIO(), s)


def test_whole_frame_byte_identity_with_lz4f():
    """frame.compress output is byte-identical to LZ4F_compressFrame — the
    canonical lz4 frame API — across the level ladder (L0/L3/L9/L12) and
    BOTH block modes: independent frames at the default geometry, linked
    FAST frames via geometry="canonical", linked HC/OPT frames at any
    geometry (the per-block window rebuild coincides with
    LZ4_compress_HC_continue's stream state).  Covers LZ4F's single-block
    rules (independent flip + optimal block-size-ID shrink) and checksum
    flag combinations."""
    import random

    import bench
    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings

    rng = random.Random(9)
    for level in (0, 3, 9, 12):
        for chained in (False, True):
            for trial in range(4 if level else 8):
                n = rng.choice([0, 100, 40000, 65537, 300000, 1 << 20])
                if level >= 9 and n > 300000:
                    n = 300000  # keep HC/OPT runtime sane
                bsid, bs = rng.choice([(4, 65536), (5, 262144), (6, 1 << 20)])
                cs = rng.random() < 0.6
                bx = rng.random() < 0.3
                data = (
                    bench.make_corpus(n, seed=500 + trial)
                    if n >= 1024 else rng.randbytes(n)
                )
                ref = liblz4.compress_frame(
                    data, level=level, block_size_id=bsid,
                    independent=not chained,
                    content_checksum=cs, block_checksum=bx,
                )
                ours = frame.compress(data, settings=EncoderSettings(
                    chain_blocks=chained, block_size=bs,
                    compression_level=level,
                    content_checksum=cs, block_checksum=bx,
                    geometry="canonical" if (chained and level < 3) else "auto",
                ))
                assert ours == ref, (level, chained, trial, n, bs, cs, bx)
                if data:
                    assert frame.decompress(ours) == data
