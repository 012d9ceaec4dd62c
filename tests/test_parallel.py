"""Block-parallel sharding tests on the 8-virtual-device CPU mesh: the
single-chip and sharded multi-device paths must produce identical bytes
(the analog of the reference's 32/64-bit dual-engine equivalence tests,
SURVEY.md §4 implication iv)."""

import numpy as np
import pytest

import jax

from lz4_tpu.parallel import blocks as pb


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pb.make_mesh(jax.devices()[:8])


def test_encode_blocks_sharded_equals_single(mesh, lorem, rng):
    data = lorem(200_000, rng)
    single = pb.encode_blocks(data, block_size=16384, level=0)
    sharded = pb.encode_blocks(data, block_size=16384, level=0, mesh=mesh)
    assert single == sharded


def test_roundtrip_sharded(mesh, lorem, rng):
    data = lorem(150_000, rng)
    comp = pb.encode_blocks(data, block_size=16384, mesh=mesh)
    out = pb.decode_blocks(comp, 16384, total_length=len(data), mesh=mesh)
    assert out == data


def test_roundtrip_unsharded(lorem, rng):
    data = lorem(60_000, rng)
    comp = pb.encode_blocks(data, block_size=8192)
    assert pb.decode_blocks(comp, 8192, total_length=len(data)) == data


def test_uneven_tail_block(rng):
    data = bytes(rng.choice(b"xyz") for _ in range(10_000))
    comp = pb.encode_blocks(data, block_size=4096)
    assert pb.decode_blocks(comp, 4096) == data


def test_batch_padding_not_multiple_of_devices(mesh, lorem, rng):
    # 3 real blocks over 8 devices: padding rows must not corrupt output
    data = lorem(40_000, rng)
    comp = pb.encode_blocks(data, block_size=16384, mesh=mesh)
    assert len(comp) == 3
    assert pb.decode_blocks(comp, 16384, mesh=mesh) == data


def test_decode_error_surfaces(mesh):
    from lz4_tpu.block.hostref import LZ4Error

    # token: 1 literal then a match at offset 0 (invalid per format)
    bad = [b"\x10a\x00\x00\x00"]
    with pytest.raises(LZ4Error):
        pb.decode_blocks(bad, 4096)


def test_batch_bucketing_and_warmup(monkeypatch, rng):
    """Round 4: device batches pad to power-of-two buckets (bounding the
    per-shape executable count) with inert rows, and warmup_device walks
    the bucket ladder.  Results must be identical to the unbucketed
    host engines for every real row."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    from lz4_tpu import native
    from lz4_tpu.parallel import blocks as PB

    if not native.available():
        pytest.skip("native engine unavailable")
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setattr(PB, "_on_tpu", lambda: True)
    from lz4_tpu.ops import decode_pallas6 as D6
    from lz4_tpu.ops import encode_pallas5 as E5

    E5.pallas_encode5.clear_cache()
    D6.pallas_decode6.clear_cache()
    try:
        assert PB._bucket_batch(1) == 1
        assert PB._bucket_batch(3) == 4
        assert PB._bucket_batch(8) == 8
        words = [rng.randbytes(rng.randint(3, 8)) for _ in range(20)]
        datas = [
            b" ".join(rng.choice(words) for _ in range(800))[:4000]
            for _ in range(3)  # 3 -> bucket 4
        ]
        bcap = 4096
        bufs = np.zeros((3, bcap + 256), np.uint8)  # split_blocks pad tail
        lens = np.zeros((3,), np.int32)
        for k, d in enumerate(datas):
            bufs[k, : len(d)] = np.frombuffer(d, np.uint8)
            lens[k] = len(d)
        out, clens = PB.encode_blocks_device(bufs, lens, bcap, 0)
        assert out.shape[0] == 3 and clens.shape[0] == 3
        comps = np.zeros((3, PB.comp_capacity(bcap)), np.uint8)
        for k in range(3):
            assert out[k, : clens[k]].tobytes() == native.encode(datas[k], 0)
            comps[k, : clens[k]] = out[k, : clens[k]]
        dec, olens, errs = PB.decode_blocks_device(comps, clens, bcap)
        assert dec.shape[0] == 3 and not np.asarray(errs).any()
        for k, d in enumerate(datas):
            assert dec[k, : olens[k]].tobytes() == d
        assert PB.warmup_device(bcap, levels=(0,), max_blocks=2) == 2
    finally:
        E5.pallas_encode5.clear_cache()
        D6.pallas_decode6.clear_cache()


def test_dict_decode_routes_to_streaming_kernel(monkeypatch):
    """Round 5: dict-mode device decode defaults to the STREAMING decoder
    (constant SMEM footprint) — the staged dict variant sits near the 1 MB
    SMEM limit and is pinned behind LZ4TPU_STAGED_DICT_DECODE=1."""
    from lz4_tpu.ops import decode_pallas6 as D6
    from lz4_tpu.ops import decode_pallas_stream as DS

    calls = []

    def _fake(tag):
        def run(comps, clens, cap, dp=None, dlp=None, mode="x"):
            calls.append(tag)
            b = np.asarray(comps).shape[0]
            return (
                np.zeros((b, cap), np.uint8),
                np.zeros((b,), np.int64),
                np.zeros((b,), np.int64),
            )

        return run

    monkeypatch.setattr(pb, "_on_tpu", lambda: True)
    monkeypatch.setattr(D6, "decode_blocks_pallas6", _fake("staged"))
    monkeypatch.setattr(DS, "decode_blocks_pallas_stream", _fake("stream"))
    monkeypatch.delenv("LZ4TPU_STAGED_DICT_DECODE", raising=False)

    comps = np.zeros((1, 1024), np.uint8)
    clens = np.asarray([1], np.int32)
    dicts = np.zeros((1, 65536), np.uint8)
    dls = np.zeros((1,), np.int32)

    pb.decode_blocks_device(comps, clens, 4096, dicts, dls)
    assert calls == ["stream"], "dict batches must route to the ring decoder"

    monkeypatch.setenv("LZ4TPU_STAGED_DICT_DECODE", "1")
    pb.decode_blocks_device(comps, clens, 4096, dicts, dls)
    assert calls == ["stream", "staged"], "env knob re-enables staged dict"

    monkeypatch.delenv("LZ4TPU_STAGED_DICT_DECODE")
    pb.decode_blocks_device(comps, clens, 4096)
    assert calls[-1] == "staged", "no-dict small blocks stay staged"


def test_decode_blocks_mode_pick_ignores_pad_rows(monkeypatch):
    """Round-5 review: the fast-arm mode must be picked from the REAL
    rows' compressed ratio — 1-byte pad rows (nb=17 -> bucket 32) would
    dilute it below the 0.40 threshold and flip FAST batches to full2v."""
    from lz4_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    seen = {}

    def fake_device(comps, clens, cap, dicts=None, dls=None, mode=None):
        seen["mode"] = mode
        seen["nb"] = np.asarray(comps).shape[0]
        b = np.asarray(comps).shape[0]
        out = np.zeros((b, cap), np.uint8)
        olens = np.zeros((b,), np.int64)
        for k in range(b):
            blk = np.asarray(comps)[k, : int(np.asarray(clens)[k])]
            raw = native.decode(blk.tobytes(), capacity=cap)
            out[k, : len(raw)] = np.frombuffer(raw, np.uint8)
            olens[k] = len(raw)
        return out, olens, np.zeros((b,), np.int64)

    monkeypatch.setattr(pb, "decode_blocks_device", fake_device)
    # 17 FAST-ish blocks (ratio ~0.5): real ratio above the 0.40 threshold
    rng = np.random.default_rng(5)
    blocks, datas = [], []
    for k in range(17):
        d = (rng.bytes(2200) + b"the quick brown fox " * 120)[:3500]
        datas.append(d)
        blocks.append(native.encode(d, 0))
    ratio = sum(map(len, blocks)) / (17 * 4096)
    assert ratio >= 0.40, "fixture must be FAST-shaped"
    out = pb.decode_blocks(blocks, 4096)
    assert out == b"".join(datas)
    assert seen["nb"] == 32, "bucketed batch reaches the device layer"
    assert seen["mode"] == "full2", (
        "pad rows diluted the mode-pick ratio", seen
    )
