"""Streaming (ring + DMA) Pallas encoder tests — interpret mode on CPU.

The streaming wrapper runs the SAME `_encode_body` as the staged kernel,
so its output must be byte-identical to the staged kernel's at every
level.  These tests drive the ring machinery through its edges: input
chunk crossings (> 16 K positions), output-ring wrap + segment flushes
(> 64 KB of compressed output), and slot eviction (> 128 K positions).
"""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu.block import hostref
from lz4_tpu.ops import encode_pallas5 as E5
from lz4_tpu.ops import encode_pallas_stream as ES


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    E5.pallas_encode5.clear_cache()
    ES.pallas_encode_stream.clear_cache()
    yield
    E5.pallas_encode5.clear_cache()
    ES.pallas_encode_stream.clear_cache()


def _identity_case(data: bytes, bcap: int, level: int):
    cap = -(-(bcap + 1024) // 1024) * 1024
    bufs = np.zeros((1, cap), np.uint8)
    bufs[0, : len(data)] = np.frombuffer(data, np.uint8)
    lens = np.asarray([len(data)], np.int32)
    s_out, s_len, s_err = ES.encode_blocks_pallas_stream(
        bufs, lens, bcap, level
    )
    g_out, g_len, g_err = E5.encode_blocks_pallas5(bufs, lens, bcap, level)
    assert s_err[0] == 0 and g_err[0] == 0
    assert int(s_len[0]) == int(g_len[0]), (int(s_len[0]), int(g_len[0]))
    comp_s = s_out[0, : s_len[0]].tobytes()
    comp_g = g_out[0, : g_len[0]].tobytes()
    assert comp_s == comp_g, "stream != staged"
    if level < 3:
        # one-shot no-dict FAST is the canonical upstream schedule at ANY
        # block size (byU16 < 64 KB + 11, byU32 at/above)
        assert comp_s == hostref.encode_fast_canonical(data, 1), \
            "stream != host canonical"
    assert hostref.decode_block(comp_s, len(data)) == data
    return comp_s


def test_fast_identity_ring_wrap(rng):
    """80 KB mixed block: crosses 5 input chunks; the ~70 KB compressed
    stream wraps the 64 KB output ring and exercises mid-run flushes."""
    data = (
        (b" ".join([b"lorem", b"ipsum", b"dolor", b"sit"] * 400))[:12000]
        + rng.randbytes(60000)
        + bytes(8000)
    )
    _identity_case(data, 81920, 0)


def test_fast_identity_slot_eviction():
    """272 KB periodic block: 17 input chunks force slot eviction (> 8
    live slots) while candidates stay within the 64 KB window."""
    pat = bytes(range(48, 48 + 61))
    data = (pat * 5000)[: 272 * 1024]
    _identity_case(data, 272 * 1024, 0)


def test_fast_identity_long_literals_window(rng):
    """150 KB block whose 100 KB noise head forces a long-literal emit:
    copy_literals reloads old chunks (slot collisions with the trailing
    window), which is exactly the hazard that keeps candidate-verify
    reads on the ensured path in the windowed find loop.  Also crosses
    many probe windows mid-run."""
    data = (
        rng.randbytes(100 * 1024)
        + (b"the quick brown fox jumps over the lazy dog " * 800)[:36000]
        + rng.randbytes(17616)
    )
    _identity_case(data, 160 * 1024, 0)


def test_canonical_byu32_boundary_and_batch(rng):
    """The upstream byU16/byU32 selection edge (LZ4_64Klimit = 65547) and
    a mixed batch exercising the runtime table-mode cond: every block must
    be byte-identical to the host canonical engine (and so to upstream
    LZ4_compress_default)."""
    words = [rng.randbytes(rng.randint(3, 9)) for _ in range(40)]

    def wordy(n):
        return b" ".join(rng.choice(words) for _ in range(n * 2))[:n]

    datas = [wordy(65546), wordy(65547), wordy(30000), b"", wordy(100000)]
    bcap = 100000
    cap = -(-(bcap + 1024) // 1024) * 1024
    bufs = np.zeros((len(datas), cap), np.uint8)
    lens = np.zeros((len(datas),), np.int32)
    for k, d in enumerate(datas):
        bufs[k, : len(d)] = np.frombuffer(d, np.uint8)
        lens[k] = len(d)
    s_out, s_len, s_err = ES.encode_blocks_pallas_stream(bufs, lens, bcap, 0)
    assert not np.asarray(s_err).any()
    for k, d in enumerate(datas):
        got = s_out[k, : s_len[k]].tobytes()
        assert got == hostref.encode_fast_canonical(d, 1), (k, len(d))


def test_canonical_byu32_acceleration_and_eviction(rng):
    """byU32 canonical under skip-ramp accelerations, with a 150 KB noise
    head whose long-literal emit reloads old chunks (the slot-eviction
    hazard), plus the distance-gated candidate rejection on far matches."""
    noise = rng.randbytes(150 * 1024)
    tail = (b"the quick brown fox jumps over the lazy dog " * 900)[:38000]
    data = noise + tail + bytes(12000)
    bcap = len(data)
    cap = -(-(bcap + 1024) // 1024) * 1024
    bufs = np.zeros((1, cap), np.uint8)
    bufs[0] = np.frombuffer(data.ljust(cap, b"\0"), np.uint8)
    lens = np.asarray([len(data)], np.int32)
    for accel in (1, 2, 7, 65537):
        s_out, s_len, s_err = ES.encode_blocks_pallas_stream(
            bufs, lens, bcap, 0, acceleration=accel
        )
        assert s_err[0] == 0
        got = s_out[0, : s_len[0]].tobytes()
        assert got == hostref.encode_fast_canonical(data, accel), accel


def test_dense_geometry_stays_selectable(rng):
    """fast_schedule="dense" keeps the 15-bit-table finder (pinned by its
    own golden vectors) for one-shot streaming blocks."""
    from lz4_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    words = [rng.randbytes(rng.randint(3, 9)) for _ in range(30)]
    data = b" ".join(rng.choice(words) for _ in range(30000))[:90000]
    bcap = len(data)
    cap = -(-(bcap + 1024) // 1024) * 1024
    bufs = np.zeros((1, cap), np.uint8)
    bufs[0, : len(data)] = np.frombuffer(data, np.uint8)
    lens = np.asarray([len(data)], np.int32)
    s_out, s_len, s_err = ES.encode_blocks_pallas_stream(
        bufs, lens, bcap, 0, fast_schedule="dense"
    )
    assert s_err[0] == 0
    got = s_out[0, : s_len[0]].tobytes()
    assert got == native.encode(data, 0, geometry="dense")


def test_hc_identity_across_chunks(rng):
    """48 KB block at L3: chain searches read back across chunk
    boundaries through the ring."""
    words = [rng.randbytes(rng.randint(3, 9)) for _ in range(40)]
    data = b"".join(rng.choice(words) for _ in range(9000))[: 48 * 1024]
    _identity_case(data, 48 * 1024, 3)


def test_opt_identity_across_chunks(rng):
    """20 KB block at L10: the optimal-parse DP + chain-swap search over
    the ring input."""
    words = [rng.randbytes(rng.randint(2, 7)) for _ in range(25)]
    data = b"".join(rng.choice(words) for _ in range(4500))[: 20 * 1024]
    _identity_case(data, 20 * 1024, 10)


def test_dictionary_mode_identity(rng):
    """Streaming-encoder dictionary mode (flat [dict | src] prefix with a
    per-block src_off) is byte-identical to the host engines'
    `encode(..., dictionary=...)` across the ladder, including a full
    64 KB window and an empty dictionary in the same batch."""
    from lz4_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]

    def wordy(n, r):
        return b" ".join(r.choice(words) for _ in range(n * 2))[:n]

    cap, dw = 8192, 65536
    cases = []
    for k, dlen in enumerate((3000, 65536, 0)):
        r = random.Random(200 + k)
        cases.append((wordy(dlen, r), wordy(cap, r)))
    bufs = np.zeros((len(cases), cap), np.uint8)
    lens = np.zeros((len(cases),), np.int32)
    dicts = np.zeros((len(cases), dw), np.uint8)
    dls = np.zeros((len(cases),), np.int32)
    for k, (d, s) in enumerate(cases):
        bufs[k, : len(s)] = np.frombuffer(s, np.uint8)
        lens[k] = len(s)
        if d:
            dicts[k, dw - len(d):] = np.frombuffer(d, np.uint8)
        dls[k] = len(d)
    for level in (0, 9, 12):
        out, clens, errs = ES.encode_blocks_pallas_stream(
            bufs, lens, cap, level, dicts=dicts, dict_lens=dls
        )
        assert not np.asarray(errs).any(), level
        for k, (d, s) in enumerate(cases):
            got = out[k, : clens[k]].tobytes()
            # streaming kernel = dense family; with a dictionary the host
            # default is dense too, so only the empty-dict case needs the
            # explicit geometry
            assert got == native.encode(
                s, level, dictionary=d, geometry="dense"
            ), (level, k)


def test_chained_device_frame_identical(monkeypatch):
    """The batched chained-frame device path emits the exact bytes the
    sequential host FrameWriter produces (dict-carry parity end-to-end),
    and the result decodes on the host path."""
    from lz4_tpu import frame
    from lz4_tpu.frame import api as frame_api
    from lz4_tpu.frame.descriptor import EncoderSettings
    from lz4_tpu.parallel import blocks as PB

    rng2 = random.Random(77)
    words = [rng2.randbytes(rng2.randint(3, 8)) for _ in range(40)]
    data = (
        b" ".join(rng2.choice(words) for _ in range(30000))[:100_000]
        + rng2.randbytes(20_000)
        + bytes(30_000)
    )
    settings = EncoderSettings(
        chain_blocks=True, block_size=65536, content_checksum=True
    )
    ref = frame.compress(data, settings=settings, backend="host")
    monkeypatch.setattr(PB, "_on_tpu", lambda: True)
    fast = frame_api._try_chained_device_compress(data, settings)
    assert fast is not None
    assert fast == ref
    assert frame.decompress(fast) == data


def test_big_block_stream_encode_routing(monkeypatch):
    """LZ4TPU_DEVICE_STREAM_ENCODE=1 keeps >64KB-block encode on device
    (the streaming kernel); default routes to the native host engine.
    Exercised on the interpret backend by faking _on_tpu."""
    import os

    from lz4_tpu import native
    from lz4_tpu.parallel import blocks as PB

    if not native.available():
        pytest.skip("native engine unavailable")
    monkeypatch.setattr(PB, "_on_tpu", lambda: True)
    monkeypatch.setenv("LZ4TPU_DEVICE_STREAM_ENCODE", "1")
    rng2 = random.Random(55)
    words = [rng2.randbytes(rng2.randint(3, 8)) for _ in range(30)]
    bcap = 131072
    d = b" ".join(rng2.choice(words) for _ in range(bcap))[:bcap]
    bufs = np.zeros((1, bcap), np.uint8)
    bufs[0] = np.frombuffer(d, np.uint8)
    lens = np.full((1,), bcap, np.int32)
    out, clens = PB.encode_blocks_device(bufs, lens, bcap, 0)
    # round 4: the streaming device kernel defaults to the canonical
    # schedule (byU32 via the emulated 5-byte hash), so on-device and
    # host big-block encode are byte-identical
    assert out[0, : clens[0]].tobytes() == native.encode(d, 0)
    # and the dense geometry threads through the routing
    out_d, clens_d = PB.encode_blocks_device(
        bufs, lens, bcap, 0, geometry="dense"
    )
    assert out_d[0, : clens_d[0]].tobytes() == native.encode(
        d, 0, geometry="dense"
    )
    # default (env unset): host engine handles it — canonical schedule
    monkeypatch.delenv("LZ4TPU_DEVICE_STREAM_ENCODE")
    out2, clens2 = PB.encode_blocks_device(bufs, lens, bcap, 0)
    assert out2[0, : clens2[0]].tobytes() == native.encode(d, 0)


def test_independent_device_frame_big_blocks_identical(monkeypatch, rng):
    """End-to-end frame parity for the round-4 canonical byU32 path: an
    INDEPENDENT-block frame with 128 KB blocks encoded on the device
    streaming kernel is byte-identical to the host frame (both canonical),
    including the content checksum and block framing."""
    from lz4_tpu import frame, native
    from lz4_tpu.frame.descriptor import EncoderSettings
    from lz4_tpu.parallel import blocks as PB

    if not native.available():
        pytest.skip("native engine unavailable")
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(40)]
    data = (
        b" ".join(rng.choice(words) for _ in range(60000))[:200_000]
        + rng.randbytes(50_000)
        + bytes(62_000)
    )
    settings = EncoderSettings(
        chain_blocks=False, block_size=131072, content_checksum=True
    )
    ref = frame.compress(data, settings=settings, backend="host")
    monkeypatch.setattr(PB, "_on_tpu", lambda: True)
    monkeypatch.setenv("LZ4TPU_DEVICE_STREAM_ENCODE", "1")
    dev = frame.compress(data, settings=settings, backend="tpu")
    assert dev == ref
    assert frame.decompress(dev) == data


def test_chained_device_frame_large_blocks(monkeypatch):
    """Chained frame with 256 KB blocks end-to-end on the device paths:
    batched streaming dict-ENCODE produces the host FrameWriter's exact
    bytes, and the streaming dict-DECODE recovers the data."""
    from lz4_tpu import frame
    from lz4_tpu.frame import api as frame_api
    from lz4_tpu.frame.descriptor import DecoderSettings, EncoderSettings
    from lz4_tpu.parallel import blocks as PB

    rng2 = random.Random(88)
    words = [rng2.randbytes(rng2.randint(3, 8)) for _ in range(40)]
    data = (
        b" ".join(rng2.choice(words) for _ in range(120_000))[:550_000]
        + bytes(40_000)
    )
    settings = EncoderSettings(chain_blocks=True, block_size=262144)
    ref = frame.compress(data, settings=settings, backend="host")
    monkeypatch.setattr(PB, "_on_tpu", lambda: True)
    fast = frame_api._try_chained_device_compress(data, settings)
    assert fast == ref
    dev = frame_api._try_chained_device_decompress(ref, DecoderSettings())
    assert dev == data


def test_raw_verify_residency_oracle_property(rng):
    """Round 5: the canonical find's candidate-verify reads the ring RAW,
    gated by a residency oracle (`resident`), with a stale exit redoing
    the verify through the ensured path.  Correctness must not depend on
    the oracle's accuracy — a false "not resident" answer only costs a
    redo.  stale_test=True makes the oracle lie for ~1/256 of positions,
    hammering the stale-exit + ensured-redo path on a byU32 (> 64 KB)
    block; output must stay byte-identical to the default path, to the
    old always-ensured path (canon_raw_verify=False), and to the host
    canonical engine."""
    import jax.numpy as jnp

    data = (
        b" ".join([b"alpha", b"bravo", b"charlie", b"delta"] * 2500)
        + rng.randbytes(40000)
    )
    data = (data * 3)[: 140 * 1024]
    bcap = 140 * 1024  # > LZ4_64Klimit: the byU32 scan with the raw verify
    bufs = np.zeros((1, bcap), np.uint8)
    bufs[0, : len(data)] = np.frombuffer(data, np.uint8)
    lens = np.asarray([len(data)], np.int32)

    outs = {}
    for tag, kw in (
        ("raw", {}),
        ("stale_forced", {"stale_test": True}),
        ("ensured_baseline", {"canon_raw_verify": False}),
    ):
        out, meta = ES.pallas_encode_stream(
            jnp.asarray(bufs), jnp.asarray(lens), bcap, 0, **kw
        )
        meta = np.asarray(meta).reshape(-1, 8)
        assert int(meta[0, 1]) == 0, tag
        words = np.ascontiguousarray(np.asarray(out).reshape(1, -1))
        outs[tag] = words.view(np.uint8)[0, : int(meta[0, 0])].tobytes()

    ref = hostref.encode_fast_canonical(data, 1)
    for tag, comp in outs.items():
        assert comp == ref, f"{tag} diverged from host canonical"
    assert hostref.decode_block(ref, len(data)) == data
