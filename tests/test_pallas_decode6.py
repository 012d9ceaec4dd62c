"""v6 (branch-merged parse, full-word copy) Pallas decoder tests.

Interpret mode on CPU.  Beyond mirroring the v5 suite, this pins the
v6-specific machinery: the fast/slow parse split boundary, every output
phase x literal-length combination (the acc reconstruction paths), and
the unified off >= 8 match loop across its frontier-safety boundary.
"""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu import native
from lz4_tpu.block import hostref
from lz4_tpu.ops import decode_pallas6 as D6
from lz4_tpu.parallel.blocks import comp_capacity


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    D6.pallas_decode6.clear_cache()
    yield
    D6.pallas_decode6.clear_cache()


N = 4096


def _encode(d, level=0):
    return native.encode(d, level) if native.available() else (
        hostref.encode_fast(d)
    )


def _decode(cases, enc_level=0):
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = _encode(d, enc_level)
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    return D6.decode_blocks_pallas6(comps, clens, N)


def test_roundtrip_shapes(rng):
    cases = [
        b"hello world hello world hello!" * 10,
        bytes(3000),
        rng.randbytes(1500),
        b"x",
        rng.randbytes(4000),
        bytes(range(256)) * 15,
        (b" ".join([b"lorem", b"ipsum", b"dolor"] * 300))[:4000],
    ]
    out, lens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : lens[i]].tobytes() == d, i


def test_small_period_matches(rng):
    """Offsets 1..7 hit the pattern path; 8..17 the unified word loop at
    its frontier boundary (off barely >= 8, ml >> off)."""
    cases = [
        (bytes([65 + (k % p) for k in range(p)]) * 4000)[:3900]
        for p in range(1, 8)
    ] + [
        (bytes([65 + (k % p) for k in range(p)]) * 800)[:3900]
        for p in range(8, 18)
    ]
    out, lens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : lens[i]].tobytes() == d, i


def test_phase_by_length_matrix(rng):
    """Every (output phase, literal length 0..17) pair, each followed by a
    short then a long match: exercises the acc-reconstruction formulas
    (same-word literals, nw == 0/1/n, f2 == 0) at every alignment."""
    pat = b"QWERTYUIOPASDFGHJKLZXCVBNM123456"  # match source, off >= 8
    cases = []
    for phase in range(4):
        chunks = [b"z" * (32 + phase), pat]
        for ll in range(18):
            chunks.append(rng.randbytes(ll))  # ll literals (incompressible)
            chunks.append(pat[:8])            # short match
            chunks.append(rng.randbytes(ll))
            chunks.append(pat)                # long match
        cases.append(b"".join(chunks)[:3900])
    out, lens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : lens[i]].tobytes() == d, i


def test_long_vle_sequences(rng):
    """Slow-path parse: VLE literal runs and VLE match lengths, including
    255-boundary values, end-to-end through the shared copy stage."""
    cases = [
        rng.randbytes(300) + b"A" * 500 + rng.randbytes(270),   # ml VLE
        rng.randbytes(15) + rng.randbytes(255) + b"BC" * 200,   # ll VLE
        b"D" * 3900,                                            # max run
        rng.randbytes(14),    # tiny all-literal block (last-seq only)
        rng.randbytes(15),
        rng.randbytes(16),
        b"E" * 19 + rng.randbytes(1),  # ml exactly 15+4 boundary
    ]
    out, lens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : lens[i]].tobytes() == d, i


def test_hc_and_opt_streams(rng):
    if not native.available():
        pytest.skip("native encoder unavailable")
    data = (
        b" ".join(rng.choice([b"aa", b"bbb", b"cccc"]) for _ in range(800))
        + rng.randbytes(500)
    )[:3500]
    for lvl in (9, 12):
        cap = comp_capacity(N)
        c = native.encode(data, lvl)
        comps = np.zeros((1, cap), np.uint8)
        comps[0, : len(c)] = np.frombuffer(c, np.uint8)
        out, lens, errs = D6.decode_blocks_pallas6(
            comps, np.asarray([len(c)], np.int32), N
        )
        assert errs[0] == 0 and out[0, : lens[0]].tobytes() == data, lvl


def test_full2v_mode_byte_identical(rng):
    """mode="full2v" (fast arm covers 1-extension-byte match VLE) must be
    byte-identical to the default across FAST and HC/OPT streams, VLE
    boundaries, and periodic matches."""
    cases = [
        rng.randbytes(300) + b"A" * 500 + rng.randbytes(270),
        b"E" * 19 + rng.randbytes(1),          # ml == 19 boundary
        b"F" * 274 + rng.randbytes(3),         # ml == 270/271 VLE boundary
        (b" ".join([b"lorem", b"ipsum", b"dolor"] * 300))[:4000],
        rng.randbytes(2000),
        (bytes([65 + (k % 5) for k in range(5)]) * 800)[:3900],
    ]
    for lvl in (0, 9, 12):
        cap = comp_capacity(N)
        comps = np.zeros((len(cases), cap), np.uint8)
        clens = np.zeros((len(cases),), np.int32)
        for i, d in enumerate(cases):
            c = _encode(d, lvl)
            comps[i, : len(c)] = np.frombuffer(c, np.uint8)
            clens[i] = len(c)
        o_a, l_a, e_a = D6.decode_blocks_pallas6(comps, clens, N)
        o_b, l_b, e_b = D6.decode_blocks_pallas6(
            comps, clens, N, mode="full2v"
        )
        assert np.array_equal(e_a, e_b) and np.array_equal(l_a, l_b), lvl
        assert np.array_equal(o_a, o_b), lvl


def test_full2v_malformed_inputs_flagged():
    """Corrupted blocks must error identically through the full2v arm."""
    cap = comp_capacity(N)
    bad = np.zeros((2, cap), np.uint8)
    bad[0, 0] = 0x4F  # ml VLE through the fast arm, offset 0
    bad[0, 1:5] = ord("q")
    bad[1, 0] = 0x1F  # match VLE runs off the end
    bad[1, 1] = ord("z")
    bad[1, 2] = 0x01
    bad[1, 3] = 0x00
    bad[1, 4] = 255
    lens = np.asarray([7, 3], np.int32)
    _, _, errs_a = D6.decode_blocks_pallas6(bad, lens, N)
    _, _, errs_b = D6.decode_blocks_pallas6(bad, lens, N, mode="full2v")
    assert all(e != 0 for e in errs_b), errs_b.tolist()
    assert np.array_equal(errs_a, errs_b)


def test_decode_mode_autopick(monkeypatch):
    """Ratio heuristic: dense (HC-shaped) batches pick full2v, normal
    FAST-shaped batches keep full2; the env override pins either."""
    from lz4_tpu.parallel.blocks import _pick_decode_mode

    monkeypatch.delenv("LZ4TPU_DECODE_MODE", raising=False)
    dense = np.full((8,), int(0.31 * 65536), np.int32)
    fast = np.full((8,), int(0.45 * 65536), np.int32)
    assert _pick_decode_mode(dense, 65536) == "full2v"
    assert _pick_decode_mode(fast, 65536) == "full2"
    monkeypatch.setenv("LZ4TPU_DECODE_MODE", "full2")
    assert _pick_decode_mode(dense, 65536) == "full2"
    monkeypatch.setenv("LZ4TPU_DECODE_MODE", "full2v")
    assert _pick_decode_mode(fast, 65536) == "full2v"


def test_malformed_inputs_flagged():
    cap = comp_capacity(N)
    bad = np.zeros((3, cap), np.uint8)
    bad[0, 0] = 0xFF
    bad[0, 1:20] = 255  # runaway literal VLE
    bad[1, 0] = 0x04
    bad[1, 1] = ord("q")
    bad[1, 2] = 0xFF
    bad[1, 3] = 0xFF  # offset far beyond the window
    bad[2, 0] = 0x1F  # match VLE runs off the end
    bad[2, 1] = ord("z")
    bad[2, 2] = 0x01
    bad[2, 3] = 0x00
    bad[2, 4] = 255
    out, lens, errs = D6.decode_blocks_pallas6(
        bad, np.asarray([20, 5, 3], np.int32), N
    )
    assert all(e != 0 for e in errs), errs.tolist()


def test_fast_path_bad_offset_flagged():
    """A no-VLE token with an out-of-window offset must error through the
    FAST parse path (token 0x44: ll=4, ml=8; offset 0xFFFF at op=4)."""
    cap = comp_capacity(N)
    bad = np.zeros((2, cap), np.uint8)
    blob = bytes([0x44]) + b"abcd" + bytes([0xFF, 0xFF]) + b"\x10qrstu"
    bad[0, : len(blob)] = np.frombuffer(blob, np.uint8)
    # offset 0 through the fast path
    blob0 = bytes([0x44]) + b"abcd" + bytes([0x00, 0x00]) + b"\x10qrstu"
    bad[1, : len(blob0)] = np.frombuffer(blob0, np.uint8)
    out, lens, errs = D6.decode_blocks_pallas6(
        bad, np.asarray([len(blob), len(blob0)], np.int32), N
    )
    assert all(e != 0 for e in errs), errs.tolist()


def test_dictionary_mode(rng):
    dict_bytes = rng.randbytes(300) * 4
    data = dict_bytes[-200:] + b"XYZ" + dict_bytes[-700:-300]
    c = (
        native.encode(data, 0, dictionary=dict_bytes)
        if native.available()
        else hostref.encode_fast(data, dict_bytes)
    )
    cap = comp_capacity(N)
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : len(c)] = np.frombuffer(c, np.uint8)
    dicts = np.zeros((1, 65536), np.uint8)
    dw = dict_bytes[-65536:]
    dicts[0, 65536 - len(dw):] = np.frombuffer(dw, np.uint8)
    out, lens, errs = D6.decode_blocks_pallas6(
        comps, np.asarray([len(c)], np.int32), N,
        dicts, np.asarray([len(dw)], np.int32),
    )
    assert errs[0] == 0
    assert out[0, : lens[0]].tobytes() == data


def test_cross_check_vs_oracle_fuzz(rng):
    """Random blocks at random levels: v6 output must equal the input (the
    v5 byte-for-byte cross-check moved to experiments/tests with v5)."""
    cases = []
    for t in range(12):
        kind = t % 4
        if kind == 0:
            cases.append(rng.randbytes(rng.randint(1, 3000)))
        elif kind == 1:
            pat = rng.randbytes(rng.randint(1, 30))
            cases.append((pat * 4000)[: rng.randint(100, 3900)])
        elif kind == 2:
            cases.append(bytes(rng.randint(1, 3900)))
        else:
            words = [rng.randbytes(rng.randint(2, 9)) for _ in range(25)]
            cases.append(
                b"".join(rng.choice(words) for _ in range(500))[:3900]
            )
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = _encode(d, random.Random(i).choice([0, 9]))
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    out6, lens6, errs6 = D6.decode_blocks_pallas6(comps, clens, N)
    for i, d in enumerate(cases):
        assert errs6[i] == 0, i
        assert lens6[i] == len(d), i
        assert out6[i, : lens6[i]].tobytes() == d, i
