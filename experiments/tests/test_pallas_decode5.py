"""v5 (all-scalar packed-word) Pallas decoder tests — interpret mode on CPU.

v5 is the production TPU decode path (`parallel.blocks.decode_blocks_device`);
this suite pins its correctness across sequence shapes, every small-period
match path, dictionary mode, and malformed inputs.
"""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu import native
from lz4_tpu.block import hostref
from experiments import decode_pallas5 as D5
from lz4_tpu.parallel.blocks import comp_capacity


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    D5.pallas_decode5.clear_cache()
    yield
    D5.pallas_decode5.clear_cache()


N = 4096


def _decode(cases, enc_level=0):
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = native.encode(d, enc_level) if native.available() else (
            hostref.encode_fast(d)
        )
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    return D5.decode_blocks_pallas5(comps, clens, N)


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
    """Every offset < 8 exercises the pattern-register replication path."""
    cases = [
        (bytes([65 + (k % p) for k in range(p)]) * 4000)[:3900]
        for p in range(1, 8)
    ] + [
        # off 8..17: mid (plain word loop) and far (incremental) overlap
        # boundaries, all with ml >> off (self-referencing matches)
        (bytes([65 + (k % p) for k in range(p)]) * 800)[:3900]
        for p in range(8, 18)
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
        out, lens, errs = D5.decode_blocks_pallas5(
            comps, np.asarray([len(c)], np.int32), N
        )
        assert errs[0] == 0 and out[0, : lens[0]].tobytes() == data, lvl


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
    out, lens, errs = D5.decode_blocks_pallas5(
        bad, np.asarray([20, 5, 5], np.int32), N
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
    out, lens, errs = D5.decode_blocks_pallas5(
        comps, np.asarray([len(c)], np.int32), N,
        dicts, np.asarray([len(dw)], np.int32),
    )
    assert errs[0] == 0
    assert out[0, : lens[0]].tobytes() == data


def test_cross_check_vs_oracle_fuzz(rng):
    """Random blocks at random levels: v5 output must equal the oracle's."""
    cases = []
    for t in range(8):
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
    out, lens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : lens[i]].tobytes() == d, i
