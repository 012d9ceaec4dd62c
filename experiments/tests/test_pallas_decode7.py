"""v7 (dual-block interleave) Pallas decoder tests — interpret mode on CPU.

v7 must be byte-equivalent to v6 on every input; these drive the
v7-specific machinery: the joint walk with asymmetric block lengths
(drain loops), the fused-pair arm boundaries (ll <= 11 / ml <= 15 /
off >= 8), odd batch padding, and error propagation per machine.
"""

import functools
import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lz4_tpu import native
from lz4_tpu.block import hostref
from experiments import decode_pallas7 as D7
from lz4_tpu.parallel.blocks import comp_capacity

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    D7.pallas_decode7.clear_cache()
    yield
    D7.pallas_decode7.clear_cache()


N = 4096


def _decode(cases, enc_level=0):
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = native.encode(d, enc_level)
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    return D7.decode_blocks_pallas7(comps, clens, N)


def _cases(rng):
    return [
        b"hello world hello world hello!" * 10,      # short matches
        bytes(3000),                                  # off=1 runs
        rng.randbytes(1500),                          # long literals
        b"x",
        rng.randbytes(4000),
        bytes(range(256)) * 15,                       # off=256 long matches
        (b" ".join([b"lorem", b"ipsum", b"dolor"] * 300))[:4000],
        (b"ab" * 2000)[:3999],                        # off=2 (near path)
        (b"abcdefg" * 600)[:4000],                    # off=7 boundary
        (b"abcdefgh" * 500)[:4000],                   # off=8 boundary
        b"",
    ]


def test_roundtrip_pairs(rng):
    """Even batch: every pair mixes a different block shape, exercising
    asymmetric drains (machine A and B finish at different steps)."""
    cases = _cases(rng)
    cases = cases[:10]  # even count
    out, olens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : olens[i]].tobytes() == d, i


def test_roundtrip_odd_batch(rng):
    """Odd batch: the zero pad row must not disturb real results."""
    cases = _cases(rng)[:7]
    out, olens, errs = _decode(cases)
    for i, d in enumerate(cases):
        assert errs[i] == 0, i
        assert out[i, : olens[i]].tobytes() == d, i


def test_hc_and_opt_streams(rng):
    """Denser sequence streams from the HC/OPT encoders."""
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    data = b" ".join(rng.choice(words) for _ in range(1500))[:N]
    for lvl in (9, 12):
        cases = [data, data[: N // 2]]
        out, olens, errs = _decode(cases, enc_level=lvl)
        for i, d in enumerate(cases):
            assert errs[i] == 0, (lvl, i)
            assert out[i, : olens[i]].tobytes() == d, (lvl, i)


def test_malformed_blocks(rng):
    """Per-machine error isolation: a corrupt block errors, its pair
    partner still decodes."""
    good = (b" ".join([b"alpha", b"beta", b"gamma"] * 200))[:3000]
    c_good = native.encode(good, 0)
    cap = comp_capacity(N)
    comps = np.zeros((2, cap), np.uint8)
    clens = np.zeros((2,), np.int32)
    # machine A: offset pointing before the block start
    bad = bytes([0x00, 0x10, 0x00]) + bytes(20)
    comps[0, : len(bad)] = np.frombuffer(bad, np.uint8)
    clens[0] = len(bad)
    comps[1, : len(c_good)] = np.frombuffer(c_good, np.uint8)
    clens[1] = len(c_good)
    out, olens, errs = D7.decode_blocks_pallas7(comps, clens, N)
    assert errs[0] != 0
    assert errs[1] == 0
    assert out[1, : olens[1]].tobytes() == good


def test_matches_v6_bytes(rng):
    """v7 output bytes and meta match v6 exactly on a mixed batch."""
    from lz4_tpu.ops import decode_pallas6 as D6

    D6.pallas_decode6.clear_cache()
    cases = _cases(rng)[:8]
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = native.encode(d, 0)
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    o7, l7, e7 = D7.decode_blocks_pallas7(comps, clens, N)
    o6, l6, e6 = D6.decode_blocks_pallas6(comps, clens, N)
    assert (np.asarray(l7) == np.asarray(l6)).all()
    assert (np.asarray(e7) == np.asarray(e6)).all()
    for i in range(len(cases)):
        assert (
            o7[i, : l7[i]].tobytes() == o6[i, : l6[i]].tobytes()
        ), i


def test_v9_unified_loop_matches_v6(rng):
    """The unified-loop pair decoder (v9) is byte-equal to v6 across the
    mixed shape set, odd batches, and asymmetric pair drains."""
    from lz4_tpu.ops import decode_pallas6 as D6

    D6.pallas_decode6.clear_cache()
    D7.pallas_decode9.clear_cache()
    cases = _cases(rng)  # 11 cases -> odd batch too
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = native.encode(d, 0)
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    o9, l9, e9 = D7.decode_blocks_pallas9(comps, clens, N)
    o6, l6, e6 = D6.decode_blocks_pallas6(comps, clens, N)
    assert (np.asarray(l9) == np.asarray(l6)).all()
    assert (np.asarray(e9) == np.asarray(e6)).all()
    for i in range(len(cases)):
        assert o9[i, : l9[i]].tobytes() == o6[i, : l6[i]].tobytes(), i


def test_v9_hc_and_malformed(rng):
    """v9: denser HC streams + per-machine error isolation."""
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    data = b" ".join(rng.choice(words) for _ in range(1500))[:N]
    cap = comp_capacity(N)
    c_good = native.encode(data, 9)
    bad = bytes([0x00, 0x10, 0x00]) + bytes(20)
    comps = np.zeros((2, cap), np.uint8)
    clens = np.zeros((2,), np.int32)
    comps[0, : len(bad)] = np.frombuffer(bad, np.uint8)
    clens[0] = len(bad)
    comps[1, : len(c_good)] = np.frombuffer(c_good, np.uint8)
    clens[1] = len(c_good)
    out, olens, errs = D7.decode_blocks_pallas9(comps, clens, N)
    assert errs[0] != 0 and errs[1] == 0
    assert out[1, : olens[1]].tobytes() == data


def test_v10_shared_ref_matches_v6(rng):
    """The shared-ref pair decoder (v10) is byte-equal to v6, including
    odd batches and a malformed/good pair."""
    from lz4_tpu.ops import decode_pallas6 as D6

    D6.pallas_decode6.clear_cache()
    D7.pallas_decode10.clear_cache()
    cases = _cases(rng)  # 11 -> odd batch
    cap = comp_capacity(N)
    comps = np.zeros((len(cases), cap), np.uint8)
    clens = np.zeros((len(cases),), np.int32)
    for i, d in enumerate(cases):
        c = native.encode(d, 0)
        comps[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    oX, lX, eX = D7.decode_blocks_pallas10(comps, clens, N)
    o6, l6, e6 = D6.decode_blocks_pallas6(comps, clens, N)
    assert (np.asarray(lX) == np.asarray(l6)).all()
    assert (np.asarray(eX) == np.asarray(e6)).all()
    for i in range(len(cases)):
        assert oX[i, : lX[i]].tobytes() == o6[i, : l6[i]].tobytes(), i
    # malformed A + good B in one pair
    bad = bytes([0x00, 0x10, 0x00]) + bytes(20)
    comps2 = np.zeros((2, cap), np.uint8)
    clens2 = np.zeros((2,), np.int32)
    comps2[0, : len(bad)] = np.frombuffer(bad, np.uint8)
    clens2[0] = len(bad)
    good = cases[6]
    cg = native.encode(good, 0)
    comps2[1, : len(cg)] = np.frombuffer(cg, np.uint8)
    clens2[1] = len(cg)
    out, olens, errs = D7.decode_blocks_pallas10(comps2, clens2, N)
    assert errs[0] != 0 and errs[1] == 0
    assert out[1, : olens[1]].tobytes() == good
