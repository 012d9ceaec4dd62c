"""Deep cross-engine stress fuzz (opt-in: LZ4TPU_STRESS=1).

Heavier than `test_cross_backend_fuzz` (hundreds of trials, thousands of
cases): native C vs python oracle vs canonical liblz4 across the full
level ladder with random dictionaries — encode byte-identity, decode
roundtrips through all three, and accept/reject agreement (plus decoded-
byte agreement on accepted mutants) for randomly corrupted blocks.
Analog of the reference's randomized roundtrip pillar (SURVEY.md §4) at
soak depth; the 2026-08-19 run: 1579 cases / 400 trials clean.
"""

import os
import random

import pytest

from lz4_tpu import native
from lz4_tpu.block import hostref

import liblz4

pytestmark = pytest.mark.skipif(
    os.environ.get("LZ4TPU_STRESS") != "1",
    reason="soak test: set LZ4TPU_STRESS=1 (runs ~1 min)",
)


def _oracle_encode(data, lv, d):
    if lv >= 10:
        return hostref.encode_opt(data, d, lv)
    if lv >= 3:
        return hostref.encode_hc(data, d, lv)
    if not d:  # default FAST schedule is canonical (round 3)
        return hostref.encode_fast_canonical(data)
    return hostref.encode_fast(data, d)


def _gen(rng, n):
    out = bytearray()
    while len(out) < n:
        k = rng.randrange(7)
        if k == 0:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 500)
        elif k == 1:
            out += rng.randbytes(rng.randrange(1, 300))
        elif k == 2 and out:
            s = rng.randrange(len(out))
            out += bytes(out[s : s + rng.randrange(1, 600)])
        elif k == 3:
            out += b"the quick brown fox " * rng.randrange(1, 40)
        elif k == 4:
            out += bytes(rng.randrange(16) for _ in range(rng.randrange(1, 128)))
        elif k == 5:
            out += b"\x00" * rng.randrange(1, 200)
        else:
            out += bytes(range(rng.randrange(1, 256)))
    return bytes(out[:n])


@pytest.mark.parametrize("seed", [20260819, 7])
def test_deep_cross_engine_fuzz(seed):
    if not native.available() or liblz4.LIB is None:
        pytest.skip("needs native codec + system liblz4")
    rng = random.Random(seed)
    levels = [0, 1, 3, 6, 9, 10, 12]
    for trial in range(200):
        n = rng.choice(
            [rng.randrange(0, 80), rng.randrange(80, 4000),
             rng.randrange(4000, 70000)]
        )
        data = _gen(rng, n) if n else b""
        use_dict = rng.random() < 0.3 and n > 0
        d = _gen(rng, rng.randrange(1, 70000)) if use_dict else b""
        lv = rng.choice(levels)
        comp = native.encode(data, lv, d)
        assert comp == _oracle_encode(data, lv, d), (trial, lv, n, len(d))
        if not use_dict and data:
            # byte-identity with canonical upstream now holds at EVERY
            # level for one-shot no-dict blocks (round 3: FAST too)
            assert liblz4.compress_block(data, lv) == comp, (trial, lv)
        if data:
            assert native.decode(comp, len(data), d) == data, (trial, lv)
        assert hostref.decode_block(comp, len(data), d) == data, (trial, lv)
        if not use_dict and data:
            assert liblz4.decompress_block(comp, len(data)) == data
        if data and len(comp) > 2:
            for _ in range(3):
                m = bytearray(comp)
                for _ in range(rng.randrange(1, 4)):
                    m[rng.randrange(len(m))] = rng.randrange(256)
                m = bytes(m)
                try:
                    rn, okn = native.decode(m, len(data), d), True
                except Exception:
                    rn, okn = None, False
                try:
                    ro, oko = hostref.decode_block(m, len(data), d), True
                except Exception:
                    ro, oko = None, False
                assert okn == oko, (trial, lv, "accept/reject disagreement")
                if okn:
                    assert rn == ro, (trial, lv, "mutant divergence")
