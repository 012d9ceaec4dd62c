"""Golden compressed-output regression vectors — the project's analog of the
reference's Silesia checksum table (`ChecksumBlockTests.cs:14-216`, tabulated
in BASELINE.md §B; Silesia itself is not available in this environment).

Pins (size, xxh32-of-compressed-bytes) for the deterministic synthetic corpus
at L0/L3/L9/L10/L12 on the host engines (native C and the pure-Python oracle
produce byte-identical output — both are asserted against the same table).
Any silent parse/ratio regression fails here.

Table generated from the round-2 engines (reference-fidelity HC lookahead +
exact optimal parse).  Regenerate ONLY for deliberate algorithm changes:
    python tests/test_golden_vectors.py regen
"""

import random
import sys

import pytest

from lz4_tpu import native
from lz4_tpu.block import hostref
from lz4_tpu.xxh32 import xxh32

from conftest import sample_corpus

_LEVELS = (0, 3, 9, 10, 12)

# L0 column regenerated deliberately for round 3: the default FAST schedule
# became canonical-parity (byte-identical to upstream LZ4_compress_default,
# verified against liblz4 1.9.4 at generation time); L3-L12 are unchanged.
_GOLDEN = {
    "one": {0: (2, 0x51BFF920), 3: (2, 0x51BFF920), 9: (2, 0x51BFF920), 10: (2, 0x51BFF920), 12: (2, 0x51BFF920)},
    "tiny": {0: (22, 0x57BC8A49), 3: (22, 0x57BC8A49), 9: (22, 0x57BC8A49), 10: (22, 0x57BC8A49), 12: (22, 0x57BC8A49)},
    "zeros": {0: (50, 0x1E983DAE), 3: (50, 0x1E983DAE), 9: (50, 0x1E983DAE), 10: (50, 0x1E983DAE), 12: (50, 0x1E983DAE)},
    "runs": {0: (943, 0x6993CE58), 3: (943, 0x6993CE58), 9: (943, 0x6993CE58), 10: (943, 0x6993CE58), 12: (943, 0x93101C80)},
    "lorem": {0: (12396, 0x2F35E95F), 3: (7803, 0xAFA6D646), 9: (6794, 0x41A7DC6A), 10: (6507, 0x9638D628), 12: (6473, 0xD5069063)},
    "random": {0: (8226, 0x70BF82C3), 3: (8226, 0x70BF82C3), 9: (8226, 0x70BF82C3), 10: (8226, 0x70BF82C3), 12: (8226, 0x70BF82C3)},
    "semi": {0: (822, 0xCFA374EE), 3: (140, 0xEBFAC23F), 9: (140, 0xEBFAC23F), 10: (140, 0xEBFAC23F), 12: (140, 0xEBFAC23F)},
    "periodic2": {0: (51, 0x3F955B70), 3: (51, 0x3F955B70), 9: (51, 0x3F955B70), 10: (51, 0x3F955B70), 12: (51, 0x3F955B70)},
    "periodic7": {0: (58, 0xC24AF515), 3: (58, 0xC24AF515), 9: (58, 0xC24AF515), 10: (58, 0xC24AF515), 12: (58, 0xC24AF515)},
    "mixed": {0: (1028, 0x16268B35), 3: (1026, 0x07D62E3A), 9: (1025, 0xA2AC3B51), 10: (1025, 0xA2AC3B51), 12: (1025, 0xA2AC3B51)},
    "boundary12": {0: (13, 0x847AF379), 3: (13, 0x847AF379), 9: (13, 0x847AF379), 10: (13, 0x847AF379), 12: (13, 0x847AF379)},
    "boundary13": {0: (14, 0xAEBE9F32), 3: (14, 0xAEBE9F32), 9: (14, 0xAEBE9F32), 10: (14, 0xAEBE9F32), 12: (14, 0xAEBE9F32)},
    "len17": {0: (13, 0x86DF223B), 3: (13, 0x86DF223B), 9: (13, 0x86DF223B), 10: (13, 0x86DF223B), 12: (13, 0x86DF223B)},
}

# The dense (15-bit table) FAST schedule stays pinned too: it remains the
# chained/dictionary family and a selectable geometry.  These are the
# pre-round-3 L0 values.
_GOLDEN_DENSE_L0 = {
    "one": (2, 0x51BFF920),
    "tiny": (27, 0x73D56430),
    "zeros": (50, 0x1E983DAE),
    "runs": (943, 0x6993CE58),
    "lorem": (12413, 0xE45B5929),
    "random": (8226, 0x70BF82C3),
    "semi": (822, 0xCFA374EE),
    "periodic2": (51, 0x3F955B70),
    "periodic7": (58, 0xC24AF515),
    "mixed": (1026, 0x82BCF05D),
    "boundary12": (13, 0x847AF379),
    "boundary13": (14, 0xAEBE9F32),
    "len17": (13, 0x86DF223B),
}


def test_dense_geometry_matches_golden_table(corpus):
    for name, data in corpus.items():
        if not data:
            continue
        size, digest = _GOLDEN_DENSE_L0[name]
        host = hostref.encode_fast(data)
        assert (len(host), xxh32(host)) == (size, digest), name
        if native.available():
            assert native.encode(data, 0, geometry="dense") == host, name
        assert hostref.decode_block(host, len(data)) == data, name


def _host_encode(data: bytes, level: int) -> bytes:
    if level < 3:
        return hostref.encode_fast_canonical(data)
    if level < 10:
        return hostref.encode_hc(data, level=level)
    return hostref.encode_opt(data, level=level)


def test_native_matches_golden_table(corpus):
    if not native.available():
        pytest.skip("native codec unavailable")
    for name, data in corpus.items():
        if not data:
            continue
        for lvl in _LEVELS:
            comp = native.encode(data, lvl)
            size, digest = _GOLDEN[name][lvl]
            assert (len(comp), xxh32(comp)) == (size, digest), (name, lvl)
            assert hostref.decode_block(comp, len(data)) == data, (name, lvl)


def test_oracle_matches_golden_table(corpus):
    """The pure-Python oracle must be byte-identical to the native engine —
    two independent implementations pinned to one table."""
    for name, data in corpus.items():
        if not data:
            continue
        for lvl in _LEVELS:
            comp = _host_encode(data, lvl)
            size, digest = _GOLDEN[name][lvl]
            assert (len(comp), xxh32(comp)) == (size, digest), (name, lvl)


def test_level_ladder_monotone(corpus):
    """Higher levels must never compress worse per file (tiny L10/L12
    inversions exist even in the reference's Silesia table, so the gate is
    L3 >= L9 >= min(L10, L12) and L12 <= L9)."""
    for name, data in corpus.items():
        if len(data) < 64:
            continue
        sizes = {lvl: _GOLDEN[name][lvl][0] for lvl in _LEVELS}
        assert sizes[3] <= sizes[0], name
        assert sizes[9] <= sizes[3], name
        assert min(sizes[10], sizes[12]) <= sizes[9], name
        assert sizes[12] <= sizes[9], name


def test_hc_ratio_beats_one_step_lazy(lorem):
    """The 3-candidate lookahead must beat plain greedy by a real margin on
    text (regression trap for the parse quality)."""
    data = _gen_text()
    fast = len(hostref.encode_fast(data))
    l9 = len(hostref.encode_hc(data, level=9))
    l12 = len(hostref.encode_opt(data, level=12))
    assert l9 < 0.92 * fast  # lookahead + deep chain vs greedy
    assert l12 < l9  # exact optimal parse strictly beats HC on text


def _gen_text() -> bytes:
    rng = random.Random(4321)
    words = [rng.randbytes(rng.randint(3, 9)) for _ in range(120)]
    return b" ".join(rng.choice(words) for _ in range(6000))[:30000]


def test_native_oracle_equality_fuzz():
    """Randomized cross-check: the C engine and the Python oracle must stay
    byte-identical at every level (catches divergence the fixed corpus
    misses)."""
    if not native.available():
        pytest.skip("native codec unavailable")
    rng = random.Random(31337)
    for trial in range(6):
        kind = trial % 3
        if kind == 0:
            data = rng.randbytes(rng.randint(100, 3000))
        elif kind == 1:
            pat = rng.randbytes(rng.randint(2, 40))
            data = pat * (3000 // max(1, len(pat)))
        else:
            words = [rng.randbytes(rng.randint(2, 8)) for _ in range(30)]
            data = b"".join(rng.choice(words) for _ in range(800))
        for lvl in (3, 9, 10, 12):
            a = native.encode(data, lvl)
            b = _host_encode(data, lvl)
            assert a == b, (trial, lvl, len(data))
            assert hostref.decode_block(a, len(data)) == data


def test_hc_dictionary_equality():
    """Prefix-dictionary mode: native and oracle agree and roundtrip."""
    if not native.available():
        pytest.skip("native codec unavailable")
    rng = random.Random(5)
    dictionary = rng.randbytes(400) * 3
    data = dictionary[300:900] + rng.randbytes(200) + dictionary[:500]
    for lvl in (3, 9, 12):
        a = native.encode(data, lvl, dictionary=dictionary)
        b = (
            hostref.encode_hc(data, dictionary, lvl)
            if lvl < 10
            else hostref.encode_opt(data, dictionary, lvl)
        )
        assert a == b, lvl
        assert hostref.decode_block(a, len(data), dictionary) == data


if __name__ == "__main__" and "regen" in sys.argv:
    corpus = sample_corpus(random.Random(0))
    print("_GOLDEN = {")
    for name, data in corpus.items():
        if not data:
            continue
        row = {}
        for lvl in _LEVELS:
            c = native.encode(data, lvl)
            row[lvl] = (len(c), xxh32(c))
        entries = ", ".join(
            f"{l}: ({s}, 0x{h:08X})" for l, (s, h) in row.items()
        )
        print(f'    "{name}": {{{entries}}},')
    print("}")


_DICT_GOLDEN = {
    0: (5137, 0x6EDBD731),
    3: (2656, 0x1B8DBD70),
    9: (2640, 0x1114B614),
    10: (2621, 0xC9265DBE),
    12: (2606, 0xD518B3FE),
}


def test_dictionary_mode_golden():
    """Dictionary-mode regression pins (both host engines, one table):
    preset-window parses must stay stable across the ladder — this traps
    silent changes to dict seeding (e.g. the FAST stride) or chain
    construction over the prefix."""
    rng = random.Random(424242)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    dict_ = b" ".join(rng.choice(words) for _ in range(4000))[:16000]
    data = b" ".join(rng.choice(words) for _ in range(3000))[:12000]
    for lvl, (size, digest) in _DICT_GOLDEN.items():
        host = (
            hostref.encode_fast(data, dict_) if lvl < 3
            else hostref.encode_hc(data, dict_, level=lvl) if lvl < 10
            else hostref.encode_opt(data, dict_, level=lvl)
        )
        assert (len(host), xxh32(host)) == (size, digest), lvl
        if native.available():
            assert native.encode(data, lvl, dictionary=dict_) == host, lvl
        win = dict_[-65536:]
        assert hostref.decode_block(host, len(data), dictionary=win) == data


# dense-schedule acceleration pins (pre-round-3 values, unchanged)
_ACCEL_GOLDEN_DENSE = {
    1: (6994, 0x8583D8DD),
    2: (7067, 0x5497AE9D),
    8: (7333, 0x454C66DC),
    32: (9344, 0xDAF274EE),
}

# canonical-schedule acceleration pins (generated against liblz4 1.9.4's
# LZ4_compress_fast — all four verified byte-identical at generation time)
_ACCEL_GOLDEN_CANONICAL = {
    1: (6994, 0x8583D8DD),
    2: (7007, 0xDA3E9259),
    8: (7189, 0xA8F145AE),
    32: (8457, 0xBAE429C2),
}


def test_acceleration_golden():
    """Acceleration-parameter regression pins: the skip-trigger schedule
    (reference `LZ4_compress_fast` acceleration) must stay stable — size
    grows monotonically with acceleration on compressible input, and the
    host engines agree byte-for-byte in both geometries."""
    rng = random.Random(90909)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(30)]
    data = b" ".join(rng.choice(words) for _ in range(4000))[:16000]
    for table, enc, geom in (
        (_ACCEL_GOLDEN_DENSE,
         lambda d, a: hostref.encode_fast(d, acceleration=a), "dense"),
        (_ACCEL_GOLDEN_CANONICAL,
         lambda d, a: hostref.encode_fast_canonical(d, a), "canonical"),
    ):
        prev_size = 0
        for acc, (size, digest) in sorted(table.items()):
            host = enc(data, acc)
            assert (len(host), xxh32(host)) == (size, digest), (geom, acc)
            assert len(host) >= prev_size, (geom, acc)
            prev_size = len(host)
            if native.available():
                assert native.encode(
                    data, 0, acceleration=acc, geometry=geom
                ) == host, (geom, acc)
            assert hostref.decode_block(host, len(data)) == data
