"""Adversarial fuzz for the native decoder's guarded fast loop.

The fast loop does wide unguarded copies inside margin-checked regions;
every bail path must rewind to the sequence start and the guarded loop
must reject anything malformed.  These tests hammer it with corrupted,
truncated, and random inputs — an out-of-bounds write would corrupt the
Python heap or crash the test process, so merely surviving with correct
accept/reject behavior is the assertion.  Canary bytes around the output
span catch silent overruns."""

from __future__ import annotations

import random

import pytest

from lz4_tpu import native
from lz4_tpu.block import hostref
from lz4_tpu.block.hostref import LZ4Error

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable"
)


def _mk(n, seed):
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        k = rng.randrange(3)
        if k == 0:
            out += rng.randbytes(rng.randrange(1, 120))
        elif k == 1:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 400)
        else:
            out += b"abcdefgh" * rng.randrange(1, 30)
    return bytes(out[:n])


CANARY = 64


def _decode_canaried(comp: bytes, cap: int):
    """Decode with canary-guarded output; returns (rc_ok, decoded_bytes)."""
    buf = bytearray(b"\xCC" * (cap + 2 * CANARY))
    try:
        n = native.decode_span(comp, 0, len(comp), buf, CANARY, cap)
        ok, out = True, bytes(buf[CANARY : CANARY + n])
    except LZ4Error:
        ok, out = False, b""
    assert buf[:CANARY] == b"\xCC" * CANARY, "underrun before output span"
    assert buf[cap + CANARY :] == b"\xCC" * CANARY, "overrun past capacity"
    return ok, out


@pytest.mark.parametrize("seed", range(8))
def test_corrupted_blocks_never_overrun(seed):
    rng = random.Random(1000 + seed)
    data = _mk(30_000, seed)
    comp = bytearray(native.encode(data, rng.choice([0, 9])))
    oracle_ok = 0
    for trial in range(300):
        mutated = bytearray(comp)
        for _ in range(rng.randrange(1, 6)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        m = bytes(mutated)
        ok, out = _decode_canaried(m, len(data))
        # cross-check against the pure-python oracle: accept/reject and
        # bytes must agree (both implement the same spec)
        try:
            ref = hostref.decode_block(m, capacity=len(data))
            ref_ok = True
        except LZ4Error:
            ref_ok, ref = False, b""
        if ok and ref_ok:
            assert out == ref
            oracle_ok += 1
        # a capacity-exact decode that one side rejects and the other
        # accepts would be a spec divergence — but partial-fill semantics
        # differ legitimately only in error CODE, not accept/accept bytes
        assert ok == ref_ok, (seed, trial)
    assert oracle_ok >= 1  # some mutations still decode; the matrix is live


@pytest.mark.parametrize("seed", range(4))
def test_truncations_never_overrun(seed):
    data = _mk(20_000, 50 + seed)
    comp = native.encode(data, 0)
    rng = random.Random(seed)
    for _ in range(200):
        cut = rng.randrange(1, len(comp))
        m = comp[:cut]
        ok, out = _decode_canaried(m, len(data))
        try:
            ref = hostref.decode_block(m, capacity=len(data))
            ref_ok = True
        except LZ4Error:
            ref_ok, ref = False, b""
        assert ok == ref_ok
        if ok:
            assert out == ref


@pytest.mark.parametrize("seed", range(4))
def test_random_garbage_never_overrun(seed):
    rng = random.Random(7000 + seed)
    for _ in range(300):
        m = rng.randbytes(rng.randrange(1, 4000))
        cap = rng.choice([0, 1, 100, 5000, 70000])
        ok, out = _decode_canaried(m, cap)
        try:
            ref = hostref.decode_block(m, capacity=cap)
            ref_ok = True
        except LZ4Error:
            ref_ok, ref = False, b""
        assert ok == ref_ok
        if ok:
            assert out == ref


def test_small_capacities_with_valid_input():
    """Valid stream, shrinking capacity: overflow must reject cleanly at
    every cap below the true size (the fast loop's margins must not let a
    wide copy slip past a tight oend)."""
    data = _mk(10_000, 99)
    comp = native.encode(data, 0)
    for cap in [0, 1, 5, 100, 999, 9_999, 10_000]:
        ok, out = _decode_canaried(comp, cap)
        assert ok == (cap >= len(data))
        if ok:
            assert out == data


def test_contiguous_window_fuzz():
    """Chained-style decode with the in-place window: corruptions in later
    blocks must reject without touching memory outside their span."""
    rng = random.Random(123)
    a = _mk(65_536, 1)
    b = _mk(30_000, 2)
    comp_b = native.encode(b, 0, dictionary=a)
    buf = bytearray(b"\xCC" * (65_536 + 30_000 + CANARY))
    buf[:65_536] = a
    base = native._waddr(buf)
    n = native.decode_span(
        comp_b, 0, len(comp_b), buf, 65_536, 30_000,
        dict_addr=base, dict_len=65_536,
    )
    assert n == len(b) and bytes(buf[65_536 : 65_536 + n]) == b
    assert buf[65_536 + 30_000 :] == b"\xCC" * CANARY
    for _ in range(200):
        m = bytearray(comp_b)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        buf2 = bytearray(b"\xCC" * (65_536 + 30_000 + CANARY))
        buf2[:65_536] = a
        base2 = native._waddr(buf2)
        try:
            native.decode_span(
                bytes(m), 0, len(m), buf2, 65_536, 30_000,
                dict_addr=base2, dict_len=65_536,
            )
        except LZ4Error:
            pass
        assert buf2[65_536 + 30_000 :] == b"\xCC" * CANARY
