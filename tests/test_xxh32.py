"""xxHash32 spec vectors + streaming/one-shot equivalence."""

import random

from lz4_tpu.xxh32 import XXH32, xxh32

# Published xxHash32 test vectors (seed 0).
VECTORS = [
    (b"", 0x02CC5D05),
    (b"a", 0x550D7456),
    (b"abc", 0x32D153FF),
    (b"abcd", 0xA3643705),
]


def test_vectors():
    for data, want in VECTORS:
        assert xxh32(data) == want, data


def test_streaming_matches_oneshot():
    rng = random.Random(5)
    for size in [0, 1, 3, 4, 15, 16, 17, 31, 32, 63, 100, 1000, 4096, 65537]:
        data = rng.randbytes(size)
        want = xxh32(data)
        h = XXH32()
        pos = 0
        while pos < size:
            step = rng.randint(1, 37)
            h.update(data[pos : pos + step])
            pos += step
        assert h.digest() == want, size


def test_seed():
    assert xxh32(b"abc", 1) != xxh32(b"abc", 0)
    h = XXH32(seed=12345)
    h.update(b"hello world this is long enough to hit the stripe loop!!")
    assert h.digest() == xxh32(
        b"hello world this is long enough to hit the stripe loop!!", 12345
    )


def test_reset():
    h = XXH32()
    h.update(b"garbage")
    h.reset()
    h.update(b"abc")
    assert h.digest() == 0x32D153FF
