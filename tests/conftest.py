"""Test configuration: force the CPU XLA backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs the multi-chip path; the benchmark runs on a real chip).

The environment preloads jax with the TPU (axon) backend via sitecustomize,
so we re-point jax at CPU and clear the backend cache before any test runs.
"""

import os
import random
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("LZ4TPU_REAL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend import backend as _jeb  # noqa: E402

        _jeb.clear_backends()
    except Exception:
        pass
    assert jax.default_backend() == "cpu"

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(1234)


def _lorem(n: int, rng: random.Random) -> bytes:
    """Compressible text, analog of the reference's TestHelpers/Lorem.cs."""
    words = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua"
    ).split()
    out = []
    total = 0
    while total < n:
        w = rng.choice(words)
        out.append(w)
        total += len(w) + 1
    return (" ".join(out))[:n].encode()


@pytest.fixture
def lorem():
    return _lorem


def sample_corpus(rng: random.Random) -> dict[str, bytes]:
    """Small deterministic corpus covering compressibility extremes."""
    return {
        "empty": b"",
        "one": b"a",
        "tiny": b"hello world, hello world!",
        "zeros": bytes(10000),
        "runs": b"".join(bytes([i & 0xFF]) * (i % 97 + 1) for i in range(200)),
        "lorem": _lorem(30000, random.Random(7)),
        "random": random.Random(42).randbytes(8192),
        "semi": b"".join(
            random.Random(9).randbytes(64) * 3 + b"abcdefgh" * 8
            for _ in range(50)
        ),
        "periodic2": b"ab" * 5000,
        "periodic7": b"abcdefg" * 1500,
        "mixed": bytes(1000) + random.Random(3).randbytes(1000) + bytes(1000),
        "boundary12": b"x" * 12,
        "boundary13": b"yz" * 6 + b"q",
        "len17": b"abcdabcdabcdabcda",
    }


@pytest.fixture
def corpus():
    return sample_corpus(random.Random(0))
