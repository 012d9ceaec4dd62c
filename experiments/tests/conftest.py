"""Conftest for the archived-experiment kernel tests (run on demand with
`python -m pytest experiments/tests -q`; not part of the default suite).

Same environment shaping as tests/conftest.py: force the CPU XLA backend so
interpret-mode Pallas runs without TPU hardware.
"""

import os
import random
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

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
