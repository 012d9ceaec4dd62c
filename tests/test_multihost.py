"""Multi-host scaffolding tests.

The 2-process test launches real separate processes with
jax.distributed.initialize over a localhost coordinator (CPU backend) and
checks that the sharded frame assembly is byte-identical to the
single-process frame and decompresses losslessly — the CPU stand-in for
BASELINE configs #2-#5 (N-host scaling).
"""

import os
import socket
import subprocess
import sys

import pytest

from lz4_tpu.parallel.multihost import local_block_range

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_block_range_partitions():
    for n_blocks in (1, 2, 7, 16, 31):
        for nproc in (1, 2, 3, 8):
            ranges = [local_block_range(n_blocks, p, nproc) for p in range(nproc)]
            covered = []
            for a, b in ranges:
                covered.extend(range(a, b))
            assert covered == list(range(n_blocks)), (n_blocks, nproc)


_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["LZ4TPU_TEST_ROOT"])
import jax
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_platforms", "cpu")
from lz4_tpu.parallel import multihost

assert multihost.init_from_env()
assert jax.process_count() == 2

# dictionary broadcast: only process 0 supplies it
d0 = b"shared-window-" * 100 if jax.process_index() == 0 else None
d = multihost.broadcast_dictionary(d0)
assert d == b"shared-window-" * 100, (jax.process_index(), len(d))

import random
data = random.Random(77).randbytes(9_000) * 40  # 360 KB, compressible
blob = multihost.compress_distributed(data, block_size=65536, level=0)

# decode mirror: every process decodes only its block range; the gathered
# plaintext must round-trip the distributed frame on BOTH processes
plain = multihost.decompress_distributed(blob)
assert plain == data, (jax.process_index(), len(plain), len(data))

# CHAINED frames shard too (plaintext windows are replicated)
from lz4_tpu.frame.descriptor import EncoderSettings
st = EncoderSettings(chain_blocks=True, block_size=65536)
chained = multihost.compress_distributed(data, settings=st)

out_path = os.environ["LZ4TPU_TEST_OUT"] + f".{jax.process_index()}"
with open(out_path, "wb") as f:
    f.write(blob)
with open(out_path + ".chained", "wb") as f:
    f.write(chained)
print("worker", jax.process_index(), "ok", len(blob), len(chained))
"""


def test_two_process_distributed_frame(tmp_path):
    port = _free_port()
    out = str(tmp_path / "frame")
    code = _WORKER
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            LZ4TPU_TEST_ROOT=ROOT,
            LZ4TPU_COORDINATOR=f"127.0.0.1:{port}",
            LZ4TPU_NUM_PROCESSES="2",
            LZ4TPU_PROCESS_ID=str(pid),
            LZ4TPU_TEST_OUT=out,
            JAX_PLATFORMS="",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-3000:]}"

    blob0 = open(out + ".0", "rb").read()
    blob1 = open(out + ".1", "rb").read()
    assert blob0 == blob1  # all-gather assembly is symmetric

    # the distributed frame equals the single-process frame, bit for bit
    import random

    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings

    data = random.Random(77).randbytes(9_000) * 40
    single = frame.compress(
        data,
        settings=EncoderSettings(chain_blocks=False, block_size=65536),
        backend="host",
        workers=0,
    )
    assert blob0 == single
    assert frame.decompress(blob0, backend="host") == data

    # chained distributed frame: symmetric and byte-identical to the
    # sequential host FrameWriter's chained frame
    ch0 = open(out + ".0.chained", "rb").read()
    ch1 = open(out + ".1.chained", "rb").read()
    assert ch0 == ch1
    ch_single = frame.compress(
        data,
        settings=EncoderSettings(chain_blocks=True, block_size=65536),
        backend="host",
    )
    assert ch0 == ch_single
    assert frame.decompress(ch0, backend="host") == data


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_chained_compress_distributed_single_process():
    """Chained distributed compress (round 4): byte-identical to the host
    FrameWriter's chained frame across the ladder — block k's plaintext
    window is replicated, so chained ENCODE shards like independent."""
    import random

    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings
    from lz4_tpu.parallel.multihost import compress_distributed

    rng = random.Random(31)
    words = [rng.randbytes(rng.randint(3, 8)) for _ in range(40)]
    data = (
        b" ".join(rng.choice(words) for _ in range(40000))[:150_000]
        + rng.randbytes(40_000)
        + bytes(40_000)
    )
    for lvl in (0, 9):
        st = EncoderSettings(
            chain_blocks=True, block_size=65536, compression_level=lvl,
            content_checksum=True,
        )
        blob = compress_distributed(data, settings=st)
        assert blob == frame.compress(data, settings=st, backend="host"), lvl
        assert frame.decompress(blob) == data


def test_decompress_distributed_single_process():
    """Single-process semantics of the decode mirror: lossless, typed
    errors on corruption, chained frames rejected."""
    import random

    import pytest as _pytest

    from lz4_tpu import frame
    from lz4_tpu.frame.descriptor import EncoderSettings
    from lz4_tpu.frame.header import LZ4FormatError
    from lz4_tpu.parallel.multihost import (
        compress_distributed,
        decompress_distributed,
    )

    data = random.Random(5).randbytes(7000) * 30
    st = EncoderSettings(
        chain_blocks=False, block_size=65536,
        content_checksum=True, block_checksum=True,
    )
    blob = compress_distributed(data, settings=st)
    assert decompress_distributed(blob) == data
    assert frame.decompress(blob) == data  # interoperable

    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x20
    with _pytest.raises(LZ4FormatError):
        decompress_distributed(bytes(bad))

    chained = frame.compress(
        data, settings=EncoderSettings(chain_blocks=True, block_size=65536)
    )
    with _pytest.raises(LZ4FormatError):
        decompress_distributed(chained)
