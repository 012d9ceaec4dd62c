"""Real-TPU A/B for the streaming encoder (blocks > 64 KB).

Usage: python sbench.py [bcap_kib] [level ...]

Encodes fresh random-seeded compressible blocks through
`encode_blocks_pallas_stream`, verifies the bytes against the native host
engine (byte-identity: same parse semantics), and reports kernel-time
throughput via the slope method (two batch sizes) to cancel the ~29 ms
fixed dispatch latency.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lz4_tpu import native  # noqa: E402
from lz4_tpu.ops.encode_pallas_stream import (  # noqa: E402
    encode_blocks_pallas_stream,
)
from lz4_tpu.parallel.blocks import comp_capacity  # noqa: E402


def make_blocks(nb, bcap, seed):
    rng = np.random.default_rng(seed)
    out = np.zeros((nb, bcap), np.uint8)
    for b in range(nb):
        # lorem-ish compressible bytes: repeated phrases + noise
        words = rng.integers(0, 48, size=bcap // 6, dtype=np.uint8)
        phrase = rng.integers(32, 127, size=64, dtype=np.uint8)
        buf = np.concatenate(
            [phrase[: 1 + int(w)] for w in words]
        )[:bcap]
        noise = rng.integers(0, 256, size=bcap, dtype=np.uint8)
        mask = rng.random(bcap) < 0.03
        buf = np.where(mask[: len(buf)], noise[: len(buf)], buf)
        out[b, : len(buf)] = buf
    lens = np.full((nb,), bcap, np.int32)
    return out, lens


def run(nb, bcap, level, seed):
    bufs, lens = make_blocks(nb, bcap, seed)
    t0 = time.perf_counter()
    out, clens, errs = encode_blocks_pallas_stream(bufs, lens, bcap, level)
    # force real completion (block_until_ready is unreliable on axon)
    digest = int(np.asarray(clens).sum()) + int(np.asarray(errs).sum())
    t = time.perf_counter() - t0
    assert not np.asarray(errs).any(), "stream encoder overflow"
    return t, out, np.asarray(clens), bufs, lens, digest


def main():
    bcap = int(sys.argv[1]) * 1024 if len(sys.argv) > 1 else 256 * 1024
    levels = [int(x) for x in sys.argv[2:]] or [0]
    print(f"devices: {jax.devices()}", flush=True)
    uniq = int(time.time() * 1000) & 0xFFFFFF
    for level in levels:
        print(f"[L{level:02d}] compiling (bcap={bcap})...", flush=True)
        t_c, *_ = run(1, bcap, level, uniq)
        print(f"[L{level:02d}] first call {t_c:.1f}s", flush=True)
        n1, n2 = 2, 6
        t1, out, clens, bufs, lens, _ = run(n1, bcap, level, uniq + 1)
        t2, out2, clens2, bufs2, lens2, _ = run(n2, bcap, level, uniq + 2)
        dt = t2 - t1
        mb = (n2 - n1) * bcap / 1e6
        print(
            f"[L{level:02d}] t({n1})={t1:.3f}s t({n2})={t2:.3f}s "
            f"slope {mb / max(dt, 1e-9):.1f} MB/s kernel-time",
            flush=True,
        )
        # byte-identity vs the native host engine
        if native.available():
            for b in range(out2.shape[0]):
                ref = native.encode(
                    bufs2[b, : lens2[b]].tobytes(), level
                )
                got = out2[b, : clens2[b]].tobytes()
                assert got == ref, (
                    f"L{level} block {b}: stream {len(got)}B != "
                    f"native {len(ref)}B"
                )
            print(f"[L{level:02d}] byte-identical to native host engine "
                  f"({out2.shape[0]} blocks)", flush=True)


if __name__ == "__main__":
    main()
