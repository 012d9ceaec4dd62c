"""Host HC (L3-L12) A/B harness vs canonical liblz4, single core, paired.

Times `native.encode_span` (our C engine, zero-copy span entry — the same
raw-call footing as canonical's ctypes binding) against canonical
`LZ4_compress_HC` on the SAME real-bytes blocks, strictly interleaved
A/B/A/B with paired per-round ratios — the only methodology that survives
this VM's +-15% run-to-run throughput swings (CLAUDE.md).  Byte-parity is
asserted over EVERY block once up front (the engines are byte-identical
at L3-L12, so ratios compare pure speed).

Usage: python hcbench.py [--mb=16] [--rounds=9] [--level=9] [--block=65536]

CPU-only (JAX never imported).  Run it alone.
"""

import ctypes
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lz4_tpu import native  # noqa: E402
from tests.realcorpus import real_corpus  # noqa: E402


def canonical():
    lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/liblz4.so.1")
    lib.LZ4_compress_HC.restype = ctypes.c_int
    lib.LZ4_compress_HC.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.LZ4_compressBound.restype = ctypes.c_int
    lib.LZ4_compressBound.argtypes = [ctypes.c_int]
    return lib


def main():
    opts = {}
    for a in sys.argv[1:]:
        if not (a.startswith("--") and "=" in a):
            sys.exit(f"unrecognized argument {a!r} (use --key=value)")
        k, v = a[2:].split("=", 1)
        if k not in ("mb", "rounds", "level", "block"):
            sys.exit(f"unknown option --{k}")
        opts[k] = v
    mb = int(opts.get("mb", 16))
    rounds = int(opts.get("rounds", 9))
    level = int(opts.get("level", 9))
    block = int(opts.get("block", 65536))
    total = mb << 20
    lib = canonical()

    data = real_corpus(total)[:total]
    blocks = [data[i:i + block] for i in range(0, total, block)]
    bound = lib.LZ4_compressBound(block)
    dst = ctypes.create_string_buffer(bound)
    obuf = np.empty(bound, np.uint8)  # our zero-copy span target

    # byte-parity over EVERY block once up front (ratios then cancel
    # exactly; a speed number from this harness implies parity held)
    for b in blocks:
        rc = lib.LZ4_compress_HC(b, dst, len(b), bound, level)
        assert rc > 0
        n = native.encode_span(b, 0, len(b), obuf, 0, bound, level)
        assert obuf.tobytes()[:n] == dst.raw[:rc], "HC byte-parity broken!"

    def run_ours():
        n = 0
        for b in blocks:
            n += native.encode_span(b, 0, len(b), obuf, 0, bound, level)
        return n

    def run_canon():
        n = 0
        for b in blocks:
            n += lib.LZ4_compress_HC(b, dst, len(b), bound, level)
        return n

    # warmup
    run_ours(); run_canon()
    ratios = []
    for r in range(rounds):
        t0 = time.perf_counter(); n_o = run_ours()
        t1 = time.perf_counter(); n_c = run_canon()
        t2 = time.perf_counter()
        ours_s, canon_s = t1 - t0, t2 - t1
        ratios.append(canon_s / ours_s)
        print(
            f"round {r}: ours {total / ours_s / 1e9:.4f} GB/s  "
            f"canon {total / canon_s / 1e9:.4f} GB/s  "
            f"paired ours/canon speed {canon_s / ours_s:.4f}  "
            f"(sizes {n_o} vs {n_c})"
        )
    med = statistics.median(ratios)
    print(f"L{level} block={block}: median paired speed ratio "
          f"(ours/canon, >1 = we win): {med:.4f}")


if __name__ == "__main__":
    main()
