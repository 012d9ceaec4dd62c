"""Native (host C) decoder A/B harness vs canonical liblz4, single core.

Times `native.decode_span` and canonical `LZ4_decompress_safe` on the SAME
compressed stream (one produced by our FAST encoder, one by canonical's, so
both decoders also run on both token mixes), plus per-quarter splits of the
bench corpus to localize any gap.

Usage: python nbench.py [--mb 16] [--iters 7] [--level 0]

CPU-only (JAX never imported).  Run it alone — bench.py's host configs and
this harness both time the same 4 cores.
"""

import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import make_corpus  # noqa: E402
from lz4_tpu import native  # noqa: E402


def canonical():
    lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/liblz4.so.1")
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_default.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
    ]
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
    ]
    return lib


def time_best(fn, iters):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    opts = {
        a.split("=")[0][2:]: a.split("=")[1]
        for a in sys.argv[1:] if a.startswith("--") and "=" in a
    }
    mb = int(opts.get("mb", 16))
    iters = int(opts.get("iters", 7))
    level = int(opts.get("level", 0))
    total = mb << 20
    lib = canonical()

    data = make_corpus(total, seed=int(time.time()) % 99991)
    quarters = {
        "full": data,
        "text": data[: total // 4],
        "records": data[total // 4: total // 2],
        "rle": data[total // 2: 3 * total // 4],
        "noise": data[3 * total // 4:],
    }

    for qname, q in quarters.items():
        n = len(q)
        # our stream and canonical's stream
        ours = native.encode(q, level)
        cbuf = ctypes.create_string_buffer(n + n // 128 + 64)
        clen = lib.LZ4_compress_default(q, cbuf, n, len(cbuf))
        assert clen > 0
        canon = cbuf.raw[:clen]

        rows = []
        for sname, stream in (("ours", ours), ("canon", canon)):
            out_np = np.empty(n, np.uint8)
            dst = ctypes.create_string_buffer(n)

            def run_native(stream=stream, out_np=out_np, n=n):
                assert native.decode_span(
                    stream, 0, len(stream), out_np, 0, n
                ) == n

            def run_canon(stream=stream, dst=dst, n=n):
                assert lib.LZ4_decompress_safe(stream, dst, len(stream), n) == n

            tn = time_best(run_native, iters)
            tc = time_best(run_canon, iters)
            assert bytes(out_np) == q and dst.raw == q
            rows.append(
                f"{sname}-stream ratio={len(stream)/n:.3f} "
                f"native={n/tn/1e9:.2f} canon={n/tc/1e9:.2f} GB/s "
                f"(native/canon {tc/tn:.2f}x)"
            )
        print(f"[{qname:7s} {n>>20:3d} MiB] " + " | ".join(rows), flush=True)


if __name__ == "__main__":
    main()
