"""Benchmark driver — prints ONE JSON line with the headline metric.

Measures steady-state per-chip block-parallel LZ4 throughput (encode at L00
and decode) on a deterministic Silesia-like synthetic corpus (the real
Silesia corpus is not downloadable in this environment; the mix below
approximates its ~2.1x LZ4 compressibility).  The baseline anchor is the
reference's published generic claim of ~0.4 GB/s compression per CPU core
(reference README.md:11-12; see BASELINE.md §A).

Usage: python bench.py            (runs on the default jax backend — TPU when
                                   available, else CPU)
Env:   LZ4TPU_BENCH_BLOCK=262144  block size in bytes
       LZ4TPU_BENCH_MB=32         total payload in MiB
       LZ4TPU_BENCH_ITERS=5       timed iterations
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_corpus(total_bytes: int, seed: int = 0) -> bytes:
    """Deterministic mixed-compressibility corpus (text-like, structured
    binary, periodic runs, low-entropy noise) approximating Silesia's LZ4
    ratio (~2.1x at L00)."""
    rng = np.random.default_rng(seed)
    parts = []
    quarter = total_bytes // 4

    # text-like: words drawn from a small vocabulary
    vocab = [
        b"the ", b"compression ", b"of ", b"data ", b"lorem ", b"ipsum ",
        b"block ", b"stream ", b"frame ", b"hash ", b"match ", b"literal ",
        b"sequence ", b"offset ", b"window ", b"dictionary ",
    ]
    words = rng.integers(0, len(vocab), quarter // 8)
    parts.append(b"".join(vocab[w] for w in words)[:quarter])

    # structured binary: repeating record layout with varying fields
    rec = np.zeros((quarter // 64 + 1, 64), np.uint8)
    rec[:, :16] = np.arange(16, dtype=np.uint8)
    rec[:, 16:32] = rng.integers(0, 4, (rec.shape[0], 16), dtype=np.uint8)
    rec[:, 32:] = (np.arange(rec.shape[0], dtype=np.uint32)[:, None]
                   .view(np.uint8).reshape(rec.shape[0], 4).repeat(8, axis=1))
    parts.append(rec.tobytes()[:quarter])

    # periodic runs (RLE-ish)
    run_lens = rng.integers(3, 60, quarter // 20)
    vals = rng.integers(0, 256, quarter // 20, dtype=np.uint8)
    runs = np.repeat(vals, run_lens)
    parts.append(runs.tobytes()[:quarter])

    # low-entropy noise: bytes from a 16-symbol alphabet
    noise = (rng.integers(0, 16, total_bytes - 3 * quarter) * 13).astype(np.uint8)
    parts.append(noise.tobytes())

    return b"".join(parts)[:total_bytes]


def main():
    import jax
    import jax.numpy as jnp

    from lz4_tpu.constants import compress_bound
    from lz4_tpu.parallel.blocks import (
        batched_decode,
        batched_encode,
        split_blocks,
    )

    block_size = int(os.environ.get("LZ4TPU_BENCH_BLOCK", 64 * 1024))
    total_mb = int(os.environ.get("LZ4TPU_BENCH_MB", 32))
    iters = int(os.environ.get("LZ4TPU_BENCH_ITERS", 5))
    total = total_mb * (1 << 20)

    backend = jax.default_backend()
    data = make_corpus(total)

    bufs_np, lens_np = split_blocks(data, block_size)
    bufs = jnp.asarray(bufs_np)
    lens = jnp.asarray(lens_np)

    # --- encode (L00) -----------------------------------------------------
    out, out_lens = batched_encode(bufs, lens, block_size, 1)
    jax.block_until_ready((out, out_lens))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out, out_lens = batched_encode(bufs, lens, block_size, 1)
        jax.block_until_ready((out, out_lens))  # force the full emission
    enc_s = (time.perf_counter() - t0) / iters
    enc_gbps = total / enc_s / 1e9

    comp_total = int(np.asarray(out_lens).sum())
    ratio = comp_total / total

    # --- decode -----------------------------------------------------------
    out_np = np.asarray(out)
    out_lens_np = np.asarray(out_lens)
    cap = compress_bound(block_size) + 8
    comps = np.zeros((out_np.shape[0], cap), np.uint8)
    comps[:, : out_np.shape[1]] = out_np
    comps_d = jnp.asarray(comps)
    clens_d = jnp.asarray(out_lens_np.astype(np.int32))

    dec, dec_lens, errs = batched_decode(comps_d, clens_d, block_size)
    jax.block_until_ready(dec_lens)
    assert int(np.asarray(errs).sum()) == 0, "decode error in bench"
    # verify roundtrip before timing
    dec_np = np.asarray(dec)
    recon = b"".join(
        dec_np[b, : int(np.asarray(dec_lens)[b])].tobytes()
        for b in range(dec_np.shape[0])
    )
    assert recon == data, "roundtrip mismatch in bench"

    t0 = time.perf_counter()
    for _ in range(iters):
        dec, dec_lens, errs = batched_decode(comps_d, clens_d, block_size)
        jax.block_until_ready((dec, dec_lens))
    dec_s = (time.perf_counter() - t0) / iters
    dec_gbps = total / dec_s / 1e9

    # Baseline anchor: reference's generic ~0.4 GB/s/core compression claim
    # (BASELINE.md §A).
    result = {
        "metric": "block_parallel_L00_encode_throughput",
        "value": round(enc_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / 0.4, 3),
        "decode_GBps": round(dec_gbps, 4),
        "decode_vs_baseline": round(dec_gbps / 2.0, 3),
        "compression_ratio": round(ratio, 4),
        "block_size": block_size,
        "payload_MiB": total_mb,
        "backend": backend,
        "n_blocks": int(bufs_np.shape[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
