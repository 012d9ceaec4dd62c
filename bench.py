"""Benchmark driver — prints ONE JSON line with the headline metric.

Measures steady-state per-chip block-parallel LZ4 throughput (encode at L00
and decode) on a deterministic Silesia-like synthetic corpus (the real
Silesia corpus is not downloadable in this environment; the mix below
approximates its ~2.1x LZ4 compressibility).  The baseline anchor is the
reference's published generic claim of ~0.4 GB/s compression and ~2 GB/s
decompression per CPU core (reference README.md:11-12; see BASELINE.md §A).

Methodology notes (hard-won):
- every timed call uses a DISTINCT input batch: the TPU runtime memoizes
  identical (executable, inputs) executions, so repeat-input loops measure
  the result cache, not the kernel;
- the minimum over iterations is reported: the remote-TPU tunnel
  occasionally injects multi-hundred-ms service hiccups;
- `jax.block_until_ready` on ALL outputs: forcing only a scalar lets XLA
  dead-code-eliminate the byte-emission work.

Usage: python bench.py
Env:   LZ4TPU_BENCH_BLOCK=65536   block size in bytes
       LZ4TPU_BENCH_MB=16         payload per batch in MiB
       LZ4TPU_BENCH_ITERS=5       timed iterations (= distinct batches)
       LZ4TPU_BENCH_REAL=1        device configs run on rotating windows
                                  of real image bytes instead of the
                                  synthetic mix (ratios ~0.49 vs ~0.45;
                                  measured: decode +2%, encode -16% —
                                  probe-bound on noisier bytes)
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
    words = rng.integers(0, len(vocab), quarter // 4)  # oversample
    parts.append(b"".join(vocab[w] for w in words)[:quarter])

    # structured binary: repeating record layout with varying fields
    rec = np.zeros((quarter // 64 + 1, 64), np.uint8)
    rec[:, :16] = np.arange(16, dtype=np.uint8)
    rec[:, 16:32] = rng.integers(0, 4, (rec.shape[0], 16), dtype=np.uint8)
    rec[:, 32:] = (np.arange(rec.shape[0], dtype=np.uint32)[:, None]
                   .view(np.uint8).reshape(rec.shape[0], 4).repeat(8, axis=1))
    parts.append(rec.tobytes()[:quarter])

    # periodic runs (RLE-ish)
    run_lens = rng.integers(3, 60, quarter // 10)  # oversample
    vals = rng.integers(0, 256, quarter // 10, dtype=np.uint8)
    runs = np.repeat(vals, run_lens)
    parts.append(runs.tobytes()[:quarter])

    # low-entropy noise: bytes from a 16-symbol alphabet
    noise = (rng.integers(0, 16, total_bytes - 3 * quarter) * 13).astype(np.uint8)
    parts.append(noise.tobytes())

    out = b"".join(parts)
    assert len(out) >= total_bytes, (len(out), total_bytes)
    return out[:total_bytes]


_REAL_POOL = None


def bench_corpus(total_bytes: int, seed: int = 0) -> bytes:
    """Input generator for the device configs: the synthetic mix by
    default, or rotating windows of REAL image bytes (tests/realcorpus.py)
    with LZ4TPU_BENCH_REAL=1.  The seed-dependent rotation keeps every
    timed batch a DISTINCT input (the runtime memoizes identical
    (executable, inputs) executions), while the byte distribution stays
    that of real data.  Ratios then sit near the real-bytes row's ~0.49
    rather than the synthetic ~0.45."""
    if os.environ.get("LZ4TPU_BENCH_REAL") != "1":
        return make_corpus(total_bytes, seed)
    global _REAL_POOL
    if _REAL_POOL is None or len(_REAL_POOL) < total_bytes:
        tests_dir = os.path.join(os.path.dirname(__file__), "tests")
        if tests_dir not in sys.path:
            sys.path.insert(0, tests_dir)
        from realcorpus import real_corpus

        _REAL_POOL = real_corpus(max(total_bytes, 32 << 20))
        while len(_REAL_POOL) < total_bytes:  # image smaller than request:
            _REAL_POOL = _REAL_POOL * 2       # tile rather than loop forever
    off = (seed * 1048573) % len(_REAL_POOL)
    if off + total_bytes <= len(_REAL_POOL):
        return _REAL_POOL[off : off + total_bytes]
    return (_REAL_POOL[off:] + _REAL_POOL[:off])[:total_bytes]


# --- ceiling model (VERDICT round-4 item #5) -------------------------------
# The per-chip device kernels are scalar-core designs whose measured
# structural ceilings are derived in PERFORMANCE.md; emitting them next to
# the measured numbers makes the "MFU analog" self-contained in this JSON.
#
#   decode: the primitive-sum floor is TWO-TERM, per stream shape —
#           per-SEQUENCE parse cost (token+offset loads 4+4, one flat
#           cond ~15, back-edge ~6 -> ~29 cyc) plus per-WORD copy cost
#           (packed-word append ~11 cyc / 4 output bytes), on the
#           ~0.94 GHz v5e scalar core (ubench primitive table,
#           PERFORMANCE.md).  On the dense kbench stream shape
#           (556k seqs / 4 MiB, ~2.5 words/seq) this reproduces the
#           documented ~118-125 MB/s figure; sparser streams (fewer
#           sequences, more copy bytes each) get a higher floor, and
#           the measured kernel sits at ~0.5-0.7 of it there because
#           the short-trip copy loops carry ~2.4x VLIW scheduling slack
#           (measured ~26 vs 11 cyc/word — the session-4 diagnostic's
#           closed residual; no structural lever in the current
#           toolchain).  The floor emitted here is the honest
#           speed-of-light bound, not the practical kernel model.
#   encode FAST: 88 MB/s — the measured find-only (emission-stubbed)
#           kernel rate; the find loop is store-serialization-bound.
#   encode HC (L4-L9): 8 MB/s — the upper end of the measured walk
#           dependency-floor bracket (8.86 serial chain loads/byte at
#           12-25 cyc each).
_DECODE_CYC_PER_SEQ = 29.0
_DECODE_CYC_PER_WORD = 11.0
_SCALAR_CLK_HZ = 0.94e9
_ENCODE_FAST_CEILING_MBPS = 88.0
_ENCODE_HC_CEILING_MBPS = 8.0


def _count_sequences(comp: bytes) -> int:
    """Token-walk one LZ4 block: O(sequences), literals skipped in bulk."""
    n = len(comp)
    i = 0
    seqs = 0
    while i < n:
        tok = comp[i]
        i += 1
        ll = tok >> 4
        if ll == 15:
            while True:
                b = comp[i]
                i += 1
                ll += b
                if b != 255:
                    break
        i += ll
        seqs += 1
        if i >= n:
            break  # last sequence: literals only, no match
        i += 2  # match offset
        if (tok & 15) == 15:  # match-length VLE bytes
            while True:
                b = comp[i]
                i += 1
                if b != 255:
                    break
    return seqs


def _decode_ceiling_mbps(enc_u8, enc_lens, raw_per_block, max_sample=32):
    """Primitive-sum decode ceiling for THIS stream shape, from the
    sequence density of a sample of compressed blocks (two-term model:
    see the ceiling-model comment above)."""
    nb_total = int(enc_u8.shape[0])
    # stride the sample across the batch: the corpus quarters differ in
    # sequence density, so a head-only sample would bias the floor.  The
    # counter is a pure-python token walk, so ALSO cap the sampled
    # compressed bytes — large-block streams (4 MiB blocks, ~556k
    # seqs/block) would otherwise cost tens of untimed seconds per row.
    step = max(1, nb_total // max_sample)
    budget = 4 << 20
    sample = []
    for b in range(0, nb_total, step):
        sample.append(b)
        budget -= int(enc_lens[b])
        if budget <= 0:
            break
    nseq = sum(
        _count_sequences(enc_u8[b, : int(enc_lens[b])].tobytes())
        for b in sample
    )
    if nseq == 0:
        return None
    raw = raw_per_block * len(sample)
    cyc = nseq * _DECODE_CYC_PER_SEQ + (raw / 4.0) * _DECODE_CYC_PER_WORD
    return raw / (cyc / _SCALAR_CLK_HZ) / 1e6


def _ceiling_fields(enc_gbps, dec_gbps, dec_ceiling_mbps, enc_ceiling_mbps):
    """ceiling_MBps + utilization fields for one device config row."""
    out = {}
    if dec_ceiling_mbps:
        out["decode_ceiling_MBps"] = round(dec_ceiling_mbps, 1)
        out["decode_utilization_vs_ceiling"] = round(
            dec_gbps * 1000.0 / dec_ceiling_mbps, 3
        )
    if enc_ceiling_mbps:
        out["encode_ceiling_MBps"] = round(enc_ceiling_mbps, 1)
        out["encode_utilization_vs_ceiling"] = round(
            enc_gbps * 1000.0 / enc_ceiling_mbps, 3
        )
    return out


def _device_config(block_size, total, iters, uniq, attempts, opt=None):
    """Measure the Pallas device path at one level (attempts=0 -> L00 FAST,
    else HC chain depth; opt=(sufficient, full) selects the optimal parse).
    Returns (enc_gbps, dec_gbps, ratio, extras) with the roundtrip asserted
    on the first batch; extras carries the ceiling-model fields."""
    import functools

    import jax
    import jax.numpy as jnp

    from lz4_tpu.ops.decode_pallas6 import pallas_decode6 as pallas_decode5
    from lz4_tpu.ops.encode_pallas5 import pallas_encode5 as _enc5
    from lz4_tpu.parallel.blocks import comp_capacity, split_blocks

    if opt:
        pallas_encode5 = functools.partial(
            _enc5, opt_sufficient=opt[0], opt_full=opt[1]
        )
    else:
        pallas_encode5 = _enc5

    enc_batches = []
    datas = []
    for s in range(iters + 1):
        data = bench_corpus(total, seed=uniq * 100 + attempts * 10 + s)
        bufs_np, lens_np = split_blocks(data, block_size)
        enc_batches.append(
            # u8 staging: shares the production wrappers' u8-input
            # executables (the widen runs on device)
            (jnp.asarray(bufs_np), jnp.asarray(lens_np))
        )
        datas.append(data)
    jax.block_until_ready([b[0] for b in enc_batches])
    n_blocks = -(-total // block_size)

    out, meta = pallas_encode5(*enc_batches[0], block_size, attempts)
    mh0 = np.asarray(meta).reshape(-1, 8)  # compile + warm + drain
    assert int(mh0[:, 1].sum()) == 0
    # pipelined dispatch (issue all batches, then drain): measures the
    # sustained rate a pipelining caller gets; the ~29 ms tunnel dispatch
    # latency amortizes over the batch train
    # single pass over DISTINCT batches (the runtime memoizes repeated
    # (executable, inputs) pairs — a repeat pass would time the cache)
    t0 = time.perf_counter()
    outs = [
        pallas_encode5(*enc_batches[s], block_size, attempts)
        for s in range(1, iters + 1)
    ]
    metas = [np.asarray(m).reshape(-1, 8) for _, m in outs]
    enc_times = [time.perf_counter() - t0]
    # the WARM batch's output seeds the decode warm-up/roundtrip slot, so
    # all `iters` timed encode outputs become timed decode batches (with
    # iters=1 the decode loop was previously empty -> a fake 0.0)
    warm_words = np.ascontiguousarray(
        np.asarray(out).reshape(out.shape[0], -1)
    )
    enc_outs = [(warm_words.view(np.uint8), mh0[:, 0])]
    for (out, _), mh in zip(outs, metas):
        assert int(mh[:, 1].sum()) == 0
        words = np.ascontiguousarray(
            np.asarray(out).reshape(out.shape[0], -1)
        )
        enc_outs.append((words.view(np.uint8), mh[:, 0]))
    enc_gbps = total * iters / min(enc_times) / 1e9
    ratio = float(enc_outs[0][1].sum()) / total

    cap = comp_capacity(block_size)
    dec_batches = []
    for s in range(len(enc_outs)):
        out_np, ol_np = enc_outs[s]
        comps = np.zeros((out_np.shape[0], cap), np.uint8)
        w = min(cap, out_np.shape[1])
        comps[:, :w] = out_np[:, :w]
        dec_batches.append(
            (jnp.asarray(comps), jnp.asarray(ol_np.astype(np.int32)))
        )
    jax.block_until_ready([b[0] for b in dec_batches])

    # production mode pick (full2 for FAST-shaped streams, full2v for
    # HC/OPT-shaped ones — see parallel.blocks._pick_decode_mode); fixed
    # across warm + timed calls so no compile lands in the timed region
    from lz4_tpu.parallel.blocks import _pick_decode_mode

    dmode = _pick_decode_mode(np.asarray(enc_outs[0][1]), block_size)
    pallas_decode5 = functools.partial(pallas_decode5, mode=dmode)

    dec, meta, dcapw = pallas_decode5(*dec_batches[0], block_size)
    meta_h = np.asarray(meta).reshape(-1, 8)
    assert int(meta_h[:, 1].sum()) == 0, "decode error in bench"
    words = np.ascontiguousarray(np.asarray(dec).reshape(dec.shape[0], -1))
    u8 = words.view(np.uint8)
    recon = b"".join(
        u8[b, dcapw * 4 : dcapw * 4 + int(meta_h[b, 0])].tobytes()
        for b in range(n_blocks)
    )
    assert recon == datas[0], "roundtrip mismatch in bench"

    t0 = time.perf_counter()
    outs = [
        pallas_decode5(*dec_batches[s], block_size)
        for s in range(1, len(dec_batches))
    ]
    metas = [np.asarray(m).reshape(-1, 8) for _, m, _ in outs]
    dec_times = [time.perf_counter() - t0]
    for mh in metas:
        assert int(mh[:, 1].sum()) == 0
    dec_gbps = total * (len(dec_batches) - 1) / min(dec_times) / 1e9

    enc_u8, enc_lens = enc_outs[0]
    dec_ceiling = _decode_ceiling_mbps(
        enc_u8[:n_blocks], enc_lens, total / max(1, n_blocks)
    )
    enc_ceiling = (
        _ENCODE_FAST_CEILING_MBPS
        if attempts == 0
        else (None if opt else _ENCODE_HC_CEILING_MBPS)
    )
    extras = _ceiling_fields(enc_gbps, dec_gbps, dec_ceiling, enc_ceiling)
    return enc_gbps, dec_gbps, ratio, extras


def _device_config_stream(block_size, total, iters, uniq, level=0):
    """Device path for blocks beyond the 64 KB SMEM staging cap: the
    ring-streamed kernels (ops/*_pallas_stream), timed end-to-end through
    the host wrappers (np staging included — the production route).
    Covers BASELINE config #2 (4 MB independent blocks) via
    LZ4TPU_BENCH_BLOCK=4194304."""
    import numpy as np

    from lz4_tpu.ops.decode_pallas_stream import decode_blocks_pallas_stream
    from lz4_tpu.ops.encode_pallas_stream import encode_blocks_pallas_stream
    from lz4_tpu.parallel.blocks import comp_capacity, split_blocks

    datas, enc_in = [], []
    for s in range(iters + 1):
        data = bench_corpus(total, seed=uniq * 100 + s)
        bufs, lens = split_blocks(data, block_size)
        enc_in.append((bufs, lens))
        datas.append(data)

    def run_enc(k):
        return encode_blocks_pallas_stream(
            enc_in[k][0], enc_in[k][1], block_size, level
        )

    out0, clens0, errs0 = run_enc(0)  # compile + warm
    assert int(np.asarray(errs0).sum()) == 0
    t0 = time.perf_counter()
    outs = [run_enc(k) for k in range(1, iters + 1)]
    enc_t = time.perf_counter() - t0
    for _, _, errs in outs:
        assert int(np.asarray(errs).sum()) == 0
    enc_gbps = total * iters / enc_t / 1e9
    ratio = float(np.asarray(clens0).sum()) / total

    cap = comp_capacity(block_size)
    dec_in = []
    for out, clens, _ in [(out0, clens0, errs0)] + outs:
        comps = np.zeros((out.shape[0], cap), np.uint8)
        w = min(cap, out.shape[1])
        comps[:, :w] = out[:, :w]
        dec_in.append((comps, np.asarray(clens, np.int32)))

    raw0, lens0, derr0 = decode_blocks_pallas_stream(
        dec_in[0][0], dec_in[0][1], block_size, mode="full2v"
    )
    assert int(np.asarray(derr0).sum()) == 0
    recon = b"".join(
        raw0[b, : int(lens0[b])].tobytes() for b in range(raw0.shape[0])
    )
    assert recon == datas[0], "streaming roundtrip mismatch in bench"
    t0 = time.perf_counter()
    for k in range(1, len(dec_in)):
        _, _, derr = decode_blocks_pallas_stream(
            dec_in[k][0], dec_in[k][1], block_size, mode="full2v"
        )
        assert int(np.asarray(derr).sum()) == 0
    dec_gbps = total * (len(dec_in) - 1) / (time.perf_counter() - t0) / 1e9
    nb0 = out0.shape[0]
    dec_ceiling = _decode_ceiling_mbps(
        np.asarray(out0), np.asarray(clens0), total / max(1, nb0)
    )
    enc_ceiling = _ENCODE_FAST_CEILING_MBPS if level == 0 else None
    extras = _ceiling_fields(enc_gbps, dec_gbps, dec_ceiling, enc_ceiling)
    return enc_gbps, dec_gbps, ratio, extras


def _scaling_device_config(block_size, total, iters, uniq):
    """Multi-chip scaling over the PRODUCTION Pallas kernels (BASELINE
    N-host efficiency metric, VERDICT round-2 item #5).

    shard_maps `encode_pallas5`/`decode_pallas6` block-parallel over 1, 2,
    4, ... device meshes (every power of two the backend provides) and
    reports encode/decode GB/s per count plus parallel efficiency
    (T1/TN)/N.  On this environment's single tunneled chip only n=1 runs —
    which still validates the exact shard_map path a pod slice would use;
    on a real slice the larger counts light up with zero code changes.
    The virtual-CPU-mesh proxy (scaling_virtual_cpu_mesh) remains the
    multi-device efficiency stand-in until then.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lz4_tpu.ops.decode_pallas6 import pallas_decode6
    from lz4_tpu.ops.encode_pallas5 import pallas_encode5
    from lz4_tpu.parallel.blocks import comp_capacity, split_blocks

    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    cap = comp_capacity(block_size)
    out = {"block_size": block_size, "devices_available": len(devs)}
    for n in counts:
        mesh = Mesh(np.asarray(devs[:n]), ("block",))
        spec = P("block")
        sh = NamedSharding(mesh, spec)

        def enc_step(bufs, lens):
            o, m = pallas_encode5(bufs, lens, block_size, 0)
            return o, m.reshape(m.shape[0], 8)

        def dec_step(comps, clens):
            o, m, _ = pallas_decode6(comps, clens, block_size)
            return o.reshape(o.shape[0], -1), m.reshape(m.shape[0], 8)

        enc = jax.jit(shard_map(
            enc_step, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec), check_vma=False,
        ))
        dec = jax.jit(shard_map(
            dec_step, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec), check_vma=False,
        ))

        batches = []
        for s in range(iters + 1):
            data = bench_corpus(total, seed=uniq * 17 + 3 * s + n)
            bufs, lens = split_blocks(data, block_size, pad_to=n)
            batches.append((
                jax.device_put(jnp.asarray(bufs), sh),
                jax.device_put(jnp.asarray(lens), sh),
            ))
        jax.block_until_ready([b[0] for b in batches])
        o0, m0 = enc(*batches[0])  # compile + warm
        m0h = np.asarray(m0)
        assert int(m0h[:, 1].sum()) == 0
        t0 = time.perf_counter()
        outs = [enc(*batches[s]) for s in range(1, iters + 1)]
        metas = [np.asarray(m) for _, m in outs]
        enc_t = time.perf_counter() - t0
        for mh in metas:
            assert int(mh[:, 1].sum()) == 0
        enc_gbps = total * iters / enc_t / 1e9

        dec_batches = []
        for (o, _), mh in zip([(o0, m0)] + outs, [m0h] + metas):
            words = np.ascontiguousarray(np.asarray(o).reshape(o.shape[0], -1))
            u8 = words.view(np.uint8)
            comps = np.zeros((u8.shape[0], cap), np.uint8)
            w = min(cap, u8.shape[1])
            comps[:, :w] = u8[:, :w]
            dec_batches.append((
                jax.device_put(jnp.asarray(comps), sh),
                jax.device_put(jnp.asarray(mh[:, 0].astype(np.int32)), sh),
            ))
        jax.block_until_ready([b[0] for b in dec_batches])
        d0, dm0 = dec(*dec_batches[0])  # compile + warm
        assert int(np.asarray(dm0)[:, 1].sum()) == 0
        t0 = time.perf_counter()
        douts = [dec(*dec_batches[s]) for s in range(1, len(dec_batches))]
        dmetas = [np.asarray(m) for _, m in douts]
        dec_t = time.perf_counter() - t0
        for mh in dmetas:
            assert int(mh[:, 1].sum()) == 0
        dec_gbps = total * (len(dec_batches) - 1) / dec_t / 1e9
        out[f"n{n}"] = {
            "encode_GBps": round(enc_gbps, 4),
            "decode_GBps": round(dec_gbps, 4),
        }
    if len(counts) > 1:
        n_max = counts[-1]
        out["encode_efficiency"] = round(
            out[f"n{n_max}"]["encode_GBps"]
            / out["n1"]["encode_GBps"] / n_max, 4,
        )
        out["decode_efficiency"] = round(
            out[f"n{n_max}"]["decode_GBps"]
            / out["n1"]["decode_GBps"] / n_max, 4,
        )
    return out


def _paired_frame_decode(datas, blobs):
    """Per-round interleaved frame-decode legs (see the call site).  Returns
    the production GB/s numbers plus PAIRED median time ratios, or None
    when canonical liblz4 is unavailable."""
    import ctypes
    import statistics

    from lz4_tpu import frame

    try:
        lib = ctypes.CDLL("liblz4.so.1")
    except OSError:
        return None
    c_sz = ctypes.c_size_t
    lib.LZ4_compressBound.restype = ctypes.c_int
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_default.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    try:
        lib.LZ4F_createDecompressionContext.restype = c_sz
        lib.LZ4F_createDecompressionContext.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint,
        ]
        lib.LZ4F_decompress.restype = c_sz
        lib.LZ4F_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(c_sz),
            ctypes.c_void_p, ctypes.POINTER(c_sz), ctypes.c_void_p,
        ]
        lib.LZ4F_isError.restype = ctypes.c_uint
        lib.LZ4F_isError.argtypes = [c_sz]
        dctx = ctypes.c_void_p()
        assert lib.LZ4F_createDecompressionContext(
            ctypes.byref(dctx), 100
        ) == 0
        have_lz4f = True
    except AttributeError:
        have_lz4f = False

    total = len(datas[0])
    bound = lib.LZ4_compressBound(total)
    cbuf = ctypes.create_string_buffer(bound)
    canon_blobs = []
    for d in datas:
        n = lib.LZ4_compress_default(d, cbuf, total, bound)
        canon_blobs.append(cbuf.raw[:n])
    dst = ctypes.create_string_buffer(total)  # warm canonical target
    dst_np = np.empty(total, np.uint8)        # warm target for ours

    t_ours, t_into, t_cb, t_cf = [], [], [], []
    # ~25 ms/round: run enough paired rounds for a stable median even when
    # the caller's iters is small (this VM's scheduler swings are the
    # whole reason for pairing)
    rounds = max(9, len(datas))
    pairs = [
        (datas[i % len(datas)], blobs[i % len(blobs)])
        for i in range(rounds)
    ]
    for i, (data, blob) in enumerate(pairs):
        i = i % len(datas)  # canonical blob index
        t0 = time.perf_counter()
        r = frame.decompress(blob, workers=8)
        t1 = time.perf_counter()
        nw = frame.decompress_into(blob, dst_np, workers=8)
        t2 = time.perf_counter()
        m = lib.LZ4_decompress_safe(
            canon_blobs[i], dst, len(canon_blobs[i]), total
        )
        t3 = time.perf_counter()
        assert r == data and nw == total and m == total
        t_ours.append(t1 - t0)
        t_into.append(t2 - t1)
        t_cb.append(t3 - t2)
        if have_lz4f:
            srclen = c_sz(len(blob))
            dstlen = c_sz(total)
            t4 = time.perf_counter()
            rc = lib.LZ4F_decompress(
                dctx, dst, ctypes.byref(dstlen),
                blob, ctypes.byref(srclen), None,
            )
            t5 = time.perf_counter()
            assert not lib.LZ4F_isError(rc) and dstlen.value == total
            t_cf.append(t5 - t4)

    med = statistics.median
    out = {
        "frame_decode_threaded_GBps": round(total / med(t_ours) / 1e9, 4),
        "frame_decode_into_threaded_GBps": round(
            total / med(t_into) / 1e9, 4
        ),
        # PAIRED per-round ratios (canonical leg time / ours): > 1.0 means
        # the production threaded path is faster on the same rounds
        "frame_decode_vs_canonical_same_vm": round(
            med([c / o for c, o in zip(t_cb, t_ours)]), 3
        ),
        "frame_decode_into_vs_canonical_same_vm": round(
            med([c / o for c, o in zip(t_cb, t_into)]), 3
        ),
        "frame_decode_paired_rounds": len(t_ours),
    }
    if have_lz4f:
        out["canonical_lz4f_frame_decode_GBps"] = round(
            total / med(t_cf) / 1e9, 4
        )
        out["frame_decode_vs_canonical_lz4f"] = round(
            med([c / o for c, o in zip(t_cf, t_ours)]), 3
        )
    return out


def _host_config(total, iters, uniq):
    """Native host engine: encode GB/s at L00/L09/L12 + decode GB/s
    (single core), plus the threaded frame path at L00."""
    from lz4_tpu import frame, native
    from lz4_tpu.frame.descriptor import EncoderSettings

    if not native.available():
        return None
    out = {}
    datas = [make_corpus(total, seed=uniq * 7 + s) for s in range(iters)]
    for level in (0, 9, 12):
        times = []
        comp = None
        for data in datas:
            t0 = time.perf_counter()
            comp = native.encode(data, level)
            times.append(time.perf_counter() - t0)
        out[f"encode_L{level:02}_GBps"] = round(total / min(times) / 1e9, 4)
        out[f"ratio_L{level:02}"] = round(len(comp) / total, 4)
        if level == 0:
            dt = []
            for data in datas:
                c = native.encode(data, level)
                t0 = time.perf_counter()
                r = native.decode(c, len(data))
                dt.append(time.perf_counter() - t0)
                assert r == data
            out["decode_GBps"] = round(total / min(dt) / 1e9, 4)
    # threaded independent-block frame path (the `lz4 -T` analog)
    s = EncoderSettings(chain_blocks=False, block_size=1 << 18)
    times = []
    for data in datas:
        t0 = time.perf_counter()
        blob = frame.compress(data, settings=s, workers=8)
        times.append(time.perf_counter() - t0)
    out["frame_encode_threaded_GBps"] = round(total / min(times) / 1e9, 4)
    # ...and the matching threaded frame decode (block-parallel across the
    # independent blocks — the production host read path), measured PAIRED
    # same-process with two canonical legs on every round (VERDICT round-4
    # item #1: this VM's ±15% run-to-run swing made min-vs-min ratios lie;
    # per-round interleaved time ratios cancel it):
    #   canon_block: LZ4_decompress_safe of a one-block stream into a warm
    #                reused buffer (the strongest canonical leg);
    #   canon_lz4f:  LZ4F_decompress of OUR frame bytes into a warm buffer
    #                (the true whole-frame apples-to-apples).
    # Ours runs both as the production fresh-allocation `decompress` and as
    # `decompress_into` a warm caller buffer (symmetric buffer policy).
    blobs = [
        frame.compress(data, settings=s, workers=8) for data in datas
    ]
    paired = _paired_frame_decode(datas, blobs)
    if paired:
        out.update(paired)
    else:  # canonical library unavailable: unpaired production numbers
        times = []
        for data, blob in zip(datas, blobs):
            t0 = time.perf_counter()
            r = frame.decompress(blob, workers=8)
            times.append(time.perf_counter() - t0)
            assert r == data
        out["frame_decode_threaded_GBps"] = round(
            total / min(times) / 1e9, 4
        )
    # threaded frame encode at the HC/OPT levels (block-parallel across
    # cores — the per-host production number for L09/L12)
    for level in (9, 12):
        sl = EncoderSettings(
            chain_blocks=False, block_size=1 << 18, compression_level=level
        )
        times = []
        for data in datas[: max(1, len(datas) - 1)]:
            t0 = time.perf_counter()
            blob = frame.compress(data, settings=sl, workers=8)
            times.append(time.perf_counter() - t0)
        out[f"frame_encode_threaded_L{level:02}_GBps"] = round(
            total / min(times) / 1e9, 4
        )
    # BASELINE config #5: chained (dependent) blocks + xxHash32 content
    # checksum — the default frame shape; encode parallelizes (windows known
    # up front), decode is one sequential in-place-window pass
    sc = EncoderSettings(
        chain_blocks=True, content_checksum=True,
        content_length=total, block_size=1 << 18,
    )
    times = []
    for data in datas:
        t0 = time.perf_counter()
        blob = frame.compress(data, settings=sc)
        times.append(time.perf_counter() - t0)
    out["frame_encode_chained_csum_GBps"] = round(total / min(times) / 1e9, 4)
    blobs = [frame.compress(data, settings=sc) for data in datas]
    times = []
    for data, blob in zip(datas, blobs):
        t0 = time.perf_counter()
        r = frame.decompress(blob)
        times.append(time.perf_counter() - t0)
        assert r == data
    out["frame_decode_chained_csum_GBps"] = round(total / min(times) / 1e9, 4)
    # the LZ4F byte-parity chained path (canonical continue schedule,
    # sequential): frames byte-identical to LZ4F_compressFrame
    scc = EncoderSettings(
        chain_blocks=True, content_checksum=True,
        content_length=total, block_size=1 << 18, geometry="canonical",
    )
    times = []
    for data in datas:
        t0 = time.perf_counter()
        blob = frame.compress(data, settings=scc)
        times.append(time.perf_counter() - t0)
    out["frame_encode_chained_canonical_GBps"] = round(
        total / min(times) / 1e9, 4
    )
    canon = _canonical_config(datas)
    if canon:
        out["canonical_liblz4"] = canon
        # production frame paths vs the canonical single-core codec on the
        # SAME VM (the honest apples-to-apples ratio: published reference
        # numbers come from unknown hardware; this one shares the corpus,
        # the allocator and the memory bus).  The decode ratio is emitted
        # by _paired_frame_decode (per-round interleaved); only fall back
        # to the unpaired quotient when that leg was unavailable.
        if canon.get("decode_GBps") and (
            "frame_decode_vs_canonical_same_vm" not in out
        ):
            out["frame_decode_vs_canonical_same_vm"] = round(
                out["frame_decode_threaded_GBps"] / canon["decode_GBps"], 3
            )
        if canon.get("encode_L00_GBps"):
            out["frame_encode_vs_canonical_same_vm"] = round(
                out["frame_encode_threaded_GBps"] / canon["encode_L00_GBps"],
                3,
            )
    return out


def _real_bytes_config(total, iters):
    """Host engines on REAL image bytes (tests/realcorpus.py — ELF, text,
    stdlib sources; the Silesia stand-in), interleaved same-process with
    canonical liblz4 on the SAME bytes.  The VM's ±15% single-core swing
    cancels in the interleaved ratio (CLAUDE.md measurement rules); FAST
    and HC output is byte-identical to canonical, so the ratios compare
    pure speed.  Addresses the round-2 verdict's "bench corpus is
    synthetic" weakness with a real-bytes row next to the synthetic ones.
    """
    import ctypes
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    try:
        from realcorpus import real_corpus
    except ImportError:
        return None
    from lz4_tpu import native

    if not native.available():
        return None
    try:
        lib = ctypes.CDLL("liblz4.so.1")
    except OSError:
        return None
    lib.LZ4_compressBound.restype = ctypes.c_int
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_default.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.LZ4_compress_HC.restype = ctypes.c_int
    lib.LZ4_compress_HC.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]

    import statistics

    import numpy as np

    data = real_corpus(total)
    total = len(data)
    bound = lib.LZ4_compressBound(total)
    cbuf = ctypes.create_string_buffer(bound)
    dbuf = ctypes.create_string_buffer(total)
    obuf = np.empty(bound, np.uint8)   # our zero-copy span target
    odbuf = np.empty(total, np.uint8)

    # Both sides timed as raw engine calls (our zero-copy span entry vs
    # canonical's ctypes binding) and compared as PAIRED per-round time
    # ratios with the median reported — min-of-separate-runs let this
    # VM's scheduler swings masquerade as engine gaps, and the python
    # wrapper's buffer copies handicapped only our leg.
    rounds = max(5, iters)
    re_, rd_, re9_ = [], [], []
    ours_e, ours_d, canon_e, canon_d, ours_e9, canon_e9 = \
        [], [], [], [], [], []
    n = n_ours = 0
    for _ in range(rounds):
        t0 = time.perf_counter()
        n_ours = native.encode_span(data, 0, total, obuf, 0, bound, 0)
        t1 = time.perf_counter()
        n = lib.LZ4_compress_default(data, cbuf, total, bound)
        t2 = time.perf_counter()
        ours_e.append(t1 - t0)
        canon_e.append(t2 - t1)
        re_.append((t2 - t1) / (t1 - t0))
    assert obuf.tobytes()[:n_ours] == cbuf.raw[:n], \
        "FAST canonical byte-parity broke"
    comp = cbuf.raw[:n]

    for _ in range(rounds):
        t0 = time.perf_counter()
        r = native.decode_span(comp, 0, len(comp), odbuf, 0, total)
        t1 = time.perf_counter()
        m = lib.LZ4_decompress_safe(comp, dbuf, len(comp), total)
        t2 = time.perf_counter()
        assert r == total and m == total
        ours_d.append(t1 - t0)
        canon_d.append(t2 - t1)
        rd_.append((t2 - t1) / (t1 - t0))
    assert odbuf.tobytes() == data

    # HC (L9) — byte-identical output, paired rounds
    n9 = n9_ours = 0
    for _ in range(max(3, iters)):
        t0 = time.perf_counter()
        n9_ours = native.encode_span(data, 0, total, obuf, 0, bound, 9)
        t1 = time.perf_counter()
        n9 = lib.LZ4_compress_HC(data, cbuf, total, bound, 9)
        t2 = time.perf_counter()
        ours_e9.append(t1 - t0)
        canon_e9.append(t2 - t1)
        re9_.append((t2 - t1) / (t1 - t0))
    assert obuf.tobytes()[:n9_ours] == cbuf.raw[:n9], \
        "HC canonical byte-parity broke"

    med = statistics.median
    return {
        "corpus_MiB": round(total / (1 << 20), 1),
        "encode_L00_GBps": round(total / med(ours_e) / 1e9, 4),
        "decode_GBps": round(total / med(ours_d) / 1e9, 4),
        "encode_L09_GBps": round(total / med(ours_e9) / 1e9, 4),
        "ratio_L00": round(n / total, 4),
        "ratio_L09": round(n9 / total, 4),
        "canonical_encode_L00_GBps": round(total / med(canon_e) / 1e9, 4),
        "canonical_decode_GBps": round(total / med(canon_d) / 1e9, 4),
        "canonical_encode_L09_GBps": round(total / med(canon_e9) / 1e9, 4),
        # the *_vs_canonical ratios are PAIRED per-round medians (the
        # trustworthy comparison); the absolute GB/s rows above are
        # per-leg medians for trend dashboards
        "encode_vs_canonical": round(med(re_), 3),
        "decode_vs_canonical": round(med(rd_), 3),
        "encode_L09_vs_canonical": round(med(re9_), 3),
        "rounds": rounds,
    }


def _canonical_config(datas):
    """Measured anchors from the canonical upstream liblz4 (system library),
    same corpus, same machine — an honest local baseline next to the
    reference's published claims."""
    import ctypes

    try:
        lib = ctypes.CDLL("liblz4.so.1")
    except OSError:
        return None
    lib.LZ4_compressBound.restype = ctypes.c_int
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_default.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    total = len(datas[0])
    bound = lib.LZ4_compressBound(total)
    out = ctypes.create_string_buffer(bound)
    et, n = [], 0
    for data in datas:
        t0 = time.perf_counter()
        n = lib.LZ4_compress_default(data, out, total, bound)
        et.append(time.perf_counter() - t0)
    comp = out.raw[:n]
    dec = ctypes.create_string_buffer(total)
    dt = []
    for _ in datas:
        t0 = time.perf_counter()
        m = lib.LZ4_decompress_safe(comp, dec, n, total)
        dt.append(time.perf_counter() - t0)
    assert m == total
    return {
        "encode_L00_GBps": round(total / min(et) / 1e9, 4),
        "decode_GBps": round(total / min(dt) / 1e9, 4),
        "ratio_L00": round(n / total, 4),
    }


_SCALING_SNIPPET = r"""
import json, time, sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from lz4_tpu.parallel.blocks import (
    make_mesh, sharded_encode_fn, split_blocks)
sys.path.insert(0, {root!r})
from bench import make_corpus

bs = 65536
total = {total}
uniq = {uniq}
res = {{}}
for nd in (1, 8):
    mesh = make_mesh(jax.devices()[:nd])
    fn = sharded_encode_fn(mesh, bs, 1, mesh.axis_names[0])
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    times = []
    for s in range({iters} + 1):
        data = make_corpus(total, seed=uniq * 3 + s)
        bufs, lens = split_blocks(data, bs, pad_to=nd)
        bufs_d = jax.device_put(jnp.asarray(bufs), sh)
        lens_d = jax.device_put(jnp.asarray(lens), sh)
        t0 = time.perf_counter()
        out, ol = fn(bufs_d, lens_d)
        np.asarray(ol)
        if s:  # first call is compile
            times.append(time.perf_counter() - t0)
    res[nd] = min(times)
import os
ncores = os.cpu_count() or 1
sp = res[1] / res[8]
print(json.dumps({{"t1": res[1], "t8": res[8], "speedup": sp,
                   "efficiency_vs_devices": sp / 8,
                   "physical_cores": ncores,
                   "efficiency_vs_cores": sp / min(8, ncores)}}))
"""


def _scaling_config(total, iters, uniq):
    """Sharded-vs-single scaling on an 8-virtual-CPU-device mesh (separate
    process: the TPU backend cannot be re-pointed in-process).  Reports the
    parallel efficiency of the block-sharded encode path."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    code = _SCALING_SNIPPET.format(
        root=root, total=total, uniq=uniq, iters=iters
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=900,
        )
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception:
        return None


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    block_size = int(os.environ.get("LZ4TPU_BENCH_BLOCK", 64 * 1024))
    if "--scaling" in sys.argv:
        # standalone scaling mode: production-kernel shard_map scaling over
        # every available device count (real chips when present), plus the
        # virtual-CPU-mesh proxy for multi-device efficiency when only one
        # real chip exists
        total_mb = int(os.environ.get("LZ4TPU_BENCH_MB", 8))
        iters = int(os.environ.get("LZ4TPU_BENCH_ITERS", 3))
        uniq = int(time.time()) % 1000000
        dev = _scaling_device_config(
            block_size, total_mb << 20, iters, uniq
        )
        virt = _scaling_config(min(total_mb, 2) << 20, max(2, iters - 1), uniq + 3)
        n_counts = [k for k in dev if k.startswith("n")]
        top = dev.get(sorted(n_counts, key=lambda k: int(k[1:]))[-1], {})
        eff = dev.get(
            "decode_efficiency",
            (virt or {}).get("efficiency_vs_devices"),
        )
        print(json.dumps({
            "metric": "block_parallel_scaling_efficiency",
            "value": eff if eff is not None else 1.0,
            "unit": "fraction",
            "vs_baseline": eff if eff is not None else 1.0,
            "device_scaling_production_kernels": dev,
            "scaling_virtual_cpu_mesh": virt,
            "backend": jax.default_backend(),
            "note": (
                "device counts beyond those listed need a real multi-chip "
                "slice; the shard_map path is identical"
            ),
            "top_count": top,
        }))
        return
    # 16 MiB default: the payload pipelines through fixed 2 MiB batch
    # chunks (no extra compiles) and amortizes the tunnel's ~29 ms fixed
    # dispatch cost, measuring sustained rather than single-call
    # throughput (the reference's CPU numbers are sustained too)
    total_mb = int(os.environ.get("LZ4TPU_BENCH_MB", 16))
    iters = int(os.environ.get("LZ4TPU_BENCH_ITERS", 3))
    full = os.environ.get("LZ4TPU_BENCH_FULL", "1") != "0"
    total = total_mb * (1 << 20)
    backend = jax.default_backend()

    # Timing method (hard-won): `block_until_ready` does NOT reliably block
    # on the tunneled TPU runtime, and the service memoizes identical
    # (executable, inputs) executions across processes.  So every timed call
    # uses a time-unique input batch and is forced by materializing a small
    # digest output (np.asarray), which cannot complete before the kernel.
    uniq = int(time.time()) % 1000000

    # --- device configs: L00 FAST and L09 HC (Pallas kernels) -------------
    # LZ4TPU_BENCH_TRACE=<dir> captures an xprof/XLA trace of the device
    # config (the profiling artifact; view with xprof / tensorboard-plugin)
    trace_dir = os.environ.get("LZ4TPU_BENCH_TRACE")
    if trace_dir:
        import contextlib

        trace_cm = jax.profiler.trace(trace_dir)
    else:
        import contextlib

        trace_cm = contextlib.nullcontext()
    with trace_cm:
        if block_size > 65536:
            # beyond the SMEM staging cap: ring-streamed kernels
            e0, d0, r0, x0 = _device_config_stream(
                block_size, total, iters, uniq
            )
        else:
            e0, d0, r0, x0 = _device_config(
                block_size, total, iters, uniq, attempts=0
            )
    configs = {
        "device_L00": {
            "encode_GBps": round(e0, 4),
            "decode_GBps": round(d0, 4),
            "ratio": round(r0, 4),
            **x0,
        },
    }
    if full and block_size <= 65536:
        hc_total = max(block_size, total // 4)  # HC kernel is ~10x slower
        e9, d9, r9, x9 = _device_config(
            block_size, hc_total, max(2, iters - 1), uniq + 1, attempts=256
        )
        configs["device_L09"] = {
            "encode_GBps": round(e9, 4),
            "decode_GBps": round(d9, 4),
            "ratio": round(r9, 4),
            **x9,
        }
    if (
        full
        and block_size <= 65536
        and os.environ.get("LZ4TPU_BENCH_REAL") != "1"
    ):
        # same kernel shapes as device_L00 (no new compiles), REAL image
        # bytes: real streams carry longer matches than the synthetic mix,
        # so this is where device decode meets its ~118 MB/s ceiling
        try:
            os.environ["LZ4TPU_BENCH_REAL"] = "1"
            er, dr, rr, xr = _device_config(
                block_size, total, max(2, iters - 1), uniq + 5, attempts=0
            )
            configs["device_L00_real_bytes"] = {
                "encode_GBps": round(er, 4),
                "decode_GBps": round(dr, 4),
                "ratio": round(rr, 4),
                **xr,
            }
        except Exception:
            # real corpus unavailable OR a real regression: surface it on
            # stderr (the JSON contract line stays clean) instead of
            # silently dropping the row
            import traceback

            print("device_L00_real_bytes row failed:", file=sys.stderr)
            traceback.print_exc()
        finally:
            os.environ.pop("LZ4TPU_BENCH_REAL", None)
    if full:
        if (
            block_size <= 65536
            and os.environ.get("LZ4TPU_BENCH_L12") != "0"
        ):
            # device optimal parse — in the DEFAULT run since round 5
            # (VERDICT item #3).  A FAILURE drops only this row (logged
            # on stderr), never the driver-contract line.  A COLD compile
            # cache is not a failure: it stalls this row 10-20 min before
            # the JSON prints (no in-process timeout exists for a remote
            # compile) — LZ4TPU_BENCH_L12=0 opts out when that latency is
            # unacceptable; /tmp/jax_cache makes warm reruns ~1 s.
            try:
                e12, d12, r12, x12 = _device_config(
                    block_size, max(block_size, total // 16), 2, uniq + 4,
                    attempts=16384, opt=(4095, True),
                )
                configs["device_L12"] = {
                    "encode_GBps": round(e12, 4),
                    "decode_GBps": round(d12, 4),
                    "ratio": round(r12, 4),
                    **x12,
                    "note": (
                        "encode is the figure of merit here; the small "
                        "payload (encode runs ~2 MB/s) leaves the decode "
                        "number dominated by the ~29 ms/call dispatch — "
                        "see device_L09's decode row for the same stream "
                        "shape at sustained size"
                    ),
                }
            except Exception:
                import traceback

                print("device_L12 row failed:", file=sys.stderr)
                traceback.print_exc()
        host = _host_config(total, iters, uniq + 2)
        if host:
            configs["host"] = host
        real = _real_bytes_config(total, max(2, iters - 1))
        if real:
            configs["host_real_bytes"] = real
        scaling = _scaling_config(
            min(total, 2 << 20), max(2, iters - 1), uniq + 3
        )
        if scaling:
            configs["scaling_virtual_cpu_mesh"] = {
                k: round(v, 4) for k, v in scaling.items()
            }

    # Baseline anchors: reference's ~0.4 GB/s/core compress and ~2 GB/s
    # decompress claims (BASELINE.md §A).
    result = {
        "metric": "block_parallel_L00_roundtrip_throughput",
        "value": round(d0, 4),
        "unit": "GB/s",
        "vs_baseline": round(d0 / 2.0, 4),
        "encode_GBps": round(e0, 4),
        "encode_vs_baseline": round(e0 / 0.4, 4),
        "compression_ratio": round(r0, 4),
        "block_size": block_size,
        "payload_MiB": total_mb,
        "backend": backend,
        "decode_kernel": "pallas",
        "encode_kernel": "pallas",
        "ceiling_model": (
            "decode floor = 29 cyc/sequence + 11 cyc/4 output bytes on the "
            "0.94 GHz v5e scalar core, computed per stream shape from the "
            "batch's sequence count; encode ceilings: FAST 88 MB/s "
            "(measured find-only kernel), HC 8 MB/s (walk dependency-floor "
            "bracket).  Derivations: PERFORMANCE.md"
        ),
        "configs": configs,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
