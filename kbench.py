"""Kernel iteration harness (developer tool, not the driver bench).

Stages decode inputs with the NATIVE encoder (no TPU encode compile — the
5-minute pole in A/B loops), then times selected Pallas decode variants in
one process.  Usage:

    python kbench.py v1 v2 v2p v3 [--mb 4] [--block 65536] [--iters 2]

Decode variants: v1 (round-1 vector), v2/v2p v3 v4/v4p (negative-result
experiments), v5 (scalar packed-word), v6 (one-seq fused arm), v6x
(production fused-run; v6xp = its parse-only profile; v6p/v6l = parse /
parse+literal profiles of the non-fused path), vs (ring-streamed,
>64KB blocks; vsp = parse-only),
v7/v7s/v9/v10 + v8/v8p/v8d (dual-block interleave diagnostic matrix —
see PERFORMANCE.md).  Encode variants: e1 (round-1), e5 (production),
e5f (find-only profile mode), e5x/e5xf (paired-probe negative result),
e5cf (canonical find-only profile),
e5hc/e5hx (L9 serial-walk baseline / flat-miss production walk),
e5opts/e5opt (L12 serial / flat-miss), e5hr/e5optr (fused-run walk —
negative result, see PERFORMANCE.md), e5ef (fused token+literal emit —
negative result).  Round-5 legs: es/esv (streaming canonical, raw vs
ensured candidate verify — measured neutral; escf/esvcf find-only),
e5opt1k/e5opt256 (L12 reduced-depth probes — refuted the search-depth
lever), e5hpx/e5hpl/e5hpc (L9 marginal-cost injections: +store /
+2 loads / +flat cond per walk attempt — all ~free, proving the walk
dependency-bound).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=")[0][2:]: a.split("=")[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    bs = int(opts.get("block", 65536))
    enclevel = int(opts.get("enclevel", 0))  # staging encoder level
    total = int(opts.get("mb", 4)) * (1 << 20)
    iters = int(opts.get("iters", 2))
    variants = args or ["v1", "v2"]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bench import make_corpus
    from lz4_tpu import native
    from lz4_tpu.parallel.blocks import comp_capacity, split_blocks

    print("backend:", jax.default_backend(), flush=True)
    # --uniq=N pins the corpus seeds for cross-process A/B on identical
    # streams (safe: different kernels are different executables, so the
    # runtime's (executable, inputs) memoization cannot alias them)
    uniq = int(opts.get("uniq", int(time.time()) % 1000000))
    cap = comp_capacity(bs)
    n_blocks = total // bs

    dec_batches, datas = [], []
    for s in range(iters + 1):
        data = make_corpus(total, seed=uniq * 10 + s)
        bufs, lens = split_blocks(data, bs)
        comps = np.zeros((bufs.shape[0], cap), np.uint8)
        clens = np.zeros((bufs.shape[0],), np.int32)
        for b in range(bufs.shape[0]):
            c = native.encode(bufs[b, : lens[b]].tobytes(), enclevel)
            comps[b, : len(c)] = np.frombuffer(c, np.uint8)
            clens[b] = len(c)
        dec_batches.append((jnp.asarray(comps, jnp.int32), jnp.asarray(clens)))
        datas.append(data)
    jax.block_until_ready([b[0] for b in dec_batches])
    print("staged (native-encoded)", flush=True)

    def get_fn(name):
        if name == "v1":
            from experiments.decode_pallas import pallas_decode

            return lambda c, l: pallas_decode(c, l, bs), True
        if name == "v2":
            from experiments.decode_pallas2 import pallas_decode2

            return lambda c, l: pallas_decode2(c, l, bs), True
        if name == "v2p":
            from experiments.decode_pallas2 import pallas_decode2

            return lambda c, l: pallas_decode2(c, l, bs, skip_copy=True), False
        if name == "v3":
            from experiments.decode_pallas3 import pallas_decode3

            return lambda c, l: pallas_decode3(c, l, bs), True
        if name == "v4":
            from experiments.decode_pallas4 import pallas_decode4

            return lambda c, l: pallas_decode4(c, l, bs), True
        if name == "v4p":
            from experiments.decode_pallas4 import pallas_decode4

            return lambda c, l: pallas_decode4(c, l, bs, skip_copy=True), False
        if name == "v5":
            from experiments.decode_pallas5 import pallas_decode5

            def run5(c, l):
                out, meta, dcapw = pallas_decode5(c, l, bs)
                # out = packed words incl. 2-word prefix
                return out, meta.reshape(meta.shape[0], 8)

            return run5, "packed"
        if name == "v6":
            from lz4_tpu.ops.decode_pallas6 import pallas_decode6

            def run6(c, l):
                out, meta, dcapw = pallas_decode6(c, l, bs, mode="full")
                return out, meta.reshape(meta.shape[0], 8)

            return run6, "packed"
        if name == "v6v":
            # fused-run + single-extension-byte match VLE in the fast arm
            from lz4_tpu.ops.decode_pallas6 import pallas_decode6

            def run6v(c, l):
                out, meta, dcapw = pallas_decode6(c, l, bs, mode="full2v")
                return out, meta.reshape(meta.shape[0], 8)

            return run6v, "packed"
        if name == "v6x":
            # production default (mode="full2": fused-run inner loop)
            from lz4_tpu.ops.decode_pallas6 import pallas_decode6

            def run6x(c, l):
                out, meta, dcapw = pallas_decode6(c, l, bs)
                return out, meta.reshape(meta.shape[0], 8)

            return run6x, "packed"
        if name == "v6xp":
            # fused-run, parse-only profile (no byte emission)
            from lz4_tpu.ops.decode_pallas6 import pallas_decode6

            def run6xp(c, l):
                out, meta, dcapw = pallas_decode6(c, l, bs, mode="parse2")
                return out, meta.reshape(meta.shape[0], 8)

            return run6xp, False
        if name in ("v6p", "v6l"):
            from lz4_tpu.ops.decode_pallas6 import pallas_decode6

            md = "parse" if name == "v6p" else "lit"

            def run6m(c, l, md=md):
                out, meta, dcapw = pallas_decode6(c, l, bs, mode=md)
                return out, meta.reshape(meta.shape[0], 8)

            return run6m, False
        if name in ("v7", "v7s"):
            from experiments.decode_pallas7 import pallas_decode7

            split_cache = {}
            joint = name == "v7"

            def run7(c, l, joint=joint):
                key = id(c)
                if key not in split_cache:
                    cu, lu = np.asarray(c), np.asarray(l)
                    if cu.shape[0] & 1:
                        cu = np.vstack([cu, np.zeros_like(cu[:1])])
                        lu = np.concatenate([lu, np.zeros((1,), np.int32)])
                    split_cache[key] = tuple(
                        jnp.asarray(x)
                        for x in (cu[0::2], cu[1::2], lu[0::2], lu[1::2])
                    )
                ca, cb, la, lb = split_cache[key]
                oa, ob, ma, mb = pallas_decode7(
                    ca, cb, la, lb, bs, joint=joint
                )
                meta = jnp.concatenate(
                    [ma.reshape(-1, 8), mb.reshape(-1, 8)]
                )
                return (oa, ob), meta

            return run7, "pair"
        if name == "v9":
            from experiments.decode_pallas7 import pallas_decode9

            split9 = {}

            def run9(c, l):
                key = id(c)
                if key not in split9:
                    cu, lu = np.asarray(c), np.asarray(l)
                    if cu.shape[0] & 1:
                        cu = np.vstack([cu, np.zeros_like(cu[:1])])
                        lu = np.concatenate([lu, np.zeros((1,), np.int32)])
                    split9[key] = tuple(
                        jnp.asarray(x)
                        for x in (cu[0::2], cu[1::2], lu[0::2], lu[1::2])
                    )
                ca, cb, la, lb = split9[key]
                oa, ob, ma, mb = pallas_decode9(ca, cb, la, lb, bs)
                meta = jnp.concatenate(
                    [ma.reshape(-1, 8), mb.reshape(-1, 8)]
                )
                return (oa, ob), meta

            return run9, "pair"
        if name == "v10":
            from experiments.decode_pallas7 import pallas_decode10

            st10 = {}

            def run10(c, l):
                key = id(c)
                if key not in st10:
                    cu, lu = np.asarray(c), np.asarray(l)
                    if cu.shape[0] & 1:
                        cu = np.vstack([cu, np.zeros_like(cu[:1])])
                        lu = np.concatenate([lu, np.zeros((1,), np.int32)])
                    st10[key] = (
                        jnp.asarray(
                            cu.reshape(cu.shape[0] // 2, 2, cu.shape[1])
                        ),
                        jnp.asarray(lu),
                    )
                c2, l2 = st10[key]
                out, meta = pallas_decode10(c2, l2, bs)
                return out, meta.reshape(-1, 8)

            return run10, "packed2"
        if name in ("v8", "v8p", "v8d"):
            from experiments.decode_pallas7 import pallas_decode7_single

            pad = name == "v8p"
            dead = name == "v8d"

            def run8(c, l, pad=pad, dead=dead):
                out, meta = pallas_decode7_single(
                    c, l, bs, pad_state=pad, dead_operands=dead
                )
                return out, meta.reshape(meta.shape[0], 8)

            return run8, "packed"
        if name == "vs":
            from lz4_tpu.ops.decode_pallas_stream import pallas_decode_stream

            def runs(c, l):
                out, meta = pallas_decode_stream(c, l, bs)
                return out, meta.reshape(meta.shape[0], 8)

            return runs, "packed0"
        if name == "vsv":
            # streaming decoder, VLE-capable fused run (mode full2v)
            from lz4_tpu.ops.decode_pallas_stream import pallas_decode_stream

            def runsv(c, l):
                out, meta = pallas_decode_stream(c, l, bs, mode="full2v")
                return out, meta.reshape(meta.shape[0], 8)

            return runsv, "packed0"
        if name == "vsp":
            # streaming decoder, parse-only profile (no byte emission)
            from lz4_tpu.ops.decode_pallas_stream import pallas_decode_stream

            def runsp(c, l):
                out, meta = pallas_decode_stream(c, l, bs, mode="parse")
                return out, meta.reshape(meta.shape[0], 8)

            return runsp, False
        raise SystemExit(f"unknown variant {name}")

    # encode variants time raw->compressed instead (same staged corpus)
    def get_enc_fn(name):
        lvl = 9 if name.endswith("hc") else 0
        if name.startswith("e1"):
            from experiments.encode_pallas import pallas_encode

            def run(bufs, lens):
                out, meta = pallas_encode(
                    bufs, lens, bs, 256 if lvl else 0
                )
                return out, meta
            return run
        if name == "e5cw":
            # canonical find with the CARRIED compare word (one SMEM load
            # fewer per probe; byte-identical) — A/B vs e5
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def runcw(bufs, lens):
                out, meta = pallas_encode5(bufs, lens, bs, 0,
                                           canon_carry_w=True)
                return out, meta.reshape(meta.shape[0], 8)
            return runcw
        if name == "e5x":
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def runx(bufs, lens):
                out, meta = pallas_encode5(bufs, lens, bs, 0,
                                           pair_probe=True)
                return out, meta.reshape(meta.shape[0], 8)
            return runx
        if name == "e5xf":
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def runxf(bufs, lens):
                out, meta = pallas_encode5(bufs, lens, bs, 0,
                                           profile="find", pair_probe=True)
                return out, meta.reshape(meta.shape[0], 8)
            return runxf
        if name in ("es", "escf", "esd", "esf", "esv", "esvcf"):
            # streaming encoder (any block size; use with --block >= 256K):
            # es = canonical schedule (production default: raw candidate
            # verify + residency check, round 5), esv = canonical with the
            # OLD always-ensured verify (A/B baseline), escf/esvcf = the
            # matching canonical find-only profiles, esd = dense 15-bit
            # schedule, esf = dense find-only
            from lz4_tpu.ops.encode_pallas_stream import pallas_encode_stream

            sched = "dense" if name in ("esd", "esf") else "canonical"
            prof = {"es": "full", "escf": "cfind", "esv": "full",
                    "esvcf": "cfind", "esd": "full", "esf": "find"}[name]
            rawv = name not in ("esv", "esvcf")

            def runes(bufs, lens, sched=sched, prof=prof, rawv=rawv):
                out, meta = pallas_encode_stream(
                    bufs, lens, bs, 0, profile=prof, fast_schedule=sched,
                    canon_raw_verify=rawv,
                )
                return out, meta.reshape(meta.shape[0], 8)
            return runes
        if name in ("e5opt", "e5opts", "e5optr", "e5opt1k", "e5opt256"):
            # L12 optimal parse; e5opts = serial walk, e5opt = flat-miss
            # walk, e5optr = fused-run walk (A/B ladder); e5opt1k/e5opt256
            # = REDUCED-DEPTH searches (1024/256 attempts, NOT parity —
            # round-5 probe of whether search depth dominates L12 time)
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            att = {"e5opt1k": 1024, "e5opt256": 256}.get(name, 16384)

            def runopt(bufs, lens, name=name, att=att):
                out, meta = pallas_encode5(
                    bufs, lens, bs, att, opt_sufficient=4095,
                    opt_full=True, hc_flat=(name != "e5opts"),
                    hc_run=(name == "e5optr"),
                )
                return out, meta.reshape(meta.shape[0], 8)
            return runopt
        if name in ("e5hx", "e5hr", "e5hpx", "e5hpl", "e5hpc"):
            # L9 flat-miss walk (e5hx) vs fused-run walk (e5hr); e5hp* =
            # round-5 marginal-cost injection legs (xstore/xload/xcond —
            # byte-identical; deltas vs e5hx price one extra store / two
            # dependent loads / one flat cond per walk attempt)
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            hp = {"e5hpx": "xstore", "e5hpl": "xload",
                  "e5hpc": "xcond"}.get(name, "")

            def runhx(bufs, lens, name=name, hp=hp):
                out, meta = pallas_encode5(bufs, lens, bs, 256,
                                           hc_flat=True,
                                           hc_run=(name == "e5hr"),
                                           hc_prof=hp)
                return out, meta.reshape(meta.shape[0], 8)
            return runhx
        if name == "e5f":
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def runf(bufs, lens):
                out, meta = pallas_encode5(
                    bufs, lens, bs, 0, profile="find"
                )
                return out, meta.reshape(meta.shape[0], 8)
            return runf
        if name in ("e5cpx", "e5cpl", "e5cpc"):
            # round-5 marginal-cost injections for the canonical FAST find
            # (+store / +2 loads / +flat cond per probe; byte-identical —
            # deltas vs e5 price the find loop's free issue slots)
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            cp = {"e5cpx": "xstore", "e5cpl": "xload",
                  "e5cpc": "xcond"}[name]

            def runcp(bufs, lens, cp=cp):
                out, meta = pallas_encode5(bufs, lens, bs, 0, cf_prof=cp)
                return out, meta.reshape(meta.shape[0], 8)
            return runcp
        if name == "e5cf":
            # canonical FAST, find-only profile (no byte emission)
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def runcf(bufs, lens):
                out, meta = pallas_encode5(bufs, lens, bs, 0, profile="cfind")
                return out, meta.reshape(meta.shape[0], 8)
            return runcf
        if name == "e5ef":
            # token+first-literal-group fused append (measured negative:
            # ~1% slower than the plain emitter; kept for the record)
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def runef(bufs, lens):
                out, meta = pallas_encode5(
                    bufs, lens, bs, 256 if lvl else 0, emit_fuse=True
                )
                return out, meta.reshape(meta.shape[0], 8)
            return runef
        if name.startswith("e5"):
            # e5hc = L9 with the serial (pre-flat-miss) walk for A/B
            from lz4_tpu.ops.encode_pallas5 import pallas_encode5

            def run(bufs, lens):
                out, meta = pallas_encode5(
                    bufs, lens, bs, 256 if lvl else 0,
                    hc_flat=not name.endswith("hc"), hc_run=False,
                )
                return out, meta.reshape(meta.shape[0], 8)
            return run
        return None

    enc_variants = [v for v in variants if v.startswith("e")]
    if enc_variants:
        enc_batches = []
        for s in range(iters + 1):
            bufs, lens = split_blocks(datas[s], bs)
            enc_batches.append(
                (jnp.asarray(bufs, jnp.int32), jnp.asarray(lens))
            )
        jax.block_until_ready([b[0] for b in enc_batches])
        for name in enc_variants:
            fn = get_enc_fn(name)
            t0 = time.time()
            out, meta = fn(*enc_batches[0])
            mh = np.asarray(meta)
            print(f"{name} compile+run {time.time()-t0:.1f}s "
                  f"errs={int(mh[:,1].sum())} "
                  f"ratio={float(mh[:,0].sum())/total:.4f}", flush=True)
            if name.startswith("e5") and not name.endswith("f"):  # roundtrip batch 0 (profile variants emit no bytes)
                words = np.ascontiguousarray(
                    np.asarray(out).reshape(out.shape[0], -1)
                )
                u8 = words.view(np.uint8)
                recon = b"".join(
                    native.decode(
                        u8[b, : int(mh[b, 0])].tobytes(), capacity=bs
                    )
                    for b in range(n_blocks)
                )
                assert recon == datas[0], f"{name} roundtrip FAIL"
                print(f"{name} roundtrip ok", flush=True)
            ts = []
            for s in range(1, iters + 1):
                t0 = time.perf_counter()
                out, meta = fn(*enc_batches[s])
                mh = np.asarray(meta)
                ts.append(time.perf_counter() - t0)
                assert int(mh[:, 1].sum()) == 0
            best = min(ts)
            print(f"{name}: {total/best/1e6:.1f} MB/s  "
                  f"({best*1000:.1f} ms / {total>>20} MiB)", flush=True)

    for name in [v for v in variants if not v.startswith("e")]:
        fn, check = get_fn(name)
        t0 = time.time()
        dec, meta = fn(*dec_batches[0])
        mh = np.asarray(meta)
        print(f"{name} compile+run {time.time()-t0:.1f}s "
              f"errs={int(mh[:,1].sum())}", flush=True)
        if check == "packed2":
            w = np.ascontiguousarray(
                np.asarray(dec).reshape(-1, np.asarray(dec).shape[-1])
            )
            u8 = w.view(np.uint8).reshape(w.shape[0], -1)
            recon = b"".join(
                u8[b, 8 : 8 + int(mh[b, 0])].tobytes()
                for b in range(n_blocks)
            )
            assert recon == datas[0], f"{name} roundtrip FAIL"
        elif check == "pair":
            oa, ob = dec
            mh2 = mh.reshape(2, -1, 8)
            skip = 8
            parts = []
            for b in range(n_blocks):
                half = np.ascontiguousarray(
                    np.asarray(oa if b % 2 == 0 else ob).reshape(
                        np.asarray(oa).shape[0], -1
                    )
                )
                u8 = half.view(np.uint8).reshape(half.shape[0], -1)
                ln = int(mh2[b % 2, b // 2, 0])
                parts.append(u8[b // 2, skip : skip + ln].tobytes())
            assert b"".join(parts) == datas[0], f"{name} roundtrip FAIL"
        elif check in ("packed", "packed0"):
            skip = 8 if check == "packed" else 0
            words = np.ascontiguousarray(
                np.asarray(dec).reshape(np.asarray(dec).shape[0], -1)
            )
            u8 = words.view(np.uint8).reshape(words.shape[0], -1)
            recon = b"".join(
                u8[b, skip : skip + int(mh[b, 0])].tobytes()
                for b in range(n_blocks)
            )
            assert recon == datas[0], f"{name} roundtrip FAIL"
        elif check:
            dh = np.asarray(dec)
            recon = b"".join(
                dh[b, : int(mh[b, 0])].astype(np.uint8).tobytes()
                for b in range(n_blocks)
            )
            assert recon == datas[0], f"{name} roundtrip FAIL"
        ts = []
        for s in range(1, iters + 1):
            t0 = time.perf_counter()
            dec, meta = fn(*dec_batches[s])
            mh = np.asarray(meta)
            ts.append(time.perf_counter() - t0)
            if check:
                assert int(mh[:, 1].sum()) == 0
        best = min(ts)
        print(f"{name}: {total/best/1e6:.1f} MB/s  "
              f"({best*1000:.1f} ms / {total>>20} MiB)", flush=True)


if __name__ == "__main__":
    main()
