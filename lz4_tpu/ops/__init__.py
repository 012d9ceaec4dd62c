"""Device (TPU) kernels.

Production paths (all-scalar packed-word pipelines; see PERFORMANCE.md for
the measured cost model that selected them):

- `encode_pallas5`  — full-ladder encoder (FAST, reference-lookahead HC,
  exact optimal parse), blocks <= 64 KB, staged SMEM
- `encode_pallas_stream` — same encoder body over SMEM rings + HBM DMA:
  any block size, plus dictionary mode ([dict | src] flat prefix) — the
  chained-frame batch path.  One-shot no-dict FAST runs the canonical
  upstream schedule at EVERY block size (byU16 below 64 KB + 11, byU32
  with the 32-bit-emulated 5-byte hash at/above) — byte-identical to
  LZ4_compress_default; dict/chained batches use the dense family
- `decode_pallas6`  — decoder, blocks <= 64 KB (branch-merged parse,
  full-word copies, fused fast arm; mode="full2v" extends the fast arm
  to 1-byte match VLE — +8% on HC-heavy streams, see PERFORMANCE.md).
  `parallel.blocks.decode_blocks_device` auto-picks full2v for
  HC/OPT-shaped batches by compressed ratio (< 0.40), pinnable via
  LZ4TPU_DECODE_MODE
- `decode_pallas_stream` — decoder for 256 KB - 4 MB+ blocks (ring DMA)
- `xxh32_pallas`    — xxHash32 device kernel
- `encode_jax` / `decode_jax` — pure-XLA dense kernels (CPU-mesh paths:
  tests, the driver's virtual-device dry-run, shard_map sharding)

Superseded kernels and measured negative-result experiments live in the
top-level `experiments/` package (with their tests under
`experiments/tests/`); their numbers are preserved in PERFORMANCE.md.
"""
