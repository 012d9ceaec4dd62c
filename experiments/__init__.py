"""Archived kernel experiments — measured negative results and superseded
production versions, kept OUT of the shipped `lz4_tpu` package.

Every module here is byte-correct (its tests live in `experiments/tests/`,
run on demand with `python -m pytest experiments/tests -q`; they are not
part of the default CI suite) but measured slower than the dispatched
kernels.  The numbers and the diagnosis for each live in PERFORMANCE.md:

- ``decode_pallas`` / ``encode_pallas`` — round-1 vector (row+roll) kernels;
  the roll-per-phase cost (~73 cyc) is why production went all-scalar.
- ``decode_pallas2`` — split parse/copy phases with sequence tables (-10%).
- ``decode_pallas3`` — ring-ANY DMA staging experiment.
- ``decode_pallas4`` — fully-predicated branch-free parse (-25%; untaken
  branches are cheaper than always-executed loads).
- ``decode_pallas5`` — the previous production scalar decoder (v6's
  baseline, superseded by the branch-merged fused-run v6).
- ``decode_pallas7`` — the dual-block interleave family (v7/v8/v9/v10):
  ~10x slower under current Mosaic regardless of structure; exhaustively
  diagnosed (PERFORMANCE.md "Dual-block interleave").

kbench.py (repo root) can still A/B any of these against the production
kernels on real hardware.
"""
