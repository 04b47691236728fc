"""Pallas TPU kernels — and the measured reasons the hot paths don't use them.

Two kernels were built and raced against the XLA-composed equivalents on
real v5e hardware (1M-2M row indexes, the BASELINE configs):

- int8 block-min distance scan (BASELINE config 4's "quantized distance
  matmuls in Pallas"): a fused int8 MXU matmul + per-G-block (min, argmin)
  reduction so the [B, N] score matrix never hits HBM.  Correct (top-1
  agreement 1.000 with the XLA path) but 2x SLOWER: 33.5k vs 65.5k QPS at
  2M x 96-d, B=1024.  XLA's dot_general + approx_min_k pipeline wins
  because the hardware PartialReduce top-k fuses with the score stream,
  while the kernel's [N/G, B] block-min round-trip pays HBM twice.  The
  kernel was therefore DELETED (models/flat.py's XLA int8 path is the
  design); this docstring records the measurement so it isn't re-attempted
  blindly.

- fused random-row gather + L2 distance (gather_dist.py, kept): the HNSW
  beam loop's whole per-iteration cost is the scattered row fetch.  Per-row
  async-DMA fetching reaches 52 M rows/s vs XLA gather's 90 M rows/s
  (B=8192, K=128, 512-B rows) — the fetch is DMA-descriptor-rate-bound, not
  bandwidth-bound (f32/bf16/int8 rows all gather at equal rows/s), and the
  scalar core can't beat XLA's descriptor generation.  Kept as the
  measurement harness backing the engine's design: optimize by gathering
  FEWER rows (seed-scan entries, candidate compaction), not by a custom
  fetch path.
"""

from ocaml_hnsw_tpu.ops.pallas.gather_dist import gather_l2

__all__ = ["gather_l2"]
