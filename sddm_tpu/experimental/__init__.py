"""Benchmarked-but-not-default variants, kept with their measured results.

- ``fast_groupnorm``: reshape-free GroupNorm (lane-aligned moments).  20x
  faster than flax's GroupNorm as an isolated op; in-model A/B inconclusive
  (XLA fuses either equally inside the sampler loop) — PERFORMANCE.md.
- ``pallas_groupnorm_swish``: two-sweep tiled Pallas GroupNorm+Swish.
  Correct, but slower than XLA's fusion at flagship sizes (grid-step
  overhead on small slabs).

The production layout win is the packed space-to-depth engine
(models/unet_packed.py, +77% sampler throughput on chip).
"""
