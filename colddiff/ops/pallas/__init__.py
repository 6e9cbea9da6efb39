"""Pallas TPU kernels.

Only kernels that *measured faster than XLA* live here (round-1 review rule:
land winners, delete losers).  Current roster:

- ``convnext_front``: fused depthwise-7x7 + time-bias + channel-LayerNorm,
  lane-packed; 1.25x XLA-fp32 at the flagship level-0 shape, on by default
  on TPU (see convnext_front.py for the measurement table).

Deleted in round 2 (measured slower than XLA's own fusion on v5e; their
plain-XLA math lives in ``colddiff.models.layers``):
- fused linear attention (two MXU einsums beat the fused VPU pass),
- fused GroupNorm+swish (XLA already fuses the moment/normalize/swish chain).

Deleted in round 4 (in git history, with the full measurement story in
docs/PERF.md "Kernel scoreboard"):
- ``convnext_block``, the whole ConvNeXt residual branch in one VMEM pass
  with paired-tap MXU 3x3 convs: WON the isolated block microbench (2114
  vs 2319 us front+XLA at bf16 B=16) and LOST end to end (15.55 vs 14.40
  ms/fwd) -- the looped microbench pipelines consecutive custom calls and
  hides the pad/pack materialization XLA otherwise fuses into neighbors.
"""

from .convnext_front import (  # noqa: F401
    convnext_front,
    convnext_front_reference,
    pallas_supported,
)
