"""Pallas TPU kernels.

Only kernels that *measured faster than XLA* live here (round-1 review rule:
land winners, delete losers).  Current roster:

- ``convnext_front``: fused depthwise-7x7 + time-bias + channel-LayerNorm,
  lane-packed; 1.25x XLA-fp32 at the flagship level-0 shape, on by default
  on TPU (see convnext_front.py for the measurement table).
- ``convnext_block``: the whole ConvNeXt residual branch (front + conv3x3 +
  GELU + conv3x3 + residual) in one VMEM round-trip, paired-tap MXU matmuls;
  bf16 level-0 B<=16 shapes, primal-only calls (the samplers) -- training
  takes the front+XLA path via the VJP rule (see convnext_block.py).

Deleted in round 2 (measured slower than XLA's own fusion on v5e; their
plain-XLA math lives in ``colddiff.models.layers``):
- fused linear attention (two MXU einsums beat the fused VPU pass),
- fused GroupNorm+swish (XLA already fuses the moment/normalize/swish chain).
"""

from .convnext_block import (  # noqa: F401
    block_fusion_supported,
    convnext_block,
    convnext_block_reference,
    convnext_block_tail,
)
from .convnext_front import (  # noqa: F401
    convnext_front,
    convnext_front_reference,
    pallas_supported,
)
