"""colddiff: a TPU-native JAX/Flax Cold Diffusion framework.

One framework with the full capabilities of the reference
(arpitbansal297/Cold-Diffusion-Models, arXiv 2208.09392): training and
sampling diffusion models that invert arbitrary deterministic image
degradations -- Gaussian blur, fading/inpainting masks, resolution pyramids,
snow, desaturation, animorphosis mixing, and the hot Gaussian-noise baseline.

Layout:
  colddiff.ops        -- linear-operator machinery, color math, Pallas kernels
  colddiff.operators  -- degradation operators (pytree dataclasses)
  colddiff.schedules  -- per-step parameter tables (reference-parity formulas)
  colddiff.models     -- Flax UNets (ConvNeXt and DDPM-ResNet families)
  colddiff.diffusion  -- training core (q_sample / losses / train routines)
  colddiff.sampling   -- reverse samplers as lax.scan loops
  colddiff.parallel   -- device mesh + data-parallel sharding helpers
  colddiff.train      -- Trainer (EMA, checkpoints, periodic sampling)
  colddiff.data       -- datasets and input pipeline
  colddiff.eval       -- FID / SSIM / RMSE harness, GMM sampler, figures
"""

__version__ = "0.1.0"

from .diffusion import ColdDiffusion  # noqa: E402,F401
from .sampling import all_sample, prepare_start, sample, sample_multi_step  # noqa: E402,F401
