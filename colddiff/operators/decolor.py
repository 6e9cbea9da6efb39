"""Desaturation degradation (colorization task).

Reference: snowification/diffusion/forward_process_impl.py:131-218 -- a 1x1
non-grouped conv whose kernel is ``theta*I + (1-theta) * (1 1^T / C)``, one per
step, optionally round-tripping through Lab space; ``total_forward`` is the
pure channel mean.

TPU-native: each step is a CxC channel matrix; we precompute cumulative
products ``[T+1, C, C]`` (exact -- consecutive lab2rgb/rgb2lab round trips in
the reference's per-step chain cancel) and ``degrade`` is one einsum.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops.image import lab2rgb, rgb2lab
from ..ops.linop import cumulative_matrices
from ..schedules import decolor_routine_thetas
from .base import Degradation, bcast

__all__ = ["Decolorization"]


class Decolorization(Degradation):
    cum: jnp.ndarray = None  # [T+1, C, C] cumulative channel matrices
    to_lab: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        *,
        timesteps: int,
        channels: int = 3,
        decolor_routine: str = "Constant",
        decolor_ema_factor: float = 0.9,
        decolor_total_remove: bool = False,
        to_lab: bool = False,
    ) -> "Decolorization":
        thetas = decolor_routine_thetas(
            decolor_routine, timesteps, decolor_ema_factor, decolor_total_remove
        )
        eye = np.eye(channels, dtype=np.float64)
        mean = np.ones((channels, channels), dtype=np.float64) / channels
        mats = [th * eye + (1.0 - th) * mean for th in thetas]
        return cls(
            timesteps=timesteps,
            cum=jnp.asarray(cumulative_matrices(mats)),
            to_lab=to_lab,
        )

    def _mix(self, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum(
            "bij,bhwj->bhwi", m, x,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        m = self.cum[n]  # [B, C, C]
        if self.to_lab:
            y = rgb2lab(self._mix(lab2rgb(x), m))
        else:
            y = self._mix(x, m)
        return jnp.where(bcast(n, x.ndim) == 0, x, y)

    def total(self, x, *, x_end=None, og=None, rng=None):
        """Pure channel mean (forward_process_impl.py:200-218)."""
        c = x.shape[-1]
        if self.to_lab:
            rgb = lab2rgb(x)
            return rgb2lab(jnp.mean(rgb, axis=-1, keepdims=True) * jnp.ones((c,)))
        return jnp.broadcast_to(jnp.mean(x, axis=-1, keepdims=True), x.shape)
