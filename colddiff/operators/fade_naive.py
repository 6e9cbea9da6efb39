"""Naive fade degradation: scalar fade factors and spiral binary masks.

Reference: defading_diffusion_naive.py:44-82 (spiral utilities), :347-368
(``get_fade_factors``), :561-605 (q_sample).  ``Spiral_2`` fades toward a
random constant color (an interpolation endpoint, like Family B), with
sampling variants ``x0_step_down_spiral_2_fix`` / ``_rand`` (:418-445).

Factors are multiplicative and commute, so the cumulative stacks
``F[n] = prod_{i<n} f_i`` are exact; the Spiral_2 interpolation uses the same
cumulative masks: after n steps  ``x_n = F[n] * x0 + (1 - F[n]) * m``  for
binary masks (F in {0,1}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .base import Degradation, bcast

__all__ = ["FadeNaive", "spiral_order"]


def spiral_order(n: int) -> np.ndarray:
    """[n, n] spiral ordering used by the Spiral routines
    (defading_diffusion_naive.py:44-76): B.flat[base_spiral] = arange."""
    a = np.arange(n * n).reshape(n, n)
    # base_spiral: counterclockwise spiral of indices, reversed
    out = []
    m = a.copy()
    while m.size:
        out.append(m[0][::-1])
        m = m[1:][::-1].T
    base = np.concatenate(out)[::-1]
    b = np.empty_like(a)
    b.flat[base] = a.flat
    return b


class FadeNaive(Degradation):
    cum: jnp.ndarray = None  # [T+1, 1, 1] scalars or [T+1, S, S] spiral masks
    fade_routine: str = struct.field(pytree_node=False, default="Incremental")
    image_size: int = struct.field(pytree_node=False, default=32)

    @classmethod
    def create(
        cls,
        *,
        image_size: int,
        timesteps: int,
        fade_routine: str = "Incremental",
        start_fade_factor: float = 0.1,
    ) -> "FadeNaive":
        if fade_routine in ("Spiral", "Spiral_2"):
            sp = spiral_order(image_size)
            # step mask i: spiral > i (defading_diffusion_naive.py:357-366)
            steps = [(sp > i).astype(np.float64) for i in range(timesteps)]
        elif fade_routine == "Incremental":
            steps = [
                np.full((1, 1), 1.0 - start_fade_factor * (i + 1)) for i in range(timesteps)
            ]
        elif fade_routine == "Constant":
            steps = [np.full((1, 1), 1.0 - start_fade_factor)] * timesteps
        else:
            raise ValueError(f"unknown naive fade routine: {fade_routine}")
        cum = np.empty((timesteps + 1,) + steps[0].shape)
        cum[0] = 1.0
        for i in range(timesteps):
            cum[i + 1] = cum[i] * steps[i]
        return cls(
            timesteps=timesteps,
            cum=jnp.asarray(cum.astype(np.float32)),
            fade_routine=fade_routine,
            image_size=image_size,
            requires_x_end=(fade_routine == "Spiral_2"),
        )

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        f = self.cum[n][..., None]  # [B, ., ., 1]
        y = x * f
        if self.fade_routine == "Spiral_2":
            if x_end is None and rng is not None:
                x_end = self.sample_x_end(rng, x)
            if x_end is not None:
                y = y + (1.0 - f) * x_end
        return jnp.where(bcast(n, x.ndim) == 0, x, y)

    def sample_x_end(self, rng, x):
        """Random constant color in [0, 1) per sample
        (defading_diffusion_naive.py:380-383, torch.rand semantics)."""
        c = jax.random.uniform(rng, (x.shape[0], 1, 1, x.shape[-1]), x.dtype)
        return jnp.broadcast_to(c, x.shape)
