"""Fade degradation for unconditional generation (per-pixel alpha schedule).

Reference: defading-generation-diffusion-pytorch/.../defading_diffusion_pytorch.py:
``get_kernels_with_schedule`` (:313-328) builds *cumulative* fade-kernel
products as per-pixel ``alphas`` buffers [T, 1, S, S]; ``q_sample`` is the
interpolation ``alpha_t * x0 + (1 - alpha_t) * x2`` (:543-548) with x2 a random
constant-color image (:769-774); ``--reverse`` flips the schedule direction
(:371-380).  A Family-B operator with spatially varying alphas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Degradation, bcast
from .fade import fade_mask

__all__ = ["FadeGeneration"]


class FadeGeneration(Degradation):
    alphas: jnp.ndarray = None  # [T, S, S] cumulative per-pixel alphas

    @classmethod
    def create(
        cls,
        *,
        image_size: int,
        timesteps: int,
        kernel_std: float = 0.15,
        initial_mask: int = 11,
        reverse: bool = False,
    ) -> "FadeGeneration":
        kers = np.ones((image_size, image_size), dtype=np.float64)
        stack = []
        for i in range(timesteps):
            k = fade_mask(image_size, kernel_std * (i + initial_mask))
            if reverse:
                stack.append(kers.copy())
                kers = kers * k
            else:
                kers = kers * k
                stack.append(kers.copy())
        if reverse:
            # get_reverse_kernels_with_schedule returns the reversed
            # pre-products as one_minus_alphas; alphas are their COMPLEMENT
            # (:371-373), so t=T-1 is pure x_end (alpha=0), not identity
            stack.reverse()
            arr = 1.0 - np.stack(stack)
        else:
            arr = np.stack(stack)
        return cls(
            timesteps=timesteps,
            requires_x_end=True,
            alphas=jnp.asarray(arr.astype(np.float32)),
        )

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        assert x_end is not None or rng is not None
        if x_end is None:
            x_end = self.sample_x_end(rng, x)
        idx = jnp.clip(n - 1, 0, self.timesteps - 1)
        a = self.alphas[idx][..., None]  # [B, S, S, 1]
        y = a * x + (1.0 - a) * x_end
        return jnp.where(bcast(n, x.ndim) == 0, x, y)

    def x_end_from_xt(self, x0_bar, xt, n):
        idx = jnp.clip(n - 1, 0, self.timesteps - 1)
        a = self.alphas[idx][..., None]
        return (xt - a * x0_bar) / jnp.maximum(1.0 - a, 1e-8)

    def sample_x_end(self, rng, x):
        """Random constant color in [-0.5, 0.5) per sample
        (defading...pytorch.py:769-774: torch.rand(B, 3) - 0.5)."""
        c = jax.random.uniform(
            rng, (x.shape[0], 1, 1, x.shape[-1]), x.dtype
        ) - 0.5
        return jnp.broadcast_to(c, x.shape)
