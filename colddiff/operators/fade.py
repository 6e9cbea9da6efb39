"""Conditional fade / inpainting-mask degradation.

Reference: defading_diffusion_gaussian.py:298-554 -- per-step multiplicative
masks ``1 - normalized Gaussian bump`` composed cumulatively.  The
``Random_Incremental`` routine builds (2S+1)^2 bumps and crops a per-sample
random SxS window, re-randomized at every q_sample call (:357-367, :496-507)
but held fixed across one sampling run.

TPU-native: masks compose elementwise, so cumulative mask stacks
``M[n] = prod_{i<n} mask_i`` are precomputed ([T+1, S, S] or [T+1, 2S, 2S]);
``degrade`` is a gather + multiply, with per-sample ``lax.dynamic_slice``
crops under vmap for the random routine.  Because crop(prod) == prod(crop),
this is exact.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..schedules import fade_routine_sigmas, gaussian_kernel_2d
from .base import Degradation

__all__ = ["Fade", "fade_mask"]


def fade_mask(size: int, sigma: float) -> np.ndarray:
    """One fade kernel: 1 - G/max(G) on an (size+1)^2 grid, cropped [1:, 1:]
    (defading_diffusion_gaussian.py:329-337)."""
    g = gaussian_kernel_2d((size + 1, size + 1), (sigma, sigma)).astype(np.float64)
    k = 1.0 - g / g.max()
    return k[1:, 1:]


class Fade(Degradation):
    cum_masks: jnp.ndarray = None  # [T+1, S, S] or [T+1, 2S, 2S] cumulative masks
    offsets: Optional[jnp.ndarray] = None  # [B, 2] baked random-crop offsets
    fade_routine: str = struct.field(pytree_node=False, default="Incremental")
    image_size: int = struct.field(pytree_node=False, default=32)
    discrete: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        *,
        image_size: int,
        timesteps: int,
        fade_routine: str = "Incremental",
        kernel_std: float = 0.1,
        initial_mask: int = 11,
        discrete: bool = False,
    ) -> "Fade":
        sigmas = fade_routine_sigmas(fade_routine, timesteps, kernel_std, initial_mask)
        grid = 2 * image_size if fade_routine == "Random_Incremental" else image_size
        masks = np.stack([fade_mask(grid, s) for s in sigmas])
        cum = np.empty((timesteps + 1, grid, grid), dtype=np.float64)
        cum[0] = 1.0
        for i in range(timesteps):
            cum[i + 1] = cum[i] * masks[i]
        return cls(
            timesteps=timesteps,
            cum_masks=jnp.asarray(cum.astype(np.float32)),
            fade_routine=fade_routine,
            image_size=image_size,
            discrete=discrete,
        )

    @property
    def random(self) -> bool:
        return "Random" in self.fade_routine

    def randomize(self, rng: jax.Array, batch_size: int) -> "Fade":
        """Bake per-sample crop offsets for a whole sampling run
        (defading_diffusion_gaussian.py:357-367)."""
        if not self.random:
            return self
        off = jax.random.randint(rng, (batch_size, 2), 0, self.image_size + 1)
        return self.replace(offsets=off)

    def _draw_offsets(self, rng, batch_size):
        return jax.random.randint(rng, (batch_size, 2), 0, self.image_size + 1)

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        b = x.shape[0]
        m = self.cum_masks[n]  # [B, grid, grid]
        if self.random:
            if rng is not None:
                off = self._draw_offsets(rng, b)
            elif self.offsets is not None:
                off = self.offsets[:b]
            else:
                off = jnp.zeros((b, 2), jnp.int32)
            s = self.image_size

            def crop(mask, o):
                return jax.lax.dynamic_slice(mask, (o[0], o[1]), (s, s))

            m = jax.vmap(crop)(m, off)
        return x * m[..., None]

    def reset(self, rng, batch_size):
        return self.randomize(rng, batch_size)
