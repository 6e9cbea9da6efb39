"""Interpolation degradations (Family B): hot noise and animorphosis mixing.

Both share the closed-form cosine-schedule interpolation
``x_n = sqrt(acum[n-1]) * x0 + sqrt(1 - acum[n-1]) * x_end``
(denoising_diffusion_pytorch.py:331-337, 517-522); they differ only in where
``x_end`` comes from -- N(0, I) noise for the hot baseline, an image from a
second dataset for demixing/animorphosis (demixing_diffusion_pytorch.py:331-337,
497-502).  The trainer supplies ``x_end``; the operator is pure math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schedules import cosine_alphas_cumprod
from .base import Degradation, bcast

__all__ = ["Interpolation", "GaussianNoise", "Animorphosis"]


class Interpolation(Degradation):
    sqrt_ac: jnp.ndarray = None  # [T] sqrt(alphas_cumprod)
    sqrt_1mac: jnp.ndarray = None  # [T] sqrt(1 - alphas_cumprod)

    @classmethod
    def create(cls, *, timesteps: int, s: float = 0.008) -> "Interpolation":
        ac = cosine_alphas_cumprod(timesteps, s)
        return cls(
            timesteps=timesteps,
            requires_x_end=True,
            sqrt_ac=jnp.asarray(ac**0.5, dtype=jnp.float32),
            sqrt_1mac=jnp.asarray((1.0 - ac) ** 0.5, dtype=jnp.float32),
        )

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        assert x_end is not None, "Family-B operator needs an endpoint image"
        idx = jnp.clip(n - 1, 0, self.timesteps - 1)
        a = bcast(self.sqrt_ac[idx], x.ndim)
        b = bcast(self.sqrt_1mac[idx], x.ndim)
        y = a * x + b * x_end
        return jnp.where(bcast(n, x.ndim) == 0, x, y)

    def degrade_range(self, x, n0, n1, *, x_end=None):
        """Closed-form partial chain: given x at level ``n0``
        (x = sqrt_ac[n0-1]*x0 + sqrt_1mac[n0-1]*x_end), advance to ``n1``
        without knowing x0:

            r      = sqrt_ac[n1-1] / sqrt_ac[n0-1]
            x_{n1} = r * x + (sqrt_1mac[n1-1] - r * sqrt_1mac[n0-1]) * x_end

        The Family-B analog of blur's per-step matrix composition (the
        reference's missing ``all_sample_from_blur`` partial forward,
        denoising_diffusion_pytorch.py:1288-1360 intent)."""
        n0, n1 = int(n0), int(n1)
        if not 0 <= n0 <= n1 <= self.timesteps:
            raise ValueError(f"invalid range [{n0}, {n1}] for T={self.timesteps}")
        b = x.shape[0]
        nvec = jnp.full((b,), n1, dtype=jnp.int32)
        if n0 == 0:
            return self.degrade(x, nvec, x_end=x_end)
        if n1 == n0:
            return x
        assert x_end is not None, "Family-B degrade_range needs the endpoint"
        r = self.sqrt_ac[n1 - 1] / self.sqrt_ac[n0 - 1]
        w_end = self.sqrt_1mac[n1 - 1] - r * self.sqrt_1mac[n0 - 1]
        return r * x + w_end * x_end

    def x_end_from_xt(self, x0_bar, xt, n):
        """Estimate the endpoint from x_t and a predicted x0 (DDIM-style).

        Matches get_x2_bar_from_xt (denoising_diffusion_pytorch.py:377-381);
        ``n`` is the number of applied steps (reference ``t`` index + 1).
        """
        idx = jnp.clip(n - 1, 0, self.timesteps - 1)
        a = bcast(self.sqrt_ac[idx], xt.ndim)
        b = bcast(self.sqrt_1mac[idx], xt.ndim)
        return (xt - a * x0_bar) / b


class GaussianNoise(Interpolation):
    """Hot baseline: x_end ~ N(0, I) (denoising_diffusion_pytorch.py:738-742)."""

    def sample_x_end(self, rng, x):
        return jax.random.normal(rng, x.shape, x.dtype)


class Animorphosis(Interpolation):
    """Demixing: x_end is an image from a second dataset."""
