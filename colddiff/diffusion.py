"""Diffusion training core: q_sample, losses, and every train routine.

One core replaces the reference's eight ``GaussianDiffusion`` copies
(SURVEY.md section 2.3).  Reference parity targets:
  - Family A (deterministic operators): deblurring_diffusion_pytorch.py:311-981
  - Family B (interpolation): denoising_diffusion_pytorch.py:310-542
  - refactored core with Step/Step_Gradient/sqrt loss and t=-1 passthrough:
    snowification/diffusion/diffusion.py:110-490
  - resolution extras (Final_small_noise, Final_random_mean[_and_actual],
    Gradient_norm): resolution_diffusion_pytorch.py:655-761

Time convention: ``t`` is the reference's step *index* drawn from U[0, T);
``q_sample(x, t)`` degrades by ``t + 1`` steps, and ``t = -1`` is a clean
passthrough (snowification diffusion.py:344-388).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .operators.base import Degradation
from .ops.image import quantize_uint8

__all__ = ["ColdDiffusion"]

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class ColdDiffusion(struct.PyTreeNode):
    """Degradation schedule + loss/sampling configuration (an immutable pytree).

    The UNet is *not* stored here; callers pass a ``denoise_fn(x, t)`` closure
    (params + dropout already bound), keeping this core a pure function of
    arrays and making it trivially jit/scan/shard_map-able.
    """

    op: Degradation
    image_size: int = struct.field(pytree_node=False, default=32)
    channels: int = struct.field(pytree_node=False, default=3)
    loss_type: str = struct.field(pytree_node=False, default="l1")
    train_routine: str = struct.field(pytree_node=False, default="Final")
    sampling_routine: str = struct.field(pytree_node=False, default="default")
    discrete: bool = struct.field(pytree_node=False, default=False)
    recon_noise_std: float = struct.field(pytree_node=False, default=0.0)

    @property
    def num_timesteps(self) -> int:
        return self.op.timesteps

    # ------------------------------------------------------------------ #
    # forward process

    def q_sample(
        self,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        *,
        x_end: Optional[jnp.ndarray] = None,
        op_rng=None,
    ) -> jnp.ndarray:
        """Degrade ``x_start`` to per-sample level ``t`` (index; -1 = clean)."""
        n = jnp.clip(t + 1, 0, self.num_timesteps)
        y = self.op.degrade(x_start, n, x_end=x_end, og=x_start, rng=op_rng)
        if self.discrete:
            # 8-bit quantization of the training input
            # (deblurring_diffusion_pytorch.py:954-958)
            y = quantize_uint8(y)
        return jnp.where((t < 0).reshape(-1, *([1] * (x_start.ndim - 1))), x_start, y)

    # ------------------------------------------------------------------ #
    # losses

    def loss_func(self, pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(pred - true))
        if self.loss_type == "l2":
            return jnp.mean(jnp.square(pred - true))
        if self.loss_type == "sqrt":
            return jnp.sqrt(jnp.mean(jnp.abs(pred - true)))
        raise NotImplementedError(self.loss_type)

    def p_losses(
        self,
        denoise_fn: DenoiseFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        *,
        x_end: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        routine = self.train_routine

        if routine in ("Final", "Final_small_noise", "Final_random_mean",
                       "Final_random_mean_and_actual"):
            if routine == "Final_small_noise":
                x_start = x_start + 0.001 * jax.random.normal(rng, x_start.shape)
            if routine == "Final_random_mean":
                x_start = self._randomize_mean(x_start, rng)
            x_t = self.q_sample(x_start, t, x_end=x_end, op_rng=rng)
            loss = self.loss_func(denoise_fn(x_t, t), x_start)
            if routine == "Final_random_mean_and_actual":
                x2 = self._randomize_mean(x_start, rng)
                x2_t = self.q_sample(x2, t, x_end=x_end, op_rng=rng)
                loss = loss + self.loss_func(denoise_fn(x2_t, t), x2)
            return loss

        if routine == "Step":
            # predict x_{t-1} from x_t (snowification diffusion.py:425-429)
            x_t = self.q_sample(x_start, t, x_end=x_end, op_rng=rng)
            x_tm1 = self.q_sample(x_start, t - 1, x_end=x_end, op_rng=rng)
            return self.loss_func(denoise_fn(x_t, t), x_tm1)

        if routine == "Step_Gradient":
            # predict x_{t-1} - x_t (snowification diffusion.py:416-423)
            x_t = self.q_sample(x_start, t, x_end=x_end, op_rng=rng)
            x_tm1 = self.q_sample(x_start, t - 1, x_end=x_end, op_rng=rng)
            return self.loss_func(denoise_fn(x_t, t), x_tm1 - x_t)

        if routine == "Gradient_norm":
            # predict the unit degradation direction
            # (resolution_diffusion_pytorch.py:734-748)
            x_t = self.q_sample(x_start, t, x_end=x_end, op_rng=rng)
            grad = x_t - x_start
            norm = jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=1)
            grad_n = grad / (norm.reshape(-1, 1, 1, 1) + 1e-5)
            return self.loss_func(denoise_fn(x_t, t), grad_n)

        raise NotImplementedError(routine)

    @staticmethod
    def _randomize_mean(x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Replace per-channel spatial mean with N(0,1) draws
        (resolution_diffusion_pytorch.py:681-690)."""
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        new_mean = jax.random.normal(rng, mean.shape, x.dtype)
        return x - mean + new_mean

    def loss(
        self,
        denoise_fn: DenoiseFn,
        x_start: jnp.ndarray,
        rng: jax.Array,
        *,
        x_end: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Draw t ~ U[0, T) per sample and compute the training loss
        (reference ``forward``, deblurring_diffusion_pytorch.py:977-981)."""
        t_rng, loss_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (x_start.shape[0],), 0, self.num_timesteps)
        return self.p_losses(denoise_fn, x_start, t, x_end=x_end, rng=loss_rng)
