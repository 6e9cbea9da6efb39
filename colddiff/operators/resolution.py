"""Resolution-pyramid degradation (super-resolution task).

Reference: resolution_diffusion_pytorch.py:354-414 -- each step interpolates
down to ``size - dec(i)`` (bicubic/bilinear/area, antialias=False) and back up
with 'nearest-exact', optionally sandwiched by a 3x3 sigma=0.5 reflect blur.

TPU-native: torch ``F.interpolate`` is separable and linear, so each step is a
pair of [S, S] matrices (colddiff/ops/linop.py resize matrices, golden-tested
against torch) and the cumulative products make ``degrade`` a gather + two
batched matmuls -- replacing the reference's sequential closure chains.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import linop
from ..schedules import gaussian_kernel_1d, resolution_routine_sizes

__all__ = ["Resolution"]

from .base import Degradation


class Resolution(Degradation):
    cum: jnp.ndarray = None  # [T+1, S, S] cumulative separable matrices

    @classmethod
    def create(
        cls,
        *,
        image_size: int,
        timesteps: int,
        resolution_routine: str = "Incremental",
    ) -> "Resolution":
        steps = resolution_routine_sizes(resolution_routine, timesteps, image_size)
        blur_m = linop.conv1d_matrix(
            gaussian_kernel_1d(3, 0.5).astype(np.float64), image_size, "reflect"
        )
        mats = []
        for target, mode, do_blur in steps:
            m = linop.resize_step_matrix(image_size, target, mode)
            if do_blur:
                m = blur_m @ m @ blur_m
            mats.append(m)
        return cls(timesteps=timesteps, cum=jnp.asarray(linop.cumulative_matrices(mats)))

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        return linop.apply_separable(x, self.cum, n)
