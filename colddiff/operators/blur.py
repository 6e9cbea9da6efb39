"""Scheduled Gaussian blur degradation (the paper's flagship "cold" operator).

Reference behavior: deblurring_diffusion_pytorch.py:348-389 builds T depthwise
convs (torchgeometry Gaussian kernels, circular or reflect padding) and
composes them *sequentially* -- O(max t) convs per q_sample (:927-960) and
O(T^2) convs per sampling run (:393-455).

TPU-native design: each per-step blur is a separable linear map ``A_i (x) A_i``
(see colddiff/ops/linop.py), so we precompute cumulative products
``P[n] = A_{n-1} ... A_0`` as a ``[T+1, H, H]`` tensor once at init and
``degrade(x, n)`` is a gather plus two batched MXU matmuls -- exact parity with
the sequential chain at O(1) cost, for *both* circular and reflect padding.

The ``discrete`` flag (unconditional generation path) collapses the final
level to the per-image channel mean (deblurring_diffusion_pytorch.py:413-415,
:937-940); 8-bit quantization of q_sample outputs lives in the diffusion core.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import linop
from ..schedules import blur_routine_params, gaussian_kernel_1d
from .base import Degradation

__all__ = ["GaussianBlur"]


class GaussianBlur(Degradation):
    """All blur routines of the reference, as cumulative separable matrices."""

    cum: jnp.ndarray = None  # [T+1, S, S] cumulative row/col matrices
    steps: Optional[jnp.ndarray] = None  # [T+1, S, S] single-step matrices
    # (steps[n] = A_{n-1}, steps[0] = I; only used by Individual_Incremental)
    blur_routine: str = struct.field(pytree_node=False, default="Incremental")
    discrete: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        *,
        image_size: int,
        timesteps: int,
        blur_routine: str = "Incremental",
        kernel_size: int = 3,
        kernel_std: float = 0.1,
        start_kernel_std: float = 0.01,
        target_kernel_std: float = 1.0,
        discrete: bool = False,
    ) -> "GaussianBlur":
        params = blur_routine_params(
            blur_routine, timesteps, kernel_size, kernel_std,
            start_kernel_std, target_kernel_std,
        )
        mats = [
            linop.conv1d_matrix(gaussian_kernel_1d(ks, std), image_size, mode)
            for (ks, std, mode) in params
        ]
        cum = jnp.asarray(linop.cumulative_matrices(mats))
        # per-step matrices (steps[n] = A_{n-1}, steps[0] = I): used by
        # Individual_Incremental sampling and by degrade_range
        eye = np.eye(image_size, dtype=np.float64)
        steps = jnp.asarray(np.stack([eye] + mats).astype(np.float32))
        return cls(
            timesteps=timesteps,
            cum=cum,
            steps=steps,
            blur_routine=blur_routine,
            discrete=discrete,
        )

    def _collapse_discrete(self, x: jnp.ndarray, y: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
        """At the final level the image collapses to its channel mean."""
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        collapsed = jnp.broadcast_to(mean, y.shape)
        at_final = (n == self.timesteps).reshape(-1, 1, 1, 1)
        return jnp.where(at_final, collapsed, y)

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        y = linop.apply_separable(x, self.cum, n)
        if self.discrete:
            y = self._collapse_discrete(x, y, n)
        return y

    def degrade_range(self, x, n0, n1, *, x_end=None):
        """Apply blur steps n0..n1-1 to a level-n0 state (static ints);
        the sample_from_blur forward preamble
        (deblurring_diffusion_pytorch.py:877-886), incl. the discrete
        collapse when the chain reaches T."""
        n0, n1 = int(n0), int(n1)
        if not 0 <= n0 <= n1 <= self.timesteps:
            raise ValueError(f"invalid range [{n0}, {n1}] for T={self.timesteps}")
        b = x.shape[0]
        nvec = jnp.full((b,), n1, dtype=jnp.int32)
        if n0 == 0:
            return self.degrade(x, nvec)
        m = self.steps[n0 + 1] if n1 > n0 else jnp.eye(
            self.cum.shape[1], dtype=self.cum.dtype
        )
        for i in range(n0 + 2, n1 + 1):
            m = jnp.matmul(self.steps[i], m,
                           precision=jax.lax.Precision.HIGHEST)
        mb = jnp.broadcast_to(m, (b, *m.shape))
        y = linop.apply_rowcol(x, mb, mb)
        if self.discrete:
            y = self._collapse_discrete(x, y, nvec)
        return y

    def degrade_sampling(self, x, n, **kw):
        if self.blur_routine == "Individual_Incremental":
            # single per-level kernel (deblurring_diffusion_pytorch.py:405,429)
            return linop.apply_separable(x, self.steps, n)
        return self.degrade(x, n, **kw)
