"""Quantitative image metrics in JAX: SSIM, RMSE, PSNR.

SSIM follows pytorch_msssim defaults (Gaussian window 11, sigma 1.5,
K1=0.01, K2=0.03, size_average=True), which the reference harness calls as
``ssim(a, b, data_range=1)`` (deblurring_diffusion_pytorch.py:1679-1699).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..schedules import gaussian_kernel_1d

__all__ = ["ssim", "rmse", "psnr"]


def _gauss_filter(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode Gaussian filter on NHWC.

    precision=HIGHEST is load-bearing: SSIM's variance terms are the
    cancellation E[x^2] - mu^2, and on TPU the default bf16 conv inputs
    corrupt them badly enough to push SSIM outside [-1, 1] entirely
    (observed 1.24 on a near-perfect reconstruction)."""
    c = x.shape[-1]
    k = win.shape[0]
    wh = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    ww = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        x, wh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.conv_general_dilated(
        y, ww, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    size_average: bool = True,
) -> jnp.ndarray:
    """Structural similarity for NHWC batches."""
    win = jnp.asarray(gaussian_kernel_1d(win_size, win_sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _gauss_filter(a, win)
    mu_b = _gauss_filter(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = _gauss_filter(a * a, win) - mu_aa
    sig_b = _gauss_filter(b * b, win) - mu_bb
    sig_ab = _gauss_filter(a * b, win) - mu_ab
    ssim_map = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sig_a + sig_b + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """sqrt(MSE), the reference's RMSE lines
    (deblurring_diffusion_pytorch.py:1678,1689,1698)."""
    return jnp.sqrt(jnp.mean(jnp.square(a - b)))


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    m = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))
