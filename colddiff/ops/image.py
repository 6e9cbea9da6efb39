"""Image-space utilities: color conversions, quantization, host-side zoom.

Color conversions follow the conventions of the reference's
snowification/diffusion/utils.py (scikit-image D65 Lab port, kornia grayscale):
images in this framework are NHWC in [-1, 1]; ``rgb2lab`` internally rescales
to [0, 1] and ``lab2rgb`` returns [-1, 1], exactly like the reference.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    "rgb_to_grayscale",
    "rgb2lab",
    "lab2rgb",
    "rgb2hsv",
    "hsv2rgb",
    "quantize_uint8",
    "clipped_zoom",
]

# ITU-R BT.601 luma weights (kornia rgb_to_grayscale).
_GRAY_W = (0.299, 0.587, 0.114)

_RGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ).astype(np.float32)
_D65 = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB -> NHW1 grayscale, BT.601 weights (kornia semantics)."""
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return _GRAY_W[0] * r + _GRAY_W[1] * g + _GRAY_W[2] * b


def _srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0.04045, jnp.power((x + 0.055) / 1.055, 2.4), x / 12.92)


def _linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    threshold = 0.0031308
    # clamp before the fractional power to avoid nan grads at negative inputs
    safe = jnp.maximum(x, threshold)
    return jnp.where(x > threshold, 1.055 * jnp.power(safe, 1 / 2.4) - 0.055, 12.92 * x)


def rgb2lab(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB in [-1, 1] -> Lab (L in 0..100, a/b in -127..127).

    Parity target: snowification/diffusion/utils.py:113-164.
    """
    rgb = (x + 1.0) * 0.5
    lin = _srgb_to_linear(rgb)
    # true fp32: TPU default-precision einsums run on bf16 inputs, which
    # visibly corrupts the lab round-trip (max rgb err ~0.1 at 8-bit scale)
    xyz = jnp.einsum("...c,dc->...d", lin, jnp.asarray(_RGB2XYZ),
                     precision=jax.lax.Precision.HIGHEST)
    xyz_n = xyz / jnp.asarray(_D65)
    threshold = 0.008856
    f = jnp.where(
        xyz_n > threshold,
        jnp.power(jnp.clip(xyz_n, threshold, None), 1.0 / 3.0),
        7.787 * xyz_n + 4.0 / 29.0,
    )
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab2rgb(x: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """Lab -> NHWC RGB in [-1, 1] (snowification/diffusion/utils.py:168-222)."""
    L, a, b = x[..., 0], x[..., 1], x[..., 2]
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = jnp.maximum(fy - b / 200.0, 0.0)
    f = jnp.stack([fx, fy, fz], axis=-1)
    xyz = jnp.where(f > 0.2068966, f**3, (f - 4.0 / 29.0) / 7.787)
    xyz = xyz * jnp.asarray(_D65)
    lin = jnp.einsum("...c,dc->...d", xyz, jnp.asarray(_XYZ2RGB),
                     precision=jax.lax.Precision.HIGHEST)
    rgb = _linear_to_srgb(lin)
    if clip:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    return 2.0 * rgb - 1.0


def rgb2hsv(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """NHWC RGB in [0, 1] -> HSV (H in radians [0, 2pi), S, V in [0, 1]).

    Differentiable port matching snowification/diffusion/utils.py:9-55
    (kornia semantics).
    """
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = deltac / (v + eps)
    dc = jnp.where(deltac == 0, 1.0, deltac)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0 * (2.0 * np.pi)
    return jnp.stack([h, s, v], axis=-1)


def hsv2rgb(x: jnp.ndarray) -> jnp.ndarray:
    """HSV (H in radians) -> NHWC RGB in [0, 1]
    (snowification/diffusion/utils.py:58-103)."""
    h = x[..., 0] / (2.0 * np.pi)
    s, v = x[..., 1], x[..., 2]
    hi = jnp.floor(h * 6.0) % 6.0
    f = h * 6.0 - jnp.floor(h * 6.0)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    hi = hi.astype(jnp.int32)
    options = [
        jnp.stack([v, t, p], axis=-1),
        jnp.stack([q, v, p], axis=-1),
        jnp.stack([p, v, t], axis=-1),
        jnp.stack([p, q, v], axis=-1),
        jnp.stack([t, p, v], axis=-1),
        jnp.stack([v, p, q], axis=-1),
    ]
    cond = hi[..., None]
    return jnp.select([cond == i for i in range(6)], options)


def quantize_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """8-bit quantization of a [-1, 1] image, reference ``discrete`` semantics.

    deblurring_diffusion_pytorch.py:954-958: scale to [0, 255], truncate toward
    zero (torch ``.int()``), rescale to [-1, 1].
    """
    y = (x + 1.0) * 0.5 * 255.0
    y = jnp.trunc(y) / 255.0
    return y * 2.0 - 1.0


def clipped_zoom(img: np.ndarray, zoom_factor: float) -> np.ndarray:
    """Center-crop-and-zoom, reference snow setup (forward_process_impl.py:32-42).

    Host-side numpy/scipy (runs once at operator init). ``img`` is [H, W, C].
    """
    from scipy.ndimage import zoom as scizoom

    h = img.shape[0]
    ch = int(np.ceil(h / zoom_factor))
    top = (h - ch) // 2
    img = scizoom(img[top : top + ch, top : top + ch], (zoom_factor, zoom_factor, 1), order=1)
    trim_top = (img.shape[0] - h) // 2
    return img[trim_top : trim_top + h, trim_top : trim_top + h]
