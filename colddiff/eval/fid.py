"""Frechet Inception Distance, in-memory-sample API matching the reference.

The reference's Fid/fid_score.py (identical in all 8 packages) computes FID on
in-memory tensor batches with the mseitzer pt_inception-2015-12-05 weights:
``calculate_fid_given_samples([real, fake])`` (fid_score.py:343-356), batching
with ``n_iters = N // batch_size`` (remainder dropped, :176) -- replicated
here for number parity.

The InceptionV3 feature graph is implemented as pure JAX functions that
consume the torch checkpoint's state dict directly (keys like
``Mixed_5b.branch1x1.conv.weight``), including the FID-specific pooling
variants (count_include_pad=False average pools; max pool in the final
InceptionE block).  This container has no network egress, so the weights must
be provided as a local file (``pt_inception-2015-12-05-*.pth``); without one,
:func:`fid_features_fn` falls back to a deterministic random-projection
extractor so relative-FID harness runs stay possible (clearly not
Inception-FID -- the returned callable exposes ``.is_inception``).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "frechet_distance",
    "inception_features_from_torch_checkpoint",
    "fid_features_fn",
    "calculate_fid_given_samples",
    "activation_statistics",
]


# --------------------------------------------------------------------- #
# Frechet distance (fid_score.py:198-252 semantics, scipy sqrtm on host)

def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


# --------------------------------------------------------------------- #
# InceptionV3 feature graph (pure functions over the torch state dict)

def _conv_bn(p, prefix, x, stride=(1, 1), padding="VALID"):
    w = p[prefix + ".conv.weight"]  # already HWIO
    # HIGHEST: on TPU the default bf16 conv inputs would make the feature
    # graph deviate from the torch goldens / pytorch-fid numbers
    x = jax.lax.conv_general_dilated(
        x, w, stride, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    mean = p[prefix + ".bn.running_mean"]
    var = p[prefix + ".bn.running_var"]
    gamma = p[prefix + ".bn.weight"]
    beta = p[prefix + ".bn.bias"]
    x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
    return jax.nn.relu(x)


def _pad(k):
    return [(k, k), (k, k)]


def _avg_pool_nopad_count(x):
    """3x3 stride-1 avg pool, padding 1, count_include_pad=False."""
    ones = jnp.ones(x.shape[1:3])[None, ..., None]
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    cnt = jax.lax.reduce_window(
        jnp.broadcast_to(ones, x.shape), 0.0, jax.lax.add, (1, 3, 3, 1),
        (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / cnt


def _max_pool(x, k, s, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _inception_a(p, pre, x):
    b1 = _conv_bn(p, f"{pre}.branch1x1", x)
    b5 = _conv_bn(p, f"{pre}.branch5x5_1", x)
    b5 = _conv_bn(p, f"{pre}.branch5x5_2", b5, padding=_pad(2))
    b3 = _conv_bn(p, f"{pre}.branch3x3dbl_1", x)
    b3 = _conv_bn(p, f"{pre}.branch3x3dbl_2", b3, padding=_pad(1))
    b3 = _conv_bn(p, f"{pre}.branch3x3dbl_3", b3, padding=_pad(1))
    bp = _conv_bn(p, f"{pre}.branch_pool", _avg_pool_nopad_count(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, pre, x):
    b3 = _conv_bn(p, f"{pre}.branch3x3", x, stride=(2, 2))
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_2", bd, padding=_pad(1))
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_3", bd, stride=(2, 2))
    mp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, mp], axis=-1)


def _inception_c(p, pre, x):
    b1 = _conv_bn(p, f"{pre}.branch1x1", x)
    b7 = _conv_bn(p, f"{pre}.branch7x7_1", x)
    b7 = _conv_bn(p, f"{pre}.branch7x7_2", b7, padding=[(0, 0), (3, 3)])
    b7 = _conv_bn(p, f"{pre}.branch7x7_3", b7, padding=[(3, 3), (0, 0)])
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_1", x)
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_2", bd, padding=[(3, 3), (0, 0)])
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_3", bd, padding=[(0, 0), (3, 3)])
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_4", bd, padding=[(3, 3), (0, 0)])
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_5", bd, padding=[(0, 0), (3, 3)])
    bp = _conv_bn(p, f"{pre}.branch_pool", _avg_pool_nopad_count(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, pre, x):
    b3 = _conv_bn(p, f"{pre}.branch3x3_1", x)
    b3 = _conv_bn(p, f"{pre}.branch3x3_2", b3, stride=(2, 2))
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_1", x)
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_2", b7, padding=[(0, 0), (3, 3)])
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_3", b7, padding=[(3, 3), (0, 0)])
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_4", b7, stride=(2, 2))
    mp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, mp], axis=-1)


def _inception_e(p, pre, x, pool: str):
    b1 = _conv_bn(p, f"{pre}.branch1x1", x)
    b3 = _conv_bn(p, f"{pre}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            _conv_bn(p, f"{pre}.branch3x3_2a", b3, padding=[(0, 0), (1, 1)]),
            _conv_bn(p, f"{pre}.branch3x3_2b", b3, padding=[(1, 1), (0, 0)]),
        ],
        axis=-1,
    )
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_2", bd, padding=_pad(1))
    bd = jnp.concatenate(
        [
            _conv_bn(p, f"{pre}.branch3x3dbl_3a", bd, padding=[(0, 0), (1, 1)]),
            _conv_bn(p, f"{pre}.branch3x3dbl_3b", bd, padding=[(1, 1), (0, 0)]),
        ],
        axis=-1,
    )
    if pool == "max":
        # FIDInceptionE_2 (Fid/inception.py): max pool in the last block
        bp = _max_pool(x, 3, 1, pad=1)
    else:
        bp = _avg_pool_nopad_count(x)
    bp = _conv_bn(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3_features(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """2048-d pool3 features for NHWC input in [-1, 1].

    Input is bilinearly resized to 299 (fid_score.py resize_input semantics).
    """
    b = x.shape[0]
    x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), method="bilinear")
    x = _conv_bn(p, "Conv2d_1a_3x3", x, stride=(2, 2))
    x = _conv_bn(p, "Conv2d_2a_3x3", x)
    x = _conv_bn(p, "Conv2d_2b_3x3", x, padding=_pad(1))
    x = _max_pool(x, 3, 2)
    x = _conv_bn(p, "Conv2d_3b_1x1", x)
    x = _conv_bn(p, "Conv2d_4a_3x3", x)
    x = _max_pool(x, 3, 2)
    x = _inception_a(p, "Mixed_5b", x)
    x = _inception_a(p, "Mixed_5c", x)
    x = _inception_a(p, "Mixed_5d", x)
    x = _inception_b(p, "Mixed_6a", x)
    x = _inception_c(p, "Mixed_6b", x)
    x = _inception_c(p, "Mixed_6c", x)
    x = _inception_c(p, "Mixed_6d", x)
    x = _inception_c(p, "Mixed_6e", x)
    x = _inception_d(p, "Mixed_7a", x)
    x = _inception_e(p, "Mixed_7b", x, pool="avg")
    x = _inception_e(p, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


def inception_features_from_torch_checkpoint(path: str) -> Callable:
    """Load pt_inception weights (torch CPU, test/setup-time only) -> jit fn."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    p = {}
    for k, v in sd.items():
        arr = np.asarray(v.numpy())
        if k.endswith(".conv.weight"):
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        p[k] = jnp.asarray(arr)

    @jax.jit
    def features(x):
        if x.shape[-1] == 1:
            # grayscale -> 3 channels, as the reference harness does before
            # FID (deblurring_diffusion_pytorch.py:1612-1615 ``repeat``)
            x = jnp.tile(x, (1, 1, 1, 3))
        return inception_pool3_features(p, x)

    features.is_inception = True
    features.name = "inception"
    return features


def fid_features_fn(weights_path: Optional[str] = None) -> Callable:
    """Best-available feature extractor (see module docstring)."""
    candidates = [
        weights_path,
        os.environ.get("COLDDIFF_INCEPTION_WEIGHTS"),
        "pt_inception-2015-12-05-6726825d.pth",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return inception_features_from_torch_checkpoint(c)

    # deterministic fallback: random conv features + projection
    k = jax.random.key(20220809)
    k1, k2 = jax.random.split(k)
    w1 = jax.random.normal(k1, (7, 7, 3, 64)) * 0.1
    w2 = jax.random.normal(k2, (3, 3, 64, 128)) * 0.1

    @jax.jit
    def features(x):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        b = x.shape[0]
        x = jax.image.resize(x, (b, 64, 64, 3), method="bilinear")
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w1, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST))
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w2, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST))
        return jnp.mean(x, axis=(1, 2))

    features.is_inception = False
    features.name = "fallback-random-projection"
    return features


# --------------------------------------------------------------------- #

def activation_statistics(samples: np.ndarray, features, batch_size: int = 64):
    """mu/sigma over features; drops the remainder like the reference
    (fid_score.py:176 ``n_iters = N // batch_size``)."""
    n = samples.shape[0]
    n_iters = max(n // batch_size, 1)
    feats = []
    for i in range(n_iters):
        chunk = jnp.asarray(samples[i * batch_size : (i + 1) * batch_size])
        feats.append(np.asarray(features(chunk)))
    acts = np.concatenate(feats)
    return acts.mean(axis=0), np.cov(acts, rowvar=False)


def calculate_fid_given_samples(
    samples, batch_size: int = 64, features=None
) -> float:
    """FID between samples[0] (real) and samples[1] (fake), NHWC in [-1, 1]
    (API parity: Fid/fid_score.py:343-356)."""
    if features is None:
        features = fid_features_fn()
    mu1, s1 = activation_statistics(np.asarray(samples[0]), features, batch_size)
    mu2, s2 = activation_statistics(np.asarray(samples[1]), features, batch_size)
    return frechet_distance(mu1, s1, mu2, s2)
