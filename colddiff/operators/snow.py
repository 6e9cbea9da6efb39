"""Snowification degradation (ImageNet-C-style snow overlays).

Reference: snowification/diffusion/forward_process_impl.py:220-372.
Setup (host, numpy, seeded 123321 unless ``random_snow``): a Gaussian field ->
``clipped_zoom`` -> per-step threshold (linspace start->end) -> directional
motion blur (1-D Gaussian row kernel, vertical = rotated) -> per-step layers
``snow`` plus their 180-degree rotations ``snow_rot``.

Degrade (device, O(1)): the reference's forward ignores the chain state and is
a pure function of the original image (forward_process_impl.py:357-372):
``clip(brightness(og) + snow[i] + snow_rot[i], 0, 1)`` -- so per-sample-t
gathers from the precomputed [T, L, H, W] stacks are exact.

Motion blur is a 1-D zero-padded conv == a per-step HxH matrix, applied to all
T x L fields as one batched einsum at setup.  The snow base is part of the
operator pytree, so it checkpoints with the model (the reference persists it
as ``snow_base.npy``, diffusion.py:177-193).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.image import clipped_zoom, rgb_to_grayscale
from ..ops.linop import conv1d_matrix
from ..schedules import gaussian_kernel_1d
from .base import Degradation, bcast

__all__ = ["Snow", "SNOW_LEVELS"]

# (c-tuple, thres_start, thres_end, mb_sigma_start, mb_sigma_end,
#  br_start, br_end) per snow_level (forward_process_impl.py:262-296)
SNOW_LEVELS = {
    1: ((0.1, 0.3, 3, 0.5, 5, 4, 0.8), 0.7, 0.3, 0.5, 5.0, 0.95, 0.7),
    2: ((0.55, 0.3, 2.5, 0.85, 11, 12, 0.55), 1.15, 0.7, 0.05, 12.0, 0.95, 0.55),
    3: ((0.55, 0.3, 2.5, 0.7, 11, 16, 0.4), 1.15, 0.7, 0.05, 16.0, 0.95, 0.4),
    4: ((0.55, 0.3, 2.5, 0.55, 11, 20, 0.3), 1.15, 0.55, 0.05, 20.0, 0.95, 0.3),
}

_FIXED_SEED = 123321


class Snow(Degradation):
    snow: jnp.ndarray = None  # [T, L, H, W]
    snow_rot: jnp.ndarray = None  # [T, L, H, W]
    br_coefs: jnp.ndarray = None  # [T]
    snow_level: int = struct.field(pytree_node=False, default=1)
    image_size: int = struct.field(pytree_node=False, default=32)
    random_snow: bool = struct.field(pytree_node=False, default=False)
    single_snow: bool = struct.field(pytree_node=False, default=False)
    fix_brightness: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        *,
        image_size: int,
        timesteps: int,
        snow_level: int = 1,
        random_snow: bool = False,
        single_snow: bool = False,
        fix_brightness: bool = False,
        batch_size: int = 32,
        seed: Optional[int] = None,
        snow_base: Optional[np.ndarray] = None,
    ) -> "Snow":
        op = cls(
            timesteps=timesteps,
            snow_level=snow_level,
            image_size=image_size,
            random_snow=random_snow,
            single_snow=single_snow,
            fix_brightness=fix_brightness,
        )
        return op._generate(batch_size=batch_size, seed=seed, snow_base=snow_base)

    # ------------------------------------------------------------------ #

    def _generate(self, batch_size: int, seed: Optional[int] = None,
                  snow_base: Optional[np.ndarray] = None) -> "Snow":
        """(Re)build the snow layer stacks (forward_process_impl.py:257-355)."""
        c, th0, th1, mb0, mb1, br0, br1 = SNOW_LEVELS[self.snow_level]
        T, s = self.timesteps, self.image_size
        rng = np.random.RandomState(
            _FIXED_SEED if not self.random_snow else (seed if seed is not None else None)
        )

        if snow_base is not None:
            base = snow_base
        elif self.single_snow:
            cols = []
            for _ in range(batch_size):
                f = rng.normal(size=(s, s), loc=c[0], scale=c[1])[..., None]
                cols.append(clipped_zoom(f, c[2]))
            base = np.concatenate(cols, axis=2)  # [H, W, L=B]
        else:
            f = rng.normal(size=(s, s), loc=c[0], scale=c[1])[..., None]
            base = clipped_zoom(f, c[2])  # [H, W, 1]
        vertical = rng.uniform() > 0.5

        thresholds = np.linspace(th0, th1, T)
        mb_sigmas = np.linspace(mb0, mb1, T)
        br = np.linspace(br0, br1, T)

        fields = np.transpose(base, (2, 0, 1))[None]  # [1, L, H, W]
        fields = np.clip(
            np.where(fields < thresholds[:, None, None, None], 0.0, fields), 0.0, 1.0
        )  # [T, L, H, W]

        ks = int(c[4])
        # per-step motion-blur matrices: 1-D zero-padded 'same' conv
        mats = np.stack(
            [conv1d_matrix(gaussian_kernel_1d(ks, sig), s, "zeros") for sig in mb_sigmas]
        ).astype(np.float32)  # [T, s, s]

        fx = jnp.asarray(fields, dtype=jnp.float32)
        m = jnp.asarray(mats)
        # true-fp32 like every degradation einsum (TPU default bf16 inputs
        # would corrupt the precomputed snow fields)
        hp = jax.lax.Precision.HIGHEST
        h_blur = jnp.einsum("tij,tlhj->tlhi", m, fx, precision=hp)  # along W
        v_blur = jnp.einsum("tij,tljw->tliw", m, fx, precision=hp)  # along H

        if self.single_snow:
            # a FRESH half-of-the-layers permutation per timestep gets
            # vertical blur (forward_process_impl.py:337-341 draws
            # torch.randperm inside the per-timestep loop).  RNG-source
            # waiver: upstream draws these from torch's *global, unseeded*
            # generator -- its fixed-snow setup is not reproducible in
            # single_snow mode -- so colddiff draws them from the operator's
            # own seeded stream (after the vertical-uniform draw, in timestep
            # order), keeping the per-timestep semantics deterministic.
            L = fields.shape[1]
            take_v = np.zeros((T, L), bool)
            for t_idx in range(T):
                perm = rng.permutation(L)
                take_v[t_idx, perm[: L // 2]] = True
            snow = jnp.where(jnp.asarray(take_v)[:, :, None, None], v_blur, h_blur)
        else:
            snow = v_blur if vertical else h_blur
        snow_rot = jnp.flip(snow, axis=(2, 3))

        return self.replace(
            snow=snow, snow_rot=snow_rot, br_coefs=jnp.asarray(br, dtype=jnp.float32)
        )

    def reset(self, rng: jax.Array, batch_size: int) -> "Snow":
        if not self.random_snow:
            return self
        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        return self._generate(batch_size=batch_size, seed=seed)

    # ------------------------------------------------------------------ #

    def degrade(self, x, n, *, x_end=None, og=None, rng=None):
        if og is None:
            og = x
        b = x.shape[0]
        L = self.snow.shape[1]
        idx = jnp.clip(n - 1, 0, self.timesteps - 1)
        lidx = jnp.arange(b) % L
        sn = self.snow[idx, lidx][..., None]  # [B, H, W, 1]
        sn_rot = self.snow_rot[idx, lidx][..., None]

        og_r = (og + 1.0) * 0.5
        if self.fix_brightness:
            base = og_r
        else:
            gray = rgb_to_grayscale(og_r) * 1.5 + 0.5
            gray = jnp.maximum(og_r, gray)
            coef = bcast(self.br_coefs[idx], x.ndim)
            base = coef * og_r + (1.0 - coef) * gray
        y = jnp.clip(base + sn + sn_rot, 0.0, 1.0) * 2.0 - 1.0
        return jnp.where(bcast(n, x.ndim) == 0, x, y)
