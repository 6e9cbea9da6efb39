"""DDPM ResNet UNet (Ho et al.) as a Flax module (NHWC).

Architecture parity: ``Model`` in
deblurring-diffusion-pytorch/deblurring_diffusion_pytorch/Model2.py:191-332
(+ the ``with_time_emb`` flag of snowification/diffusion/model/unet_resnet.py).

Canonical CIFAR-10 config (cifar10_train.py:71-78):
``UnetResNet(resolution=32, ch=128, ch_mult=(1,2,2,2), num_res_blocks=2,
attn_resolutions=(16,), dropout=0.1)``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FusedGroupNormSwish, SoftmaxAttention, swish

__all__ = ["UnetResNet"]


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Fairseq-style sinusoidal embedding (Model2.py:6-24)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = t.astype(jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResnetBlock(nn.Module):
    """GroupNorm(32) + swish ResNet block with time bias (Model2.py:76-133)."""

    out_ch: int
    dropout: float

    @nn.compact
    def __call__(self, x, temb, *, train: bool):
        in_ch = x.shape[-1]
        h = FusedGroupNormSwish(name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        if temb is not None:
            h = h + nn.Dense(self.out_ch, name="temb_proj")(swish(temb))[:, None, None, :]
        h = FusedGroupNormSwish(name="norm2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class _Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (Model2.py:54-73)."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID", name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _Upsample(nn.Module):
    """Nearest x2 + 3x3 conv (Model2.py:36-51)."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = nn.Conv(c, (3, 3), padding=1, name="conv")(x)
        return x


class UnetResNet(nn.Module):
    ch: int
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 32
    with_time_emb: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray] = None, *, train: bool = False) -> jnp.ndarray:
        assert x.shape[1] == x.shape[2] == self.resolution
        temb_ch = self.ch * 4
        temb = None
        if self.with_time_emb and t is not None:
            # cast the fp32 sin/cos table to the activation dtype so a bf16
            # model stays bf16 (an fp32 temb promotes every block to fp32)
            temb = timestep_embedding(t, self.ch).astype(x.dtype)
            temb = nn.Dense(temb_ch, name="temb_dense0")(temb)
            temb = nn.Dense(temb_ch, name="temb_dense1")(swish(temb))

        num_res = len(self.ch_mult)
        hs = [nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)]
        curr_res = self.resolution
        for i_level in range(num_res):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * self.ch_mult[i_level], self.dropout,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = SoftmaxAttention(name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(
                    _Downsample(self.resamp_with_conv, name=f"down_{i_level}_downsample")(hs[-1])
                )
                curr_res //= 2

        h = hs[-1]
        h = ResnetBlock(h.shape[-1], self.dropout, name="mid_block1")(h, temb, train=train)
        h = SoftmaxAttention(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, name="mid_block2")(h, temb, train=train)

        for i_level in reversed(range(num_res)):
            for i_block in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResnetBlock(
                    self.ch * self.ch_mult[i_level], self.dropout,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = SoftmaxAttention(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = _Upsample(self.resamp_with_conv, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = FusedGroupNormSwish(name="norm_out")(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)
