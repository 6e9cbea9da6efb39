"""ConvNeXt UNet: the default Cold Diffusion backbone, as a Flax module (NHWC).

Architecture parity: ``Unet`` in deblurring_diffusion_pytorch.py:191-282 and the
refactored ``UnetConvNextBlock`` in snowification/diffusion/model/unet_convnext.py:125-226
(which adds ``output_mean_scale`` and optional ``time=None``).

Canonical config (entry scripts, e.g. celebA_128.py:78-84):
``UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    ChannelLayerNorm,
    ConvNextBlock,
    Downsample,
    LinearAttention,
    SinusoidalPosEmb,
    Upsample,
    gelu,
)

__all__ = ["UnetConvNext"]


class _PreNormLinearAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) (deblurring...py:123-131, :83-89)."""

    @nn.compact
    def __call__(self, x):
        return x + LinearAttention(name="attn")(ChannelLayerNorm(name="norm")(x))


class UnetConvNext(nn.Module):
    dim: int
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    with_time_emb: bool = True
    residual: bool = False
    output_mean_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: Optional[jnp.ndarray] = None, *, train: bool = False) -> jnp.ndarray:
        del train  # no dropout in this family
        orig_x = x
        t = None
        if self.with_time_emb and time is not None:
            # sin/cos computed fp32 then cast to the activation dtype: an
            # fp32 embedding would otherwise promote every downstream conv
            # to fp32 and silently defeat bf16 compute (the round-2 "bf16
            # doesn't pay" finding was exactly this leak)
            t = SinusoidalPosEmb(self.dim, name="time_emb")(time).astype(x.dtype)
            t = nn.Dense(self.dim * 4, name="time_mlp1")(t)
            t = gelu(t)
            t = nn.Dense(self.dim, name="time_mlp2")(t)

        original_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)

        dims = [self.channels] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ConvNextBlock(dim_out, norm=ind != 0, name=f"down_{ind}_block1")(x, t)
            x = ConvNextBlock(dim_out, name=f"down_{ind}_block2")(x, t)
            x = _PreNormLinearAttention(name=f"down_{ind}_attn")(x)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ConvNextBlock(mid_dim, name="mid_block1")(x, t)
        x = _PreNormLinearAttention(name="mid_attn")(x)
        x = ConvNextBlock(mid_dim, name="mid_block2")(x, t)

        for ind, (dim_in, _) in enumerate(reversed(in_out[1:])):
            is_last = ind >= n_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ConvNextBlock(dim_in, name=f"up_{ind}_block1")(x, t)
            x = ConvNextBlock(dim_in, name=f"up_{ind}_block2")(x, t)
            x = _PreNormLinearAttention(name=f"up_{ind}_attn")(x)
            if not is_last:
                x = Upsample(dim_in, name=f"up_{ind}_upsample")(x)

        x = ConvNextBlock(self.dim, name="final_block")(x)
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        out = nn.Conv(out_dim, (1, 1), name="final_conv")(x)

        if self.residual:
            return out + orig_x
        if self.output_mean_scale:
            out_mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
            out = out - original_mean + out_mean
        return out
