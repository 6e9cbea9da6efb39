"""Full-model numerical golden tests for the checkpoint importer.

test_import_torch.py verifies primitive conversions numerically and the
full-model mapping structurally; these tests close the loop: a synthetic
reference-layout state dict is run through a plain-torch functional
transcription of each reference UNet forward (ConvNeXt ``Unet``,
deblurring_diffusion_pytorch.py:191-282; DDPM ``Model``, Model2.py:191-332)
and through ``import_unet_*`` + the Flax module, in float64.  Any mis-wired
layer, transpose, padding, or activation shows up as a large mismatch.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from colddiff.models import UnetConvNext, UnetResNet
from colddiff.models.import_torch import import_unet_convnext, import_unet_resnet
from tests.test_import_torch import _synth_convnext_sd, _synth_resnet_sd


def _t(sd):
    return {k: torch.as_tensor(v, dtype=torch.float64) for k, v in sd.items()}


def _swish(x):
    return x * torch.sigmoid(x)


# ------------------------- ConvNeXt family ------------------------- #

def _t_channel_ln(x, g, b, eps=1e-5):
    # reference LayerNorm (deblurring...py:111-121): biased var over channels
    mean = x.mean(dim=1, keepdim=True)
    var = x.var(dim=1, unbiased=False, keepdim=True)
    return (x - mean) / (var + eps).sqrt() * g + b


def _t_convnext_block(sd, p, x, t, norm):
    # ConvNextBlock forward (deblurring...py:135-165)
    h = F.conv2d(x, sd[f"{p}.ds_conv.weight"], sd[f"{p}.ds_conv.bias"],
                 padding=3, groups=x.shape[1])
    if t is not None and f"{p}.mlp.1.weight" in sd:
        h = h + F.linear(F.gelu(t), sd[f"{p}.mlp.1.weight"],
                         sd[f"{p}.mlp.1.bias"])[:, :, None, None]
    if norm:
        h = _t_channel_ln(h, sd[f"{p}.net.0.g"], sd[f"{p}.net.0.b"])
    h = F.conv2d(h, sd[f"{p}.net.1.weight"], sd[f"{p}.net.1.bias"], padding=1)
    h = F.gelu(h)
    h = F.conv2d(h, sd[f"{p}.net.3.weight"], sd[f"{p}.net.3.bias"], padding=1)
    res = x if f"{p}.res_conv.weight" not in sd else F.conv2d(
        x, sd[f"{p}.res_conv.weight"], sd[f"{p}.res_conv.bias"])
    return h + res


def _t_prenorm_linattn(sd, p, x, heads=4, dh=32):
    # Residual(PreNorm(LinearAttention)) (deblurring...py:83-89,123-131,167-187)
    xn = _t_channel_ln(x, sd[f"{p}.fn.norm.g"], sd[f"{p}.fn.norm.b"])
    qkv = F.conv2d(xn, sd[f"{p}.fn.fn.to_qkv.weight"])
    b, _, h, w = qkv.shape
    q, k, v = (z.reshape(b, heads, dh, h * w) for z in qkv.chunk(3, dim=1))
    q = q * dh ** -0.5
    k = k.softmax(dim=-1)
    ctx = torch.einsum("bhdn,bhen->bhde", k, v)
    out = torch.einsum("bhde,bhdn->bhen", ctx, q).reshape(b, heads * dh, h, w)
    out = F.conv2d(out, sd[f"{p}.fn.fn.to_out.weight"],
                   sd[f"{p}.fn.fn.to_out.bias"])
    return x + out


def _t_sinusoidal(t, dim):
    # SinusoidalPosEmb (deblurring...py:91-103); fp32 angles to match the
    # Flax module's explicit float32 embedding math
    half = dim // 2
    freq = torch.exp(torch.arange(half, dtype=torch.float32)
                     * (-math.log(10000.0) / (half - 1)))
    ang = (t.to(torch.float32)[:, None] * freq[None, :]).to(torch.float64)
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)


def torch_unet_convnext(sd, x, time, dim, dim_mults, channels):
    """Functional transcription of the reference ``Unet.forward``
    (deblurring_diffusion_pytorch.py:237-282)."""
    t = _t_sinusoidal(time, dim)
    t = F.linear(t, sd["time_mlp.1.weight"], sd["time_mlp.1.bias"])
    t = F.gelu(t)
    t = F.linear(t, sd["time_mlp.3.weight"], sd["time_mlp.3.bias"])

    dims = [channels] + [dim * m for m in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    n = len(in_out)
    hs = []
    for i in range(n):
        x = _t_convnext_block(sd, f"downs.{i}.0", x, t, norm=i != 0)
        x = _t_convnext_block(sd, f"downs.{i}.1", x, t, norm=True)
        x = _t_prenorm_linattn(sd, f"downs.{i}.2", x)
        hs.append(x)
        if i < n - 1:
            x = F.conv2d(x, sd[f"downs.{i}.3.weight"], sd[f"downs.{i}.3.bias"],
                         stride=2, padding=1)
    x = _t_convnext_block(sd, "mid_block1", x, t, norm=True)
    x = _t_prenorm_linattn(sd, "mid_attn", x)
    x = _t_convnext_block(sd, "mid_block2", x, t, norm=True)
    for i in range(len(in_out) - 1):
        x = torch.cat([x, hs.pop()], dim=1)
        x = _t_convnext_block(sd, f"ups.{i}.0", x, t, norm=True)
        x = _t_convnext_block(sd, f"ups.{i}.1", x, t, norm=True)
        x = _t_prenorm_linattn(sd, f"ups.{i}.2", x)
        if i < n - 1:
            x = F.conv_transpose2d(x, sd[f"ups.{i}.3.weight"],
                                   sd[f"ups.{i}.3.bias"], stride=2, padding=1)
    x = _t_convnext_block(sd, "final_conv.0", x, None, norm=True)
    return F.conv2d(x, sd["final_conv.1.weight"], sd["final_conv.1.bias"])


def test_unet_convnext_full_model_numerical():
    dim, mults, ch = 8, (1, 2), 3
    sd = _synth_convnext_sd(dim, mults, ch)
    # tame the magnitudes: iid-normal weights through stacked convs explode;
    # scale like fan-in so activations stay O(1)
    sd = {k: v * 0.2 if v.ndim >= 2 else v * 0.2 for k, v in sd.items()}

    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 16, 16, ch)).astype(np.float64)
    tt = np.array([3, 7], np.int64)

    want = torch_unet_convnext(
        _t(sd), torch.as_tensor(np.transpose(x, (0, 3, 1, 2))),
        torch.as_tensor(tt), dim, mults, ch,
    ).detach().numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    with jax.enable_x64(True):
        params = import_unet_convnext(sd, dim, mults, ch)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), params)
        model = UnetConvNext(dim=dim, dim_mults=mults, channels=ch)
        got = np.asarray(model.apply(params, jnp.asarray(x),
                                     jnp.asarray(tt)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


# ------------------------- DDPM ResNet family ------------------------- #

def _t_gn(x, w, b, eps=1e-6):
    return F.group_norm(x, 32, w, b, eps)


def _t_resblock(sd, p, x, temb):
    # ResnetBlock forward (Model2.py:76-133), dropout off (eval)
    h = _swish(_t_gn(x, sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"]))
    h = F.conv2d(h, sd[f"{p}.conv1.weight"], sd[f"{p}.conv1.bias"], padding=1)
    h = h + F.linear(_swish(temb), sd[f"{p}.temb_proj.weight"],
                     sd[f"{p}.temb_proj.bias"])[:, :, None, None]
    h = _swish(_t_gn(h, sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"]))
    h = F.conv2d(h, sd[f"{p}.conv2.weight"], sd[f"{p}.conv2.bias"], padding=1)
    if f"{p}.nin_shortcut.weight" in sd:
        x = F.conv2d(x, sd[f"{p}.nin_shortcut.weight"],
                     sd[f"{p}.nin_shortcut.bias"])
    return x + h


def _t_attnblock(sd, p, x):
    # AttnBlock forward (Model2.py:136-188)
    c = x.shape[1]
    h = _t_gn(x, sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
    q = F.conv2d(h, sd[f"{p}.q.weight"], sd[f"{p}.q.bias"])
    k = F.conv2d(h, sd[f"{p}.k.weight"], sd[f"{p}.k.bias"])
    v = F.conv2d(h, sd[f"{p}.v.weight"], sd[f"{p}.v.bias"])
    b, _, hh, ww = q.shape
    q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
    k = k.reshape(b, c, hh * ww)
    w_ = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=2)
    v = v.reshape(b, c, hh * ww)
    h = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
    h = F.conv2d(h, sd[f"{p}.proj_out.weight"], sd[f"{p}.proj_out.bias"])
    return x + h


def _t_ddpm_emb(t, dim):
    # get_timestep_embedding (Model2.py:6-24); fp32 angles like the Flax side
    half = dim // 2
    freq = torch.exp(torch.arange(half, dtype=torch.float32)
                     * (-math.log(10000.0) / (half - 1)))
    ang = (t.to(torch.float32)[:, None] * freq[None, :]).to(torch.float64)
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)


def torch_unet_resnet(sd, x, time, ch, ch_mult, num_res_blocks, attn_res,
                      resolution):
    """Functional transcription of the reference ``Model.forward``
    (Model2.py:237-332)."""
    temb = _t_ddpm_emb(time, ch)
    temb = F.linear(temb, sd["temb.dense.0.weight"], sd["temb.dense.0.bias"])
    temb = F.linear(_swish(temb), sd["temb.dense.1.weight"],
                    sd["temb.dense.1.bias"])

    num_res = len(ch_mult)
    hs = [F.conv2d(x, sd["conv_in.weight"], sd["conv_in.bias"], padding=1)]
    curr = resolution
    for i in range(num_res):
        for j in range(num_res_blocks):
            h = _t_resblock(sd, f"down.{i}.block.{j}", hs[-1], temb)
            if curr in attn_res:
                h = _t_attnblock(sd, f"down.{i}.attn.{j}", h)
            hs.append(h)
        if i != num_res - 1:
            d = F.pad(hs[-1], (0, 1, 0, 1))
            hs.append(F.conv2d(d, sd[f"down.{i}.downsample.conv.weight"],
                               sd[f"down.{i}.downsample.conv.bias"], stride=2))
            curr //= 2
    h = hs[-1]
    h = _t_resblock(sd, "mid.block_1", h, temb)
    h = _t_attnblock(sd, "mid.attn_1", h)
    h = _t_resblock(sd, "mid.block_2", h, temb)
    for i in reversed(range(num_res)):
        for j in range(num_res_blocks + 1):
            h = _t_resblock(sd, f"up.{i}.block.{j}",
                            torch.cat([h, hs.pop()], dim=1), temb)
            if curr in attn_res:
                h = _t_attnblock(sd, f"up.{i}.attn.{j}", h)
        if i != 0:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = F.conv2d(h, sd[f"up.{i}.upsample.conv.weight"],
                         sd[f"up.{i}.upsample.conv.bias"], padding=1)
            curr *= 2
    h = _swish(_t_gn(h, sd["norm_out.weight"], sd["norm_out.bias"]))
    return F.conv2d(h, sd["conv_out.weight"], sd["conv_out.bias"], padding=1)


def test_unet_resnet_full_model_numerical():
    ch, mult, nrb, attn_res, res = 32, (1, 2), 1, (8,), 16
    sd = _synth_resnet_sd(ch, mult, nrb, attn_res, res)
    sd = {k: v * 0.2 if v.ndim >= 2 else v for k, v in sd.items()}

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, res, res, 3)).astype(np.float64)
    tt = np.array([1, 5], np.int64)

    want = torch_unet_resnet(
        _t(sd), torch.as_tensor(np.transpose(x, (0, 3, 1, 2))),
        torch.as_tensor(tt), ch, mult, nrb, attn_res, res,
    ).detach().numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    with jax.enable_x64(True):
        params = import_unet_resnet(sd, ch, mult, nrb, attn_res, res)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), params)
        model = UnetResNet(resolution=res, ch=ch, ch_mult=mult,
                           num_res_blocks=nrb, attn_resolutions=attn_res,
                           out_ch=3)
        got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(tt)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
