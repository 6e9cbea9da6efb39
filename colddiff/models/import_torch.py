"""Import reference PyTorch checkpoints into the Flax UNets.

The reference distributes pretrained ``model.pt`` checkpoints
(``torch.save({'step', 'model', 'ema'})``, deblurring_diffusion_pytorch.py:
1140-1149; Drive links in README.md:7).  This module maps those state dicts
(ConvNeXt ``Unet`` / DDPM ``Model`` layouts) onto ``UnetConvNext`` /
``UnetResNet`` parameter trees.

Tensor conversions (numerically verified in tests/test_import_torch.py):
  conv            [O, I, kh, kw]  -> [kh, kw, I, O]
  depthwise conv  [C, 1, kh, kw]  -> [kh, kw, 1, C]
  conv-transpose  [I, O, kh, kw]  -> flip(kh, kw) then [kh, kw, I, O]
  linear          [O, I]          -> [I, O]
  norm scale/bias [1, C, 1, 1] or [C] -> [C]
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "convert_conv",
    "convert_depthwise_conv",
    "convert_conv_transpose",
    "convert_linear",
    "load_torch_blob",
    "load_reference_checkpoint",
    "reference_checkpoint_step",
    "import_unet_convnext",
    "import_unet_resnet",
    "import_for_model",
]


def convert_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convert_depthwise_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convert_conv_transpose(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d correlates the *flipped* kernel with io swapped;
    # flax ConvTranspose uses the kernel as given in [kh, kw, I, O]
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def convert_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _vec(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).reshape(-1)


def load_torch_blob(path_or_blob):
    """torch.load a checkpoint path; dicts pass through (already loaded)."""
    if isinstance(path_or_blob, dict):
        return path_or_blob
    import torch

    return torch.load(path_or_blob, map_location="cpu")


def load_reference_checkpoint(path_or_blob, use_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference model.pt (or an already-torch.load-ed blob); returns
    a flat name->numpy dict with the DataParallel ``module.`` prefixes
    stripped and the ``denoise_fn.`` scope removed (the UNet weights only)."""
    blob = load_torch_blob(path_or_blob)
    if isinstance(blob, dict) and ("model" in blob or "ema" in blob):
        # reference Trainer checkpoints are {step, model, ema}
        # (deblurring_diffusion_pytorch.py:1140-1149); a missing or
        # None-valued slot (EMA not yet initialized) falls back to the other
        want = "ema" if use_ema else "model"
        other = "model" if use_ema else "ema"
        sd = blob.get(want)
        if sd is None:
            sd = blob.get(other)
            if sd is not None:
                import warnings

                warnings.warn(
                    f"checkpoint has no usable '{want}' state dict; "
                    f"falling back to '{other}' weights", stacklevel=2)
        if sd is None:
            raise KeyError(
                "checkpoint has neither a usable 'model' nor 'ema' state dict")
    else:
        sd = blob
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        if k.startswith("denoise_fn."):
            k = k[len("denoise_fn."):]
        elif "." in k and not any(
            k.startswith(p) for p in ("time_mlp", "downs", "ups", "mid", "final_conv",
                                      "temb", "conv_in", "down", "up", "norm_out",
                                      "conv_out")
        ):
            continue  # degradation buffers (gaussian_kernels, alphas, ...)
        out[k] = np.asarray(v.numpy() if hasattr(v, "numpy") else v)
    return out


# --------------------------------------------------------------------- #

def _convnext_block(sd, tp, has_time: bool, has_norm: bool, dim_match: bool):
    p = {
        "ds_conv": {"kernel": convert_depthwise_conv(sd[f"{tp}.ds_conv.weight"]),
                    "bias": _vec(sd[f"{tp}.ds_conv.bias"])},
        "net_conv1": {"kernel": convert_conv(sd[f"{tp}.net.1.weight"]),
                      "bias": _vec(sd[f"{tp}.net.1.bias"])},
        "net_conv2": {"kernel": convert_conv(sd[f"{tp}.net.3.weight"]),
                      "bias": _vec(sd[f"{tp}.net.3.bias"])},
    }
    if has_time:
        p["mlp_dense"] = {"kernel": convert_linear(sd[f"{tp}.mlp.1.weight"]),
                          "bias": _vec(sd[f"{tp}.mlp.1.bias"])}
    if has_norm:
        p["norm"] = {"scale": _vec(sd[f"{tp}.net.0.g"]),
                     "bias": _vec(sd[f"{tp}.net.0.b"])}
    if not dim_match:
        p["res_conv"] = {"kernel": convert_conv(sd[f"{tp}.res_conv.weight"]),
                         "bias": _vec(sd[f"{tp}.res_conv.bias"])}
    return p


def _prenorm_attn(sd, tp):
    return {
        "norm": {"scale": _vec(sd[f"{tp}.fn.norm.g"]),
                 "bias": _vec(sd[f"{tp}.fn.norm.b"])},
        "attn": {
            "to_qkv": {"kernel": convert_conv(sd[f"{tp}.fn.fn.to_qkv.weight"])},
            "to_out": {"kernel": convert_conv(sd[f"{tp}.fn.fn.to_out.weight"]),
                       "bias": _vec(sd[f"{tp}.fn.fn.to_out.bias"])},
        },
    }


def import_unet_convnext(sd: Dict[str, np.ndarray], dim: int,
                         dim_mults=(1, 2, 4, 8), channels: int = 3,
                         with_time_emb: bool = True) -> dict:
    """Build the UnetConvNext params dict from a reference ``Unet`` state dict."""
    dims = [channels] + [dim * m for m in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    n_res = len(in_out)
    p: dict = {}
    if with_time_emb:
        p["time_mlp1"] = {"kernel": convert_linear(sd["time_mlp.1.weight"]),
                          "bias": _vec(sd["time_mlp.1.bias"])}
        p["time_mlp2"] = {"kernel": convert_linear(sd["time_mlp.3.weight"]),
                          "bias": _vec(sd["time_mlp.3.bias"])}
    for i, (din, dout) in enumerate(in_out):
        p[f"down_{i}_block1"] = _convnext_block(
            sd, f"downs.{i}.0", with_time_emb, has_norm=i != 0,
            dim_match=din == dout)
        p[f"down_{i}_block2"] = _convnext_block(
            sd, f"downs.{i}.1", with_time_emb, True, True)
        p[f"down_{i}_attn"] = _prenorm_attn(sd, f"downs.{i}.2")
        if i < n_res - 1:
            p[f"down_{i}_downsample"] = {
                "kernel": convert_conv(sd[f"downs.{i}.3.weight"]),
                "bias": _vec(sd[f"downs.{i}.3.bias"]),
            }
    p["mid_block1"] = _convnext_block(sd, "mid_block1", with_time_emb, True, True)
    p["mid_attn"] = _prenorm_attn(sd, "mid_attn")
    p["mid_block2"] = _convnext_block(sd, "mid_block2", with_time_emb, True, True)
    for i, (din, dout) in enumerate(reversed(in_out[1:])):
        p[f"up_{i}_block1"] = _convnext_block(
            sd, f"ups.{i}.0", with_time_emb, True, dim_match=False)
        p[f"up_{i}_block2"] = _convnext_block(
            sd, f"ups.{i}.1", with_time_emb, True, True)
        p[f"up_{i}_attn"] = _prenorm_attn(sd, f"ups.{i}.2")
        if i < n_res - 1:
            p[f"up_{i}_upsample"] = {
                "kernel": convert_conv_transpose(sd[f"ups.{i}.3.weight"]),
                "bias": _vec(sd[f"ups.{i}.3.bias"]),
            }
    p["final_block"] = _convnext_block(sd, "final_conv.0", False, True, True)
    p["final_conv"] = {"kernel": convert_conv(sd["final_conv.1.weight"]),
                       "bias": _vec(sd["final_conv.1.bias"])}
    return {"params": p}


# --------------------------------------------------------------------- #

def _resnet_block(sd, tp, in_ch, out_ch, with_time: bool):
    p = {
        "norm1": {"scale": _vec(sd[f"{tp}.norm1.weight"]),
                  "bias": _vec(sd[f"{tp}.norm1.bias"])},
        "conv1": {"kernel": convert_conv(sd[f"{tp}.conv1.weight"]),
                  "bias": _vec(sd[f"{tp}.conv1.bias"])},
        "norm2": {"scale": _vec(sd[f"{tp}.norm2.weight"]),
                  "bias": _vec(sd[f"{tp}.norm2.bias"])},
        "conv2": {"kernel": convert_conv(sd[f"{tp}.conv2.weight"]),
                  "bias": _vec(sd[f"{tp}.conv2.bias"])},
    }
    if with_time:
        p["temb_proj"] = {"kernel": convert_linear(sd[f"{tp}.temb_proj.weight"]),
                          "bias": _vec(sd[f"{tp}.temb_proj.bias"])}
    if in_ch != out_ch:
        p["nin_shortcut"] = {"kernel": convert_conv(sd[f"{tp}.nin_shortcut.weight"]),
                             "bias": _vec(sd[f"{tp}.nin_shortcut.bias"])}
    return p


def _attn_block(sd, tp):
    out = {"norm": {"scale": _vec(sd[f"{tp}.norm.weight"]),
                    "bias": _vec(sd[f"{tp}.norm.bias"])}}
    for n in ("q", "k", "v", "proj_out"):
        out[n] = {"kernel": convert_conv(sd[f"{tp}.{n}.weight"]),
                  "bias": _vec(sd[f"{tp}.{n}.bias"])}
    return out


def import_unet_resnet(sd: Dict[str, np.ndarray], ch: int, ch_mult=(1, 2, 2, 2),
                       num_res_blocks: int = 2, attn_resolutions=(16,),
                       resolution: int = 32, with_time_emb: bool = True) -> dict:
    p: dict = {}
    if with_time_emb:
        p["temb_dense0"] = {"kernel": convert_linear(sd["temb.dense.0.weight"]),
                            "bias": _vec(sd["temb.dense.0.bias"])}
        p["temb_dense1"] = {"kernel": convert_linear(sd["temb.dense.1.weight"]),
                            "bias": _vec(sd["temb.dense.1.bias"])}
    p["conv_in"] = {"kernel": convert_conv(sd["conv_in.weight"]),
                    "bias": _vec(sd["conv_in.bias"])}
    num_res = len(ch_mult)
    in_mult = (1,) + tuple(ch_mult)
    curr_res = resolution
    for i in range(num_res):
        block_in = ch * in_mult[i]
        block_out = ch * ch_mult[i]
        for j in range(num_res_blocks):
            p[f"down_{i}_block_{j}"] = _resnet_block(
                sd, f"down.{i}.block.{j}", block_in, block_out, with_time_emb)
            block_in = block_out
            if curr_res in attn_resolutions:
                p[f"down_{i}_attn_{j}"] = _attn_block(sd, f"down.{i}.attn.{j}")
        if i != num_res - 1:
            p[f"down_{i}_downsample"] = {"conv": {
                "kernel": convert_conv(sd[f"down.{i}.downsample.conv.weight"]),
                "bias": _vec(sd[f"down.{i}.downsample.conv.bias"])}}
            curr_res //= 2
    p["mid_block1"] = _resnet_block(sd, "mid.block_1", block_in, block_in, with_time_emb)
    p["mid_attn"] = _attn_block(sd, "mid.attn_1")
    p["mid_block2"] = _resnet_block(sd, "mid.block_2", block_in, block_in, with_time_emb)
    for i in reversed(range(num_res)):
        block_out = ch * ch_mult[i]
        for j in range(num_res_blocks + 1):
            skip_in = ch * ch_mult[i] if j < num_res_blocks else ch * in_mult[i]
            p[f"up_{i}_block_{j}"] = _resnet_block(
                sd, f"up.{i}.block.{j}", block_in + skip_in, block_out, with_time_emb)
            block_in = block_out
            if curr_res in attn_resolutions:
                p[f"up_{i}_attn_{j}"] = _attn_block(sd, f"up.{i}.attn.{j}")
        if i != 0:
            p[f"up_{i}_upsample"] = {"conv": {
                "kernel": convert_conv(sd[f"up.{i}.upsample.conv.weight"]),
                "bias": _vec(sd[f"up.{i}.upsample.conv.bias"])}}
            curr_res *= 2
    p["norm_out"] = {"scale": _vec(sd["norm_out.weight"]),
                     "bias": _vec(sd["norm_out.bias"])}
    p["conv_out"] = {"kernel": convert_conv(sd["conv_out.weight"]),
                     "bias": _vec(sd["conv_out.bias"])}
    return {"params": p}


# --------------------------------------------------------------------- #

def reference_checkpoint_step(path_or_blob) -> int:
    """Step counter of a reference Trainer checkpoint (0 for bare dicts)."""
    blob = load_torch_blob(path_or_blob)
    return int(blob["step"]) if isinstance(blob, dict) and "step" in blob else 0


def import_for_model(model, path_or_blob, use_ema: bool = True) -> dict:
    """Import a reference ``model.pt`` into a params pytree for ``model``.

    ``model`` is a constructed :class:`UnetConvNext` or :class:`UnetResNet`;
    its hyperparameters drive the layout mapping, so the checkpoint and the
    module must describe the same architecture (mismatches raise KeyError on
    the first missing reference tensor).  Pass an already-loaded blob to
    deserialize the file once across model/EMA/step reads.
    """
    from .unet_convnext import UnetConvNext
    from .unet_resnet import UnetResNet

    sd = load_reference_checkpoint(path_or_blob, use_ema=use_ema)
    if isinstance(model, UnetConvNext):
        return import_unet_convnext(
            sd, model.dim, tuple(model.dim_mults), model.channels,
            with_time_emb=model.with_time_emb)
    if isinstance(model, UnetResNet):
        return import_unet_resnet(
            sd, model.ch, tuple(model.ch_mult), model.num_res_blocks,
            tuple(model.attn_resolutions), model.resolution,
            with_time_emb=model.with_time_emb)
    raise TypeError(f"no reference-checkpoint importer for "
                    f"{type(model).__name__}")
