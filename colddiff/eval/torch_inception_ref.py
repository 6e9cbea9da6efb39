"""Plain-torch reference forward of the FID InceptionV3 (verification only).

The reference FID model (snowification/Fid/inception.py:16-129) is
torchvision's InceptionV3 with the mseitzer FID patches:
  - count_include_pad=False 3x3/s1/p1 average pools in InceptionA/C/E_1
    (inception.py:228-229, :256-257, :289-290),
  - max pool instead of avg pool in the final InceptionE_2 (:324),
  - pool3 output = AdaptiveAvgPool2d(1) after Mixed_7c (:118-124),
  - input bilinearly resized to 299 (align_corners=False) and scaled
    (0,1)->(-1,1) (:146-153).

torchvision is not installed in this container, so this is a from-scratch
functional transcription of that architecture (BasicConv2d = Conv2d(bias=
False) + BatchNorm2d(eps=0.001) + ReLU and the standard InceptionA/B/C/D/E
channel plan) that consumes a pt_inception-layout state dict directly.  It
exists ONLY to verify the JAX graph in colddiff/eval/fid.py:
  - tests/test_fid_inception.py pins the two bit-for-bit at float64 on a
    synthetic state dict;
  - scripts/verify_fid_weights.py replays the comparison against a real
    pt_inception-2015-12-05 weights file the moment one is available,
    proving paper-comparable FID mechanically (VERDICT r2, missing #1).

Torch runs on CPU at verification/setup time; nothing here is on the
training or sampling path.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------- #
# conv spec table: prefix -> (in_ch, out_ch, (kh, kw)); channel plan per
# torchvision.models.inception v3 (aux_logits irrelevant for pool3)

CONV_SPECS = {}


def _add(pre, i, o, k):
    CONV_SPECS[pre] = (i, o, (k, k) if isinstance(k, int) else k)


_add("Conv2d_1a_3x3", 3, 32, 3)
_add("Conv2d_2a_3x3", 32, 32, 3)
_add("Conv2d_2b_3x3", 32, 64, 3)
_add("Conv2d_3b_1x1", 64, 80, 1)
_add("Conv2d_4a_3x3", 80, 192, 3)


def _spec_a(pre, cin, pool):
    _add(f"{pre}.branch1x1", cin, 64, 1)
    _add(f"{pre}.branch5x5_1", cin, 48, 1)
    _add(f"{pre}.branch5x5_2", 48, 64, 5)
    _add(f"{pre}.branch3x3dbl_1", cin, 64, 1)
    _add(f"{pre}.branch3x3dbl_2", 64, 96, 3)
    _add(f"{pre}.branch3x3dbl_3", 96, 96, 3)
    _add(f"{pre}.branch_pool", cin, pool, 1)


def _spec_b(pre, cin):
    _add(f"{pre}.branch3x3", cin, 384, 3)
    _add(f"{pre}.branch3x3dbl_1", cin, 64, 1)
    _add(f"{pre}.branch3x3dbl_2", 64, 96, 3)
    _add(f"{pre}.branch3x3dbl_3", 96, 96, 3)


def _spec_c(pre, c7):
    cin = 768
    _add(f"{pre}.branch1x1", cin, 192, 1)
    _add(f"{pre}.branch7x7_1", cin, c7, 1)
    _add(f"{pre}.branch7x7_2", c7, c7, (1, 7))
    _add(f"{pre}.branch7x7_3", c7, 192, (7, 1))
    _add(f"{pre}.branch7x7dbl_1", cin, c7, 1)
    _add(f"{pre}.branch7x7dbl_2", c7, c7, (7, 1))
    _add(f"{pre}.branch7x7dbl_3", c7, c7, (1, 7))
    _add(f"{pre}.branch7x7dbl_4", c7, c7, (7, 1))
    _add(f"{pre}.branch7x7dbl_5", c7, 192, (1, 7))
    _add(f"{pre}.branch_pool", cin, 192, 1)


def _spec_d(pre, cin):
    _add(f"{pre}.branch3x3_1", cin, 192, 1)
    _add(f"{pre}.branch3x3_2", 192, 320, 3)
    _add(f"{pre}.branch7x7x3_1", cin, 192, 1)
    _add(f"{pre}.branch7x7x3_2", 192, 192, (1, 7))
    _add(f"{pre}.branch7x7x3_3", 192, 192, (7, 1))
    _add(f"{pre}.branch7x7x3_4", 192, 192, 3)


def _spec_e(pre, cin):
    _add(f"{pre}.branch1x1", cin, 320, 1)
    _add(f"{pre}.branch3x3_1", cin, 384, 1)
    _add(f"{pre}.branch3x3_2a", 384, 384, (1, 3))
    _add(f"{pre}.branch3x3_2b", 384, 384, (3, 1))
    _add(f"{pre}.branch3x3dbl_1", cin, 448, 1)
    _add(f"{pre}.branch3x3dbl_2", 448, 384, 3)
    _add(f"{pre}.branch3x3dbl_3a", 384, 384, (1, 3))
    _add(f"{pre}.branch3x3dbl_3b", 384, 384, (3, 1))
    _add(f"{pre}.branch_pool", cin, 192, 1)


_spec_a("Mixed_5b", 192, 32)
_spec_a("Mixed_5c", 256, 64)
_spec_a("Mixed_5d", 288, 64)
_spec_b("Mixed_6a", 288)
_spec_c("Mixed_6b", 128)
_spec_c("Mixed_6c", 160)
_spec_c("Mixed_6d", 160)
_spec_c("Mixed_6e", 192)
_spec_d("Mixed_7a", 768)
_spec_e("Mixed_7b", 1280)
_spec_e("Mixed_7c", 2048)


def synth_state_dict(seed=0, dtype=np.float64):
    """Random weights with the pt_inception key layout, magnitude-controlled
    so activations stay O(1) through ~96 conv+bn layers."""
    rng = np.random.default_rng(seed)
    sd = {}
    for pre, (cin, cout, (kh, kw)) in CONV_SPECS.items():
        fan_in = cin * kh * kw
        sd[f"{pre}.conv.weight"] = (
            rng.standard_normal((cout, cin, kh, kw)) * np.sqrt(2.0 / fan_in)
        ).astype(dtype)
        sd[f"{pre}.bn.weight"] = rng.uniform(0.8, 1.2, (cout,)).astype(dtype)
        sd[f"{pre}.bn.bias"] = (rng.standard_normal((cout,)) * 0.1).astype(dtype)
        sd[f"{pre}.bn.running_mean"] = (
            rng.standard_normal((cout,)) * 0.1
        ).astype(dtype)
        sd[f"{pre}.bn.running_var"] = rng.uniform(0.8, 1.2, (cout,)).astype(dtype)
        sd[f"{pre}.bn.num_batches_tracked"] = np.asarray(0, np.int64)
    # classifier keys present in the real checkpoint; must be ignored
    sd["fc.weight"] = rng.standard_normal((1008, 2048)).astype(dtype)
    sd["fc.bias"] = rng.standard_normal((1008,)).astype(dtype)
    return sd


# --------------------------------------------------------------------- #
# plain-torch functional forward (the golden side)


def t_conv_bn(sd, pre, x, stride=1, padding=0):
    import torch
    import torch.nn.functional as F

    w = torch.as_tensor(sd[f"{pre}.conv.weight"])
    x = F.conv2d(x, w, stride=stride, padding=padding)
    x = F.batch_norm(
        x,
        torch.as_tensor(sd[f"{pre}.bn.running_mean"]),
        torch.as_tensor(sd[f"{pre}.bn.running_var"]),
        torch.as_tensor(sd[f"{pre}.bn.weight"]),
        torch.as_tensor(sd[f"{pre}.bn.bias"]),
        training=False,
        eps=0.001,
    )
    return F.relu(x)


def t_avg_pool_fid(x):
    import torch.nn.functional as F

    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def t_inception_a(sd, pre, x):
    import torch

    b1 = t_conv_bn(sd, f"{pre}.branch1x1", x)
    b5 = t_conv_bn(sd, f"{pre}.branch5x5_1", x)
    b5 = t_conv_bn(sd, f"{pre}.branch5x5_2", b5, padding=2)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_1", x)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_3", bd, padding=1)
    bp = t_conv_bn(sd, f"{pre}.branch_pool", t_avg_pool_fid(x))
    return torch.cat([b1, b5, bd, bp], 1)


def t_inception_b(sd, pre, x):
    import torch
    import torch.nn.functional as F

    b3 = t_conv_bn(sd, f"{pre}.branch3x3", x, stride=2)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_1", x)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


def t_inception_c(sd, pre, x):
    import torch

    b1 = t_conv_bn(sd, f"{pre}.branch1x1", x)
    b7 = t_conv_bn(sd, f"{pre}.branch7x7_1", x)
    b7 = t_conv_bn(sd, f"{pre}.branch7x7_2", b7, padding=(0, 3))
    b7 = t_conv_bn(sd, f"{pre}.branch7x7_3", b7, padding=(3, 0))
    bd = t_conv_bn(sd, f"{pre}.branch7x7dbl_1", x)
    bd = t_conv_bn(sd, f"{pre}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = t_conv_bn(sd, f"{pre}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = t_conv_bn(sd, f"{pre}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = t_conv_bn(sd, f"{pre}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = t_conv_bn(sd, f"{pre}.branch_pool", t_avg_pool_fid(x))
    return torch.cat([b1, b7, bd, bp], 1)


def t_inception_d(sd, pre, x):
    import torch
    import torch.nn.functional as F

    b3 = t_conv_bn(sd, f"{pre}.branch3x3_1", x)
    b3 = t_conv_bn(sd, f"{pre}.branch3x3_2", b3, stride=2)
    b7 = t_conv_bn(sd, f"{pre}.branch7x7x3_1", x)
    b7 = t_conv_bn(sd, f"{pre}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = t_conv_bn(sd, f"{pre}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = t_conv_bn(sd, f"{pre}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


def t_inception_e(sd, pre, x, pool):
    import torch
    import torch.nn.functional as F

    b1 = t_conv_bn(sd, f"{pre}.branch1x1", x)
    b3 = t_conv_bn(sd, f"{pre}.branch3x3_1", x)
    b3 = torch.cat(
        [
            t_conv_bn(sd, f"{pre}.branch3x3_2a", b3, padding=(0, 1)),
            t_conv_bn(sd, f"{pre}.branch3x3_2b", b3, padding=(1, 0)),
        ],
        1,
    )
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_1", x)
    bd = t_conv_bn(sd, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat(
        [
            t_conv_bn(sd, f"{pre}.branch3x3dbl_3a", bd, padding=(0, 1)),
            t_conv_bn(sd, f"{pre}.branch3x3dbl_3b", bd, padding=(1, 0)),
        ],
        1,
    )
    if pool == "max":
        bp = F.max_pool2d(x, 3, stride=1, padding=1)
    else:
        bp = t_avg_pool_fid(x)
    bp = t_conv_bn(sd, f"{pre}.branch_pool", bp)
    return torch.cat([b1, b3, bd, bp], 1)


def torch_pool3_features(sd, x01):
    """x01: NCHW torch tensor in [0, 1] (reference forward, inception.py:129-163)."""
    import torch.nn.functional as F

    x = F.interpolate(x01, size=(299, 299), mode="bilinear", align_corners=False)
    x = 2 * x - 1
    x = t_conv_bn(sd, "Conv2d_1a_3x3", x, stride=2)
    x = t_conv_bn(sd, "Conv2d_2a_3x3", x)
    x = t_conv_bn(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, stride=2)
    x = t_conv_bn(sd, "Conv2d_3b_1x1", x)
    x = t_conv_bn(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, stride=2)
    x = t_inception_a(sd, "Mixed_5b", x)
    x = t_inception_a(sd, "Mixed_5c", x)
    x = t_inception_a(sd, "Mixed_5d", x)
    x = t_inception_b(sd, "Mixed_6a", x)
    x = t_inception_c(sd, "Mixed_6b", x)
    x = t_inception_c(sd, "Mixed_6c", x)
    x = t_inception_c(sd, "Mixed_6d", x)
    x = t_inception_c(sd, "Mixed_6e", x)
    x = t_inception_d(sd, "Mixed_7a", x)
    x = t_inception_e(sd, "Mixed_7b", x, pool="avg")
    x = t_inception_e(sd, "Mixed_7c", x, pool="max")
    return x.mean(dim=(2, 3))
