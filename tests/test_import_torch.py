"""Checkpoint-importer tests: primitive conversions verified numerically vs
torch; full-model mapping verified structurally against flax init shapes
(and numerically end-to-end in test_import_torch_full.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
from flax import linen as fnn

from colddiff.models import UnetConvNext, UnetResNet
from colddiff.models.import_torch import (
    convert_conv,
    convert_conv_transpose,
    convert_depthwise_conv,
    convert_linear,
    import_unet_convnext,
    import_unet_resnet,
)


def nchw(x):
    return torch.as_tensor(np.transpose(x, (0, 3, 1, 2)), dtype=torch.float64)


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv_conversion(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    tconv = nn.Conv2d(3, 5, 3, padding=1).double()
    want = to_nhwc(tconv(nchw(x)))
    fconv = fnn.Conv(5, (3, 3), padding=1)
    params = {"params": {"kernel": convert_conv(tconv.weight.detach().numpy()),
                         "bias": tconv.bias.detach().numpy()}}
    got = fconv.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_conversion(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    tconv = nn.Conv2d(4, 4, 7, padding=3, groups=4).double()
    want = to_nhwc(tconv(nchw(x)))
    fconv = fnn.Conv(4, (7, 7), padding=3, feature_group_count=4)
    params = {"params": {
        "kernel": convert_depthwise_conv(tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy()}}
    got = fconv.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv_transpose_conversion(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    tconv = nn.ConvTranspose2d(3, 5, 4, 2, 1).double()
    want = to_nhwc(tconv(nchw(x)))
    fconv = fnn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME")
    params = {"params": {
        "kernel": convert_conv_transpose(tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy()}}
    got = fconv.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_linear_conversion(rng):
    x = rng.standard_normal((4, 6)).astype(np.float32)
    tl = nn.Linear(6, 3).double()
    want = tl(torch.as_tensor(x, dtype=torch.float64)).detach().numpy()
    fl = fnn.Dense(3)
    params = {"params": {"kernel": convert_linear(tl.weight.detach().numpy()),
                         "bias": tl.bias.detach().numpy()}}
    got = fl.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_linear_attention_block_matches_torch(rng):
    """Full LinearAttention block vs a plain-torch transcription of the
    reference forward (deblurring_diffusion_pytorch.py:167-187): 1x1 qkv conv
    (no bias), per-head chunk, q*scale, softmax over tokens, the two context
    einsums, 1x1 out conv.  Pins the block-diagonal rewrite numerically."""
    from colddiff.models.layers import LinearAttention

    dim, heads, dh = 16, 4, 32
    hidden = heads * dh
    x = rng.standard_normal((2, 8, 8, dim)).astype(np.float32)
    wqkv = rng.standard_normal((hidden * 3, dim, 1, 1)).astype(np.float32)
    wout = rng.standard_normal((dim, hidden, 1, 1)).astype(np.float32)
    bout = rng.standard_normal((dim,)).astype(np.float32)

    xt = nchw(x)
    qkv = torch.nn.functional.conv2d(xt, torch.as_tensor(wqkv, dtype=torch.float64))
    b, _, h, w = qkv.shape
    q, k, v = (
        t.reshape(b, heads, dh, h * w) for t in qkv.chunk(3, dim=1)
    )
    q = q * dh ** -0.5
    k = k.softmax(dim=-1)
    ctx = torch.einsum("bhdn,bhen->bhde", k, v)
    out = torch.einsum("bhde,bhdn->bhen", ctx, q).reshape(b, hidden, h, w)
    want = to_nhwc(
        torch.nn.functional.conv2d(
            out, torch.as_tensor(wout, dtype=torch.float64),
            torch.as_tensor(bout, dtype=torch.float64),
        )
    )

    mod = LinearAttention(heads=heads, dim_head=dh)
    params = {"params": {
        "to_qkv": {"kernel": convert_conv(wqkv)},
        "to_out": {"kernel": convert_conv(wout), "bias": bout},
    }}
    got = mod.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def _synth_convnext_sd(dim, dim_mults, channels):
    """Synthesize a reference-layout state dict with correct torch shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def block(name, din, dout, norm=True, time=True, mult=2):
        sd[f"{name}.ds_conv.weight"] = rng.standard_normal(
            (din, 1, 7, 7)).astype(np.float32)
        sd[f"{name}.ds_conv.bias"] = rng.standard_normal((din,)).astype(np.float32)
        if time:
            sd[f"{name}.mlp.1.weight"] = rng.standard_normal(
                (din, dim)).astype(np.float32)
            sd[f"{name}.mlp.1.bias"] = rng.standard_normal((din,)).astype(np.float32)
        if norm:
            sd[f"{name}.net.0.g"] = np.ones((1, din, 1, 1), np.float32)
            sd[f"{name}.net.0.b"] = np.zeros((1, din, 1, 1), np.float32)
        conv(f"{name}.net.1", dout * mult, din, 3)
        conv(f"{name}.net.3", dout, dout * mult, 3)
        if din != dout:
            conv(f"{name}.res_conv", dout, din, 1)

    def attn(name, d):
        hidden = 4 * 32
        sd[f"{name}.fn.norm.g"] = np.ones((1, d, 1, 1), np.float32)
        sd[f"{name}.fn.norm.b"] = np.zeros((1, d, 1, 1), np.float32)
        sd[f"{name}.fn.fn.to_qkv.weight"] = rng.standard_normal(
            (hidden * 3, d, 1, 1)).astype(np.float32)
        conv(f"{name}.fn.fn.to_out", d, hidden, 1)

    dims = [channels] + [dim * m for m in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    sd["time_mlp.1.weight"] = rng.standard_normal((dim * 4, dim)).astype(np.float32)
    sd["time_mlp.1.bias"] = rng.standard_normal((dim * 4,)).astype(np.float32)
    sd["time_mlp.3.weight"] = rng.standard_normal((dim, dim * 4)).astype(np.float32)
    sd["time_mlp.3.bias"] = rng.standard_normal((dim,)).astype(np.float32)
    for i, (din, dout) in enumerate(in_out):
        block(f"downs.{i}.0", din, dout, norm=i != 0)
        block(f"downs.{i}.1", dout, dout)
        attn(f"downs.{i}.2", dout)
        if i < len(in_out) - 1:
            conv(f"downs.{i}.3", dout, dout, 4)
    mid = dims[-1]
    block("mid_block1", mid, mid)
    attn("mid_attn", mid)
    block("mid_block2", mid, mid)
    for i, (din, dout) in enumerate(reversed(in_out[1:])):
        block(f"ups.{i}.0", dout * 2, din)
        block(f"ups.{i}.1", din, din)
        attn(f"ups.{i}.2", din)
        if i < len(in_out) - 1:
            sd[f"ups.{i}.3.weight"] = rng.standard_normal(
                (din, din, 4, 4)).astype(np.float32)
            sd[f"ups.{i}.3.bias"] = rng.standard_normal((din,)).astype(np.float32)
    block("final_conv.0", dim, dim, time=False)
    conv("final_conv.1", channels, dim, 1)
    return sd


def test_import_unet_convnext_structural():
    dim, mults, ch = 8, (1, 2), 3
    sd = _synth_convnext_sd(dim, mults, ch)
    params = import_unet_convnext(sd, dim, mults, ch)
    model = UnetConvNext(dim=dim, dim_mults=mults, channels=ch)
    x = jnp.zeros((1, 16, 16, ch))
    ref = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32))
    # identical tree structure and shapes
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(
        got_shapes
    )
    jax.tree_util.tree_map(lambda a, b: (a == b) or (_ for _ in ()).throw(
        AssertionError(f"{a} != {b}")), ref_shapes, got_shapes)
    # and the imported params actually run
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, params), x,
                    jnp.zeros((1,), jnp.int32))
    assert y.shape == x.shape


def _synth_resnet_sd(ch, ch_mult, num_res_blocks, attn_res, resolution, in_ch=3):
    rng = np.random.default_rng(1)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def dense(name, o, i):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def block(name, cin, cout, temb):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cout, cin, 3)
        dense(f"{name}.temb_proj", cout, temb)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{name}.nin_shortcut", cout, cin, 1)

    def attn(name, c):
        norm(f"{name}.norm", c)
        for n in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{n}", c, c, 1)

    temb = ch * 4
    dense("temb.dense.0", temb, ch)
    dense("temb.dense.1", temb, temb)
    conv("conv_in", ch, in_ch, 3)
    num_res = len(ch_mult)
    in_mult = (1,) + tuple(ch_mult)
    curr = resolution
    for i in range(num_res):
        cin = ch * in_mult[i]
        cout = ch * ch_mult[i]
        for j in range(num_res_blocks):
            block(f"down.{i}.block.{j}", cin, cout, temb)
            cin = cout
            if curr in attn_res:
                attn(f"down.{i}.attn.{j}", cout)
        if i != num_res - 1:
            conv(f"down.{i}.downsample.conv", cin, cin, 3)
            curr //= 2
    block("mid.block_1", cin, cin, temb)
    attn("mid.attn_1", cin)
    block("mid.block_2", cin, cin, temb)
    for i in reversed(range(num_res)):
        cout = ch * ch_mult[i]
        for j in range(num_res_blocks + 1):
            skip = ch * ch_mult[i] if j < num_res_blocks else ch * in_mult[i]
            block(f"up.{i}.block.{j}", cin + skip, cout, temb)
            cin = cout
            if curr in attn_res:
                attn(f"up.{i}.attn.{j}", cout)
        if i != 0:
            conv(f"up.{i}.upsample.conv", cin, cin, 3)
            curr *= 2
    norm("norm_out", cin)
    conv("conv_out", in_ch, cin, 3)
    return sd


def test_import_unet_resnet_structural():
    ch, mult, nrb, attn_res, res = 32, (1, 2), 1, (8,), 16
    sd = _synth_resnet_sd(ch, mult, nrb, attn_res, res)
    params = import_unet_resnet(sd, ch, mult, nrb, attn_res, res)
    model = UnetResNet(resolution=res, ch=ch, ch_mult=mult, num_res_blocks=nrb,
                       attn_resolutions=attn_res, out_ch=3)
    x = jnp.zeros((1, res, res, 3))
    ref = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(
        got_shapes
    )
    jax.tree_util.tree_map(lambda a, b: (a == b) or (_ for _ in ()).throw(
        AssertionError(f"{a} != {b}")), ref_shapes, got_shapes)
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, params), x,
                    jnp.zeros((1,), jnp.int32))
    assert y.shape == x.shape
