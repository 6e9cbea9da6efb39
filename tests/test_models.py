"""Model family tests: shapes, jit, time-conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colddiff.models import UnetConvNext, UnetResNet, get_model


def test_unet_convnext_shapes_and_time_cond():
    model = UnetConvNext(dim=16, dim_mults=(1, 2), channels=3)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray([0, 5])
    params = model.init(jax.random.key(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    # time conditioning changes the output
    xr = jax.random.normal(jax.random.key(1), x.shape)
    y0 = model.apply(params, xr, jnp.asarray([0, 0]))
    y1 = model.apply(params, xr, jnp.asarray([9, 9]))
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_unet_convnext_residual_and_mean_scale():
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
    t = jnp.asarray([1])
    res = UnetConvNext(dim=8, dim_mults=(1, 2), residual=True)
    p = res.init(jax.random.key(1), x, t)
    base = UnetConvNext(dim=8, dim_mults=(1, 2), residual=False)
    yb = base.apply(p, x, t)
    yr = res.apply(p, x, t)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yb + x), atol=1e-5)

    ms = UnetConvNext(dim=8, dim_mults=(1, 2), output_mean_scale=True)
    yms = ms.apply(p, x, t)
    want = yb - jnp.mean(x, axis=(1, 2, 3), keepdims=True) + jnp.mean(
        yb, axis=(1, 2, 3), keepdims=True
    )
    np.testing.assert_allclose(np.asarray(yms), np.asarray(want), atol=1e-5)


def test_unet_convnext_no_time_emb():
    model = UnetConvNext(dim=8, dim_mults=(1, 2), with_time_emb=False)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.key(0), x, None)
    assert model.apply(params, x, None).shape == x.shape


def test_unet_resnet_shapes_attn_and_dropout():
    model = UnetResNet(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), dropout=0.5,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray([3, 7])
    params = model.init(jax.random.key(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    # dropout active in train mode
    xr = jax.random.normal(jax.random.key(1), x.shape)
    y1 = model.apply(params, xr, t, train=True, rngs={"dropout": jax.random.key(2)})
    y2 = model.apply(params, xr, t, train=True, rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_get_model_selector():
    m = get_model("UnetConvNext", dim=8, dim_mults=(1, 2))
    assert isinstance(m, UnetConvNext)
    m = get_model("UnetResNet", dataset="cifar10")
    assert isinstance(m, UnetResNet) and m.resolution == 32
    with pytest.raises(ValueError):
        get_model("Nope")


def test_bf16_params_keep_bf16_compute():
    """bf16 params + bf16 input must stay bf16 through the whole graph.

    Regression guard for the round-2 "bf16 doesn't pay" artifact: the fp32
    sinusoidal time embedding promoted every downstream conv to fp32, so the
    "bf16" benchmark silently ran fp32 compute.  The output dtype is the
    canary (any fp32 leak promotes it), and the values must track fp32."""
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    t = jnp.asarray([3, 7])
    for model in (
        UnetConvNext(dim=16, dim_mults=(1, 2)),
        UnetResNet(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(16,)),
    ):
        params = model.init(jax.random.key(0), x32, t)
        ref = model.apply(params, x32, t)
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        out = model.apply(pb, x32.astype(jnp.bfloat16), t)
        assert out.dtype == jnp.bfloat16, f"fp32 leak in {type(model).__name__}"
        err = float(jnp.max(jnp.abs(ref - out.astype(jnp.float32))))
        assert err < 0.1, f"{type(model).__name__} bf16 diverges: {err}"


def test_gelu_precision_dispatch():
    """fp32+ uses the exact erf GELU (torch-parity goldens depend on it);
    sub-fp32 activations use the tanh form (erf costs +2.5 ms/call on the
    bf16 UNet forward for a sub-bf16-quantization value difference)."""
    from colddiff.models.layers import gelu

    v = jnp.linspace(-4.0, 4.0, 257)
    for dt in (jnp.float32, jnp.float64):
        x = v.astype(dt)
        assert bool(jnp.all(gelu(x) == jax.nn.gelu(x, approximate=False)))
    xb = v.astype(jnp.bfloat16)
    assert bool(jnp.all(gelu(xb) == jax.nn.gelu(xb, approximate=True)))
    # the two forms agree below bf16 resolution on real activations
    err = jnp.max(jnp.abs(jax.nn.gelu(v, approximate=False)
                          - jax.nn.gelu(v, approximate=True)))
    assert float(err) < 5e-4
