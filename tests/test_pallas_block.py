"""Fused ConvNeXt block kernel == plain-XLA reference (interpret mode).

The kernel fuses the whole residual branch -- front + conv3x3 + GELU +
conv3x3 + residual (deblurring_diffusion_pytorch.py:135-165) -- in one VMEM
round-trip; see colddiff/ops/pallas/convnext_block.py.  The subtle parity
points pinned here are the zero-padding semantics: the reference zero-pads
conv1's and conv2's inputs at the image border, so the kernel must zero its
computed halo ring (front values, and GELU(b1) != 0) at out-of-image
positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colddiff.ops.pallas.convnext_block import (
    block_fusion_supported,
    convnext_block,
    convnext_block_reference,
    convnext_block_tail,
)


def _block_args(rng, b, c=64, hid=128, dtype=jnp.float32):
    def arr(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    return dict(
        dw_w=arr(7, 7, c), dw_b=arr(c), cond=arr(b, c),
        gamma=jnp.asarray(1 + 0.1 * rng.standard_normal(c), dtype),
        beta=arr(c), w1=arr(3, 3, c, hid, scale=0.05), b1=arr(hid),
        w2=arr(3, 3, hid, c, scale=0.05), b2=arr(c),
    )


def test_block_kernel_matches_reference(rng):
    b, h, w = 2, 16, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)
    a = _block_args(rng, b)
    for norm in (True, False):
        for cond in (a["cond"], None):
            want = convnext_block_reference(
                x, a["dw_w"], a["dw_b"], cond, a["gamma"], a["beta"],
                a["w1"], a["b1"], a["w2"], a["b2"], norm=norm)
            got = convnext_block(
                x, a["dw_w"], a["dw_b"], cond, a["gamma"], a["beta"],
                a["w1"], a["b1"], a["w2"], a["b2"], norm=norm,
                force="interpret")
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("shp", [(1, 8, 8), (1, 48, 16), (2, 40, 24)])
def test_block_kernel_slab_tilings(rng, shp):
    """H not a multiple of 32 exercises the static slab loop and the
    first/last-slab row masking."""
    b, h, w = shp
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)
    a = _block_args(rng, b)
    want = convnext_block_reference(
        x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"])
    got = convnext_block(
        x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"], force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_block_kernel_bf16(rng):
    """bf16 end to end: fp32 taps for the front, fp32 matmul accumulators;
    tolerance is bf16 output rounding, not drift."""
    b, h, w = 1, 16, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.bfloat16)
    a = _block_args(rng, b, dtype=jnp.bfloat16)
    want = convnext_block_reference(
        x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"])
    got = convnext_block(
        x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"], force="interpret")
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.abs(want.astype(jnp.float32)).max())
    err = float(jnp.abs(got.astype(jnp.float32)
                        - want.astype(jnp.float32)).max())
    assert err <= 0.02 * scale, (err, scale)


def test_block_fusion_gating():
    ok = jnp.zeros((2, 128, 128, 64), jnp.bfloat16)
    assert block_fusion_supported(ok, 128, 64)
    assert not block_fusion_supported(ok.astype(jnp.float32), 128, 64)
    assert not block_fusion_supported(ok, 256, 64)   # hidden != 128
    assert not block_fusion_supported(ok, 128, 128)  # out != 64
    assert not block_fusion_supported(
        jnp.zeros((2, 128, 128, 128), jnp.bfloat16), 128, 64)  # C != 64
    assert not block_fusion_supported(
        jnp.zeros((2, 128, 127, 64), jnp.bfloat16), 128, 64)   # odd W
    assert not block_fusion_supported(
        jnp.zeros((32, 128, 128, 64), jnp.bfloat16), 128, 64)  # B>16: XLA wins


def test_block_kernel_grads(rng):
    b, h, w = 1, 16, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)
    a = _block_args(rng, b)

    def loss(fn):
        def f(x, w1, w2):
            return jnp.sum(fn(
                x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
                w1, a["b1"], w2, a["b2"]) ** 2)
        return f

    import functools
    gk = jax.grad(loss(functools.partial(convnext_block, force="interpret")),
                  argnums=(0, 1, 2))(x, a["w1"], a["w2"])
    gr = jax.grad(loss(convnext_block_reference),
                  argnums=(0, 1, 2))(x, a["w1"], a["w2"])
    for got, want in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_block_grad_path_skips_kernel(rng):
    """Differentiated calls must take the front+XLA VJP forward, never the
    Pallas kernel (training measured slower with it; convnext_block.py
    _block_fwd).  Pinned by running grad of force='pallas' on CPU, where
    the kernel itself cannot lower -- a regression to kernel-in-the-VJP
    crashes this test."""
    b, h, w = 1, 16, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)
    a = _block_args(rng, b)

    def loss(fn):
        def f(x, w1, w2):
            return jnp.sum(fn(
                x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
                w1, a["b1"], w2, a["b2"]) ** 2)
        return f

    import functools
    gk = jax.grad(loss(functools.partial(convnext_block, force="pallas")),
                  argnums=(0, 1, 2))(x, a["w1"], a["w2"])
    gr = jax.grad(loss(convnext_block_reference),
                  argnums=(0, 1, 2))(x, a["w1"], a["w2"])
    for got, want in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_block_tail_matches_flax_conv(rng):
    """convnext_block_tail (the unfused fallback) == nn.Conv chain."""
    from flax import linen as nn

    from colddiff.models.layers import gelu

    b, h, w, c, hid = 1, 8, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, v):
            v = nn.Conv(hid, (3, 3), padding=1, name="c1")(v)
            v = gelu(v)
            return nn.Conv(c, (3, 3), padding=1, name="c2")(v)

    m = Tail()
    params = m.init(jax.random.key(0), x)
    want = m.apply(params, x)
    p = params["params"]
    got = convnext_block_tail(x, p["c1"]["kernel"], p["c1"]["bias"],
                              p["c2"]["kernel"], p["c2"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_block_partitions_over_batch_mesh(rng):
    """custom_partitioning: batch-sharded jit runs local shards with no
    all-gather around the kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    b, h, w = 8, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)
    a = _block_args(rng, b)
    want = convnext_block_reference(
        x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"])

    mesh = Mesh(np.array(jax.devices()), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    conds = jax.device_put(a["cond"], NamedSharding(mesh, P("data")))

    f = jax.jit(lambda x, cnd: convnext_block(
        x, a["dw_w"], a["dw_b"], cnd, a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"], force="interpret"))
    out = f(xs, conds)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    hlo = f.lower(xs, conds).compile().as_text()
    assert "all-gather" not in hlo, "kernel batch shards must stay local"


def test_block_partitions_over_space_mesh(rng):
    """Spatially-sharded rows halo-exchange 5 boundary rows around the XLA
    reference on the local block (no all-gather, like the front's rule)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    b, h, w = 2, 32, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)
    a = _block_args(rng, b)
    want = convnext_block_reference(
        x, a["dw_w"], a["dw_b"], a["cond"], a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"])

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "space"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    conds = jax.device_put(a["cond"], NamedSharding(mesh, P("data")))

    f = jax.jit(lambda x, cnd: convnext_block(
        x, a["dw_w"], a["dw_b"], cnd, a["gamma"], a["beta"],
        a["w1"], a["b1"], a["w2"], a["b2"], force="interpret"))
    out = f(xs, conds)
    assert out.sharding.spec == P("data", "space"), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    hlo = f.lower(xs, conds).compile().as_text()
    assert "all-gather" not in hlo, "row shards must stay local (halo only)"
    assert "collective-permute" in hlo, "expected the 5-row halo exchange"
