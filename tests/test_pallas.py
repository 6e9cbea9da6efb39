"""Pallas kernels == plain-XLA reference math (interpreter mode on CPU).

Round 2 deleted the linear-attention and GroupNorm+swish kernels (measured
slower than XLA, see colddiff/ops/pallas/__init__.py); their plain-XLA math
moved to colddiff.models.layers and is pinned here against naive references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colddiff.ops.pallas.convnext_front import (
    _pallas_forward_packed,
    convnext_front,
    convnext_front_reference,
    pallas_supported,
)


def _front_args(rng, b, c):
    wk = jnp.asarray(rng.standard_normal((7, 7, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    gamma = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return wk, bias, cond, gamma, beta


def test_convnext_front_kernel_matches_reference(rng):
    b, h, w, c = 2, 16, 16, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    wk, bias, cond, gamma, beta = _front_args(rng, b, c)
    for norm in (True, False):
        for cnd in (cond, None):
            want = convnext_front_reference(x, wk, bias, cnd, gamma, beta,
                                            norm=norm)
            got = convnext_front(x, wk, bias, cnd, gamma, beta, norm=norm,
                                 force="interpret")
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("shp", [(2, 16, 16, 8), (1, 8, 8, 64),
                                 (1, 128, 16, 8), (2, 16, 8, 32)])
def test_convnext_front_packed_shapes(rng, shp):
    """Lane-packed layout across C=8..64 (masked-norm path) and H-tiling."""
    b, h, w, c = shp
    x = jnp.asarray(rng.standard_normal(shp), dtype=jnp.float32)
    wk, bias, cond, gamma, beta = _front_args(rng, b, c)
    for norm in (True, False):
        want = convnext_front_reference(x, wk, bias, cond, gamma, beta,
                                        norm=norm)
        got = _pallas_forward_packed(x, wk, bias, cond, gamma, beta,
                                     norm, 1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)


def test_convnext_front_packed_bf16_promotes_like_flax(rng):
    """bf16 activations + fp32 params -> fp32 output, fp32-accurate taps."""
    b, h, w, c = 1, 8, 8, 64
    x32 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    x = x32.astype(jnp.bfloat16)
    wk, bias, cond, gamma, beta = _front_args(rng, b, c)
    got = _pallas_forward_packed(x, wk, bias, cond, gamma, beta,
                                 True, 1e-5, interpret=True)
    assert got.dtype == jnp.float32
    want = convnext_front_reference(x32.astype(jnp.bfloat16).astype(
        jnp.float32), wk, bias, cond, gamma, beta, norm=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pallas_supported_gating():
    assert pallas_supported(jnp.zeros((2, 128, 128, 64)))
    assert not pallas_supported(jnp.zeros((2, 128, 128, 3)))    # stem
    assert not pallas_supported(jnp.zeros((2, 64, 64, 128)))    # XLA wins
    assert not pallas_supported(jnp.zeros((2, 64, 64, 96)))     # 96 !| 128


def test_convnext_front_grads(rng):
    b, h, w, c = 1, 64, 16, 8  # h > 32 -> exercises the static H-tiling
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    wk = jnp.asarray(rng.standard_normal((7, 7, c)) * 0.05, dtype=jnp.float32)
    bias = jnp.zeros((c,))
    gamma = jnp.ones((c,))
    beta = jnp.zeros((c,))
    want = convnext_front_reference(x, wk, bias, None, gamma, beta)
    got = convnext_front(x, wk, bias, None, gamma, beta, force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5,
                               atol=3e-5)

    def loss_k(x, wk):
        return jnp.sum(
            convnext_front(x, wk, bias, None, gamma, beta, force="interpret") ** 2
        )

    def loss_r(x, wk):
        return jnp.sum(
            convnext_front_reference(x, wk, bias, None, gamma, beta) ** 2
        )

    gk = jax.grad(loss_k, argnums=(0, 1))(x, wk)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, wk)
    for a, b2 in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("c", [8, 64])
def test_convnext_front_partitions_over_batch_mesh(rng, c):
    """The kernel's custom_partitioning rule: under a batch-sharded jit each
    device runs its local shard -- no all-gather of the activations around
    the Mosaic call (interpret mode routes through the same wrapper, so the
    rule itself is what the 8-device mesh exercises here).  c=64 is the
    flagship level-0 width the compiled kernel actually serves (round-4
    verdict: partition rules were only exercised at toy widths)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    b, h, w = 8, 16, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    wk, bias, cond, gamma, beta = _front_args(rng, b, c)
    want = convnext_front_reference(x, wk, bias, cond, gamma, beta)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    conds = jax.device_put(cond, NamedSharding(mesh, P("data")))

    f = jax.jit(lambda x, cnd: convnext_front(x, wk, bias, cnd, gamma, beta,
                                              force="interpret"))
    out = f(xs, conds)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=3e-5,
                               atol=3e-5)
    hlo = f.lower(xs, conds).compile().as_text()
    assert "all-gather" not in hlo, "kernel batch shards must stay local"

    # gradients flow across the custom_partitioning + custom_vjp boundary
    # with the batch still sharded
    g = jax.jit(jax.grad(lambda x, cnd: jnp.sum(
        convnext_front(x, wk, bias, cnd, gamma, beta, force="interpret") ** 2
    )))(xs, conds)
    gr = jax.grad(lambda x, cnd: jnp.sum(
        convnext_front_reference(x, wk, bias, cnd, gamma, beta) ** 2
    ))(x, cond)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("c", [8, 64])
def test_convnext_front_partitions_over_space_mesh(rng, c):
    """Spatially-sharded rows (image_sharding's P('data', 'space')) run
    through the partition rule's halo exchange: collective-permute of the
    3 boundary rows, NO all-gather of the row axis (round-3 review item 9:
    pure-SP sampling must need no env var).  c=64 = the flagship width."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    b, h, w = 2, 16, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    wk, bias, cond, gamma, beta = _front_args(rng, b, c)
    want = convnext_front_reference(x, wk, bias, cond, gamma, beta)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "space"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    conds = jax.device_put(cond, NamedSharding(mesh, P("data")))

    f = jax.jit(lambda x, cnd: convnext_front(x, wk, bias, cnd, gamma, beta,
                                              force="interpret"))
    out = f(xs, conds)
    assert out.sharding.spec == P("data", "space"), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=3e-5,
                               atol=3e-5)
    hlo = f.lower(xs, conds).compile().as_text()
    assert "all-gather" not in hlo, "row shards must stay local (halo only)"
    assert "collective-permute" in hlo, "expected the 3-row halo exchange"

    # gradients under the same spatial sharding (bwd is plain XLA; shardy
    # partitions it with its own halos)
    g = jax.jit(jax.grad(lambda x, cnd: jnp.sum(
        convnext_front(x, wk, bias, cnd, gamma, beta, force="interpret") ** 2
    )))(xs, conds)
    gr = jax.grad(lambda x, cnd: jnp.sum(
        convnext_front_reference(x, wk, bias, cnd, gamma, beta) ** 2
    ))(x, cond)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)


# ---- plain-XLA layer math pinned against naive references ----


def test_linear_attention_math(rng):
    from colddiff.models.layers import linear_attention

    g, n, d = 3, 64, 32
    q = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    got = linear_attention(q, k, v, 0.17)
    # naive: explicit softmax over tokens then double contraction
    ks = np.asarray(jax.nn.softmax(k, axis=1))
    ctx = np.einsum("gnd,gne->gde", ks, np.asarray(v))
    want = np.einsum("gde,gnd->gne", ctx, np.asarray(q) * 0.17)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_linear_attention_blockdiag_matches_per_head(rng):
    """The no-transpose block-diagonal form == the per-head reference."""
    from colddiff.models.layers import linear_attention, linear_attention_blockdiag

    b, n, heads, d = 2, 48, 4, 8
    c = heads * d
    q = jnp.asarray(rng.standard_normal((b, n, c)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, c)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), dtype=jnp.float32)
    got = linear_attention_blockdiag(q, k, v, heads, 0.31)
    # per-head reference on head-major [b*heads, n, d] slices
    split = lambda a: a.reshape(b, n, heads, d).transpose(0, 2, 1, 3).reshape(
        b * heads, n, d)
    want = linear_attention(split(q), split(k), split(v), 0.31)
    want = np.asarray(want).reshape(b, heads, n, d).transpose(0, 2, 1, 3).reshape(
        b, n, c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("swish", [True, False])
def test_group_norm_swish_math(rng, swish):
    from colddiff.models.layers import group_norm_swish

    b, h, w, c, g = 2, 8, 8, 64, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    gamma = jnp.asarray(rng.random(c) + 0.5, dtype=jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, dtype=jnp.float32)
    got = group_norm_swish(x, gamma, beta, g, swish=swish)
    # naive per-(batch, group) moments
    xn = np.asarray(x).reshape(b, h * w, g, c // g)
    mean = xn.mean(axis=(1, 3), keepdims=True)
    var = xn.var(axis=(1, 3), keepdims=True)
    want = ((xn - mean) / np.sqrt(var + 1e-6)).reshape(b, h, w, c)
    want = want * np.asarray(gamma) + np.asarray(beta)
    if swish:
        want = want / (1 + np.exp(-want))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
