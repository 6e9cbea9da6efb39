"""Pallas kernels == plain-XLA reference math (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colddiff.ops.pallas import (
    group_norm_swish,
    group_norm_swish_reference,
    linear_attention,
    linear_attention_reference,
)


def test_linear_attention_kernel_matches_reference(rng):
    g, n, d = 3, 64, 32
    q = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    want = linear_attention_reference(q, k, v, 0.17)
    got = linear_attention(q, k, v, 0.17, force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_linear_attention_grads_match(rng):
    g, n, d = 2, 32, 16
    q = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((g, n, d)), dtype=jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(linear_attention_reference(q, k, v, 0.25) ** 2)

    def loss_kernel(q, k, v):
        return jnp.sum(linear_attention(q, k, v, 0.25, force="interpret") ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("swish", [True, False])
def test_group_norm_swish_kernel_matches_reference(rng, swish):
    b, h, w, c = 2, 8, 8, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    gamma = jnp.asarray(rng.random(c) + 0.5, dtype=jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, dtype=jnp.float32)
    want = group_norm_swish_reference(x, gamma, beta, 32, swish=swish)
    got = group_norm_swish(x, gamma, beta, 32, swish=swish, force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_group_norm_swish_grads_match(rng):
    b, h, w, c = 1, 4, 4, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    gamma = jnp.asarray(rng.random(c) + 0.5, dtype=jnp.float32)
    beta = jnp.zeros((c,))

    def loss_ref(x, gamma):
        return jnp.sum(group_norm_swish_reference(x, gamma, beta, 32) ** 2)

    def loss_kernel(x, gamma):
        return jnp.sum(group_norm_swish(x, gamma, beta, 32, force="interpret") ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, gamma)
    gk = jax.grad(loss_kernel, argnums=(0, 1))(x, gamma)
    for a, b2 in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=2e-4, atol=2e-4)


def test_convnext_front_kernel_matches_reference(rng):
    from colddiff.ops.pallas.convnext_front import (
        convnext_front,
        convnext_front_reference,
    )

    b, h, w, c = 2, 16, 16, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=jnp.float32)
    wk = jnp.asarray(rng.standard_normal((7, 7, c)) * 0.05, dtype=jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, dtype=jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, c)), dtype=jnp.float32)
    gamma = jnp.asarray(rng.random(c) + 0.5, dtype=jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, dtype=jnp.float32)
    for norm in (True, False):
        for cnd in (cond, None):
            want = convnext_front_reference(x, wk, bias, cnd, gamma, beta,
                                            norm=norm)
            got = convnext_front(x, wk, bias, cnd, gamma, beta, norm=norm,
                                 force="interpret")
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=3e-5, atol=3e-5)


def test_convnext_front_tiled_and_grads(rng):
    from colddiff.ops.pallas.convnext_front import (
        convnext_front,
        convnext_front_reference,
    )

    b, h, w, c = 1, 64, 64, 8  # h > 32 -> exercises the 32-row tiling
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
