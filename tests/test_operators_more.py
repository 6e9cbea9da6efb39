"""Parity tests for fade / resolution / snow / fade-generation operators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from colddiff.operators import Fade, FadeGeneration, FadeNaive, Resolution, Snow
from colddiff.operators.fade import fade_mask
from colddiff.operators.fade_naive import spiral_order


def test_fade_matches_sequential_mask_product(rng):
    T, s = 5, 12
    op = Fade.create(image_size=s, timesteps=T, fade_routine="Incremental",
                     kernel_std=0.2, initial_mask=3)
    x = rng.standard_normal((2, s, s, 3)).astype(np.float32)
    got = np.asarray(op.degrade(jnp.asarray(x), jnp.asarray([2, 5])))
    masks = [fade_mask(s, 0.2 * (i + 3)) for i in range(T)]
    for b, steps in [(0, 2), (1, 5)]:
        m = np.ones((s, s))
        for i in range(steps):
            m = m * masks[i]
        np.testing.assert_allclose(got[b], x[b] * m[..., None], rtol=1e-5, atol=1e-5)


def test_fade_random_incremental_crop_semantics(rng):
    T, s = 3, 8
    op = Fade.create(image_size=s, timesteps=T, fade_routine="Random_Incremental",
                     kernel_std=0.1, initial_mask=2)
    x = jnp.asarray(rng.standard_normal((4, s, s, 3)), dtype=np.float32)
    n = jnp.asarray([1, 2, 3, 3])
    # same rng -> same offsets -> deterministic
    y1 = op.degrade(x, n, rng=jax.random.key(7))
    y2 = op.degrade(x, n, rng=jax.random.key(7))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    # different rng -> different crops (almost surely)
    y3 = op.degrade(x, n, rng=jax.random.key(8))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    # baked offsets: stable without rng (sampling-run semantics)
    opb = op.randomize(jax.random.key(3), 4)
    z1 = opb.degrade(x, n)
    z2 = opb.degrade(x, n)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))
    # crop of cumulative product == product of identically-cropped masks
    off = np.asarray(opb.offsets)
    cum = np.asarray(opb.cum_masks)
    b = 1
    m = cum[int(n[b]), off[b, 0] : off[b, 0] + s, off[b, 1] : off[b, 1] + s]
    np.testing.assert_allclose(
        np.asarray(z1[b]), np.asarray(x[b]) * m[..., None], rtol=1e-5, atol=1e-5
    )


def test_fade_naive_spiral_masks(rng):
    T, s = 4, 8
    sp = spiral_order(s)
    op = FadeNaive.create(image_size=s, timesteps=T, fade_routine="Spiral")
    x = jnp.asarray(rng.standard_normal((2, s, s, 3)), dtype=np.float32)
    y = np.asarray(op.degrade(x, jnp.asarray([2, 4])))
    for b, steps in [(0, 2), (1, 4)]:
        mask = (sp > steps - 1).astype(np.float32)
        np.testing.assert_allclose(y[b], np.asarray(x[b]) * mask[..., None], atol=1e-6)


def test_fade_naive_spiral2_interpolates_to_constant(rng):
    T, s = 3, 8
    op = FadeNaive.create(image_size=s, timesteps=T, fade_routine="Spiral_2")
    assert op.requires_x_end
    x = jnp.asarray(rng.standard_normal((2, s, s, 3)), dtype=np.float32)
    const = jnp.ones((2, s, s, 3)) * 0.25
    y = np.asarray(op.degrade(x, jnp.asarray([T, T]), x_end=const))
    sp = spiral_order(s)
    mask = (sp > T - 1).astype(np.float32)[..., None]
    want = np.asarray(x) * mask + 0.25 * (1 - mask)
    np.testing.assert_allclose(y, want, atol=1e-6)


@pytest.mark.parametrize("routine", ["Incremental", "Incremental_factor_2",
                                     "Incremental_bilinear_with_blur"])
def test_resolution_matches_torch_chain(rng, routine):
    T, s = 3, 16
    op = Resolution.create(image_size=s, timesteps=T, resolution_routine=routine)
    x = rng.standard_normal((2, s, s, 3)).astype(np.float32)
    got = np.asarray(op.degrade(jnp.asarray(x), jnp.asarray([1, 3])))

    from colddiff.schedules import resolution_routine_sizes, gaussian_kernel_2d
    from tests.test_linop import torch_depthwise_blur

    steps = resolution_routine_sizes(routine, T, s)
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)), dtype=torch.float64)
    states = [xt]
    cur = xt
    blur_k = gaussian_kernel_2d((3, 3), (0.5, 0.5)).astype(np.float64)
    for target, mode, do_blur in steps:
        if do_blur:
            cur = torch_depthwise_blur(cur, blur_k, "reflect")
        cur = F.interpolate(cur, size=(target, target), mode=mode, antialias=False)
        cur = F.interpolate(cur, size=(s, s), mode="nearest-exact")
        if do_blur:
            cur = torch_depthwise_blur(cur, blur_k, "reflect")
        states.append(cur)
    for b, n in [(0, 1), (1, 3)]:
        want = np.transpose(states[n][b].numpy(), (1, 2, 0))
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_fade_generation_alphas_and_reverse(rng):
    T, s = 4, 10
    op = FadeGeneration.create(image_size=s, timesteps=T, kernel_std=0.2, initial_mask=2)
    rev = FadeGeneration.create(image_size=s, timesteps=T, kernel_std=0.2,
                                initial_mask=2, reverse=True)
    # forward alphas: cumulative products, monotone decreasing
    a = np.asarray(op.alphas)
    assert a.shape == (T, s, s)
    assert np.all(a[1:] <= a[:-1] + 1e-7)
    # reverse: alphas are the COMPLEMENT of the reversed pre-products
    # (get_reverse_kernels_with_schedule + `alphas = 1 - one_minus_alphas`,
    # defading...pytorch.py:332-345,371-373): the last level is pure x_end
    ar = np.asarray(rev.alphas)
    np.testing.assert_allclose(ar[-1], np.zeros((s, s)), atol=0)
    kers = np.ones((s, s))
    pre = []
    for i in range(T):
        pre.append(kers.copy())
        kers = kers * np.asarray(fade_mask(s, 0.2 * (i + 2)))
    np.testing.assert_allclose(ar, 1.0 - np.stack(pre[::-1]),
                               rtol=1e-6, atol=1e-6)

    x = jnp.asarray(rng.standard_normal((2, s, s, 3)), dtype=np.float32)
    e = op.sample_x_end(jax.random.key(0), x)
    en = np.asarray(e)
    assert en.min() >= -0.5 and en.max() <= 0.5
    assert np.allclose(en.std(axis=(1, 2)), 0.0, atol=1e-6)  # constant per sample
    y = np.asarray(op.degrade(x, jnp.asarray([2, 4]), x_end=e))
    want = a[1] * np.asarray(x[0]).transpose(2, 0, 1)  # sanity on one channel
    np.testing.assert_allclose(
        y[0, ..., 0], a[1] * np.asarray(x)[0, ..., 0] + (1 - a[1]) * en[0, ..., 0],
        rtol=1e-5, atol=1e-5,
    )


def test_snow_setup_and_degrade(rng):
    T, s = 6, 16
    op = Snow.create(image_size=s, timesteps=T, snow_level=3)
    assert op.snow.shape == (T, 1, s, s)
    # deterministic under the fixed seed
    op2 = Snow.create(image_size=s, timesteps=T, snow_level=3)
    np.testing.assert_allclose(np.asarray(op.snow), np.asarray(op2.snow))

    x = jnp.asarray(rng.standard_normal((2, s, s, 3)) * 0.3, dtype=np.float32)
    y = np.asarray(op.degrade(x, jnp.asarray([0, T])))
    np.testing.assert_allclose(y[0], np.asarray(x[0]), atol=1e-6)  # n=0 identity
    assert y[1].min() >= -1.0 - 1e-5 and y[1].max() <= 1.0 + 1e-5
    # snow quantity grows as threshold drops: later levels have more snow mass
    early = float(jnp.sum(op.snow[0]))
    late = float(jnp.sum(op.snow[-1]))
    assert late > early

    # fix_brightness skips the gray mixing
    opf = Snow.create(image_size=s, timesteps=T, snow_level=3, fix_brightness=True)
    yf = np.asarray(opf.degrade(x, jnp.asarray([T, T])))
    assert not np.allclose(yf, y)


def test_snow_random_reset_changes_fields():
    op = Snow.create(image_size=8, timesteps=3, snow_level=1, random_snow=True, seed=1)
    op2 = op.reset(jax.random.key(5), batch_size=4)
    assert not np.allclose(np.asarray(op.snow), np.asarray(op2.snow))
    fixed = Snow.create(image_size=8, timesteps=3, snow_level=1)
    assert fixed.reset(jax.random.key(5), 4) is fixed


def test_snow_single_snow_per_sample_layers():
    B = 4
    op = Snow.create(image_size=8, timesteps=3, snow_level=2, single_snow=True,
                     batch_size=B)
    assert op.snow.shape == (3, B, 8, 8)
    layers = np.asarray(op.snow[2])
    assert not np.allclose(layers[0], layers[1])
