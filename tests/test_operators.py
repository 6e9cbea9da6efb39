"""Operator parity tests: degrade() must equal the reference's sequential chains."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from colddiff.operators import Decolorization, GaussianBlur, GaussianNoise
from colddiff.schedules import (
    blur_routine_params,
    cosine_alphas_cumprod,
    decolor_routine_thetas,
    gaussian_kernel_2d,
)
from tests.test_linop import torch_depthwise_blur


def sequential_blur_reference(x_nchw, routine, T, ks, std):
    """Reference q_sample-style chain: apply kernels 0..n-1 sequentially."""
    params = blur_routine_params(routine, T, ks, std)
    states = [x_nchw]
    x = x_nchw
    for size, sigma, mode in params:
        k2d = gaussian_kernel_2d((size, size), (sigma, sigma)).astype(np.float64)
        x = torch_depthwise_blur(x, k2d, mode)
        states.append(x)
    return states  # states[n] = n applications


@pytest.mark.parametrize(
    "routine,ks,std",
    [
        ("Constant", 11, 7.0),           # MNIST config (README.md:72)
        ("Exponential_reflect", 15, 0.01),  # CelebA-128 config (README.md:74)
        ("Special_6_routine", 11, 0.01),
        ("Incremental", 3, 0.1),
    ],
)
def test_blur_matches_sequential_reference(rng, routine, ks, std):
    T, n = 6, 28
    x = rng.standard_normal((4, n, n, 3)).astype(np.float32)
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)), dtype=torch.float64)
    states = sequential_blur_reference(xt, routine, T, ks, std)

    op = GaussianBlur.create(
        image_size=n, timesteps=T, blur_routine=routine, kernel_size=ks, kernel_std=std
    )
    t = jnp.asarray([0, 2, 5, 6])
    got = np.asarray(op.degrade(jnp.asarray(x), t))
    for b, steps in enumerate([0, 2, 5, 6]):
        want = np.transpose(states[steps][b].numpy(), (1, 2, 0))
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_blur_individual_incremental_sampling_path(rng):
    T, n = 4, 16
    x = rng.standard_normal((2, n, n, 3)).astype(np.float32)
    op = GaussianBlur.create(
        image_size=n, timesteps=T, blur_routine="Individual_Incremental",
        kernel_size=3, kernel_std=0.1,
    )
    # sampling path applies the single level-(n-1) kernel once
    params = blur_routine_params("Individual_Incremental", T, 3, 0.1)
    size, sigma, mode = params[2]
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)), dtype=torch.float64)
    want = torch_depthwise_blur(
        xt, gaussian_kernel_2d((size, size), (sigma, sigma)).astype(np.float64), mode
    ).numpy()
    got = np.asarray(op.degrade_sampling(jnp.asarray(x), jnp.asarray([3, 3])))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=2e-4, atol=2e-4)


def test_blur_discrete_collapses_final_level(rng):
    T, n = 3, 8
    x = rng.standard_normal((2, n, n, 3)).astype(np.float32)
    op = GaussianBlur.create(
        image_size=n, timesteps=T, blur_routine="Constant", kernel_size=3,
        kernel_std=2.0, discrete=True,
    )
    y = np.asarray(op.degrade(jnp.asarray(x), jnp.asarray([T, T - 1])))
    # final level: constant per channel, equal to the blurred image's mean
    assert np.allclose(y[0].std(axis=(0, 1)), 0.0, atol=1e-5)
    base = GaussianBlur.create(
        image_size=n, timesteps=T, blur_routine="Constant", kernel_size=3, kernel_std=2.0
    )
    full = np.asarray(base.degrade(jnp.asarray(x), jnp.asarray([T, T])))
    np.testing.assert_allclose(
        y[0, 0, 0], full[0].mean(axis=(0, 1)), rtol=1e-4, atol=1e-5
    )
    # non-final levels untouched
    np.testing.assert_allclose(
        y[1], np.asarray(base.degrade(jnp.asarray(x), jnp.asarray([T - 1, T - 1])))[1],
        atol=1e-6,
    )


def test_noise_interpolation_and_x_end_recovery(rng):
    T = 10
    op = GaussianNoise.create(timesteps=T)
    ac = cosine_alphas_cumprod(T)
    x0 = rng.standard_normal((3, 8, 8, 1)).astype(np.float32)
    x2 = rng.standard_normal((3, 8, 8, 1)).astype(np.float32)
    n = jnp.asarray([0, 4, 10])
    y = np.asarray(op.degrade(jnp.asarray(x0), n, x_end=jnp.asarray(x2)))
    np.testing.assert_allclose(y[0], x0[0], atol=1e-6)
    for b, idx in [(1, 3), (2, 9)]:
        want = np.sqrt(ac[idx]) * x0[b] + np.sqrt(1 - ac[idx]) * x2[b]
        np.testing.assert_allclose(y[b], want, rtol=1e-5, atol=1e-5)
    # ddim endpoint estimate inverts the interpolation
    est = np.asarray(op.x_end_from_xt(jnp.asarray(x0), jnp.asarray(y), n))
    np.testing.assert_allclose(est[1], x2[1], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("routine,total_remove", [("Constant", False), ("Linear", True)])
def test_decolor_matches_sequential_reference(rng, routine, total_remove):
    T, c = 5, 3
    thetas = decolor_routine_thetas(routine, T, 0.9, total_remove)
    x = rng.standard_normal((2, 4, 4, c)).astype(np.float32)
    op = Decolorization.create(
        timesteps=T, channels=c, decolor_routine=routine,
        decolor_ema_factor=0.9, decolor_total_remove=total_remove,
    )
    got = np.asarray(op.degrade(jnp.asarray(x), jnp.asarray([2, T])))
    eye, mean = np.eye(c), np.ones((c, c)) / c
    for b, steps in [(0, 2), (1, T)]:
        want = x[b]
        for th in thetas[:steps]:
            want = want @ (th * eye + (1 - th) * mean).T
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)
    if total_remove:
        # fully decolorized: channels equal
        np.testing.assert_allclose(got[1, ..., 0], got[1, ..., 1], atol=1e-5)


def test_decolor_linear_routine_is_linear_saturation_decay():
    T = 20
    thetas = decolor_routine_thetas("Linear", T, 0.9, False)
    cum = np.cumprod(thetas)
    want = 1.0 - np.arange(1, T + 1) / T
    np.testing.assert_allclose(cum, want, atol=1e-10)
