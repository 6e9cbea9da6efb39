"""Diffusion-core and sampler property tests.

Key invariants (SURVEY.md section 4 test plan):
  - oracle model (returns true x0) => both algorithms reconstruct exactly
  - scan samplers == a straight-line reference-style Python loop
  - Alg-2 telescoping identity x_{t-1} - x_t == D(x0,t-1) - D(x0,t)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colddiff.diffusion import ColdDiffusion
from colddiff.operators import Decolorization, GaussianBlur, GaussianNoise
from colddiff.sampling import all_sample, prepare_start, sample


def make_blur_diffusion(T=6, n=16, routine="Constant", **kw):
    op = GaussianBlur.create(
        image_size=n, timesteps=T, blur_routine=routine, kernel_size=5, kernel_std=1.5
    )
    return ColdDiffusion(op=op, image_size=n, channels=3, **kw)


def test_q_sample_levels_and_clean_passthrough(rng):
    d = make_blur_diffusion()
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 3)), dtype=jnp.float32)
    t = jnp.asarray([-1, 0, 3])
    y = d.q_sample(x, t)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(x[0]), atol=1e-6)
    one = np.asarray(d.op.degrade(x, jnp.asarray([1, 1, 1])))
    np.testing.assert_allclose(np.asarray(y[1]), one[1], atol=1e-6)


def test_p_losses_zero_for_oracle(rng):
    d = make_blur_diffusion()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float32)
    t = jnp.asarray([2, 5])
    oracle = lambda xt, tt: x
    loss = d.p_losses(oracle, x, t, rng=jax.random.key(0))
    assert float(loss) < 1e-6


@pytest.mark.parametrize("routine", ["default", "x0_step_down"])
def test_oracle_reconstruction_family_a(rng, routine):
    d = make_blur_diffusion(sampling_routine=routine)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float32)
    start = prepare_start(d, x)
    oracle = lambda xt, tt: x
    res = sample(d, oracle, start)
    np.testing.assert_allclose(np.asarray(res.img), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.direct_recons), np.asarray(x), atol=1e-6)


def test_oracle_reconstruction_family_b(rng):
    T = 8
    op = GaussianNoise.create(timesteps=T)
    d = ColdDiffusion(op=op, image_size=8, sampling_routine="x0_step_down")
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), dtype=jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), dtype=jnp.float32)
    start = d.op.degrade(x, jnp.full((2,), T), x_end=noise)
    res = sample(d, lambda xt, tt: x, start, x_end=noise)
    np.testing.assert_allclose(np.asarray(res.img), np.asarray(x), atol=1e-4)


def naive_reference_loop(d, denoise_fn, img, steps, x_end=None):
    """Straight port of the reference while-loop (deblurring...py:418-453 /
    denoising...py:351-371), for equivalence testing only."""
    b = img.shape[0]
    direct = None
    for t in range(steps, 0, -1):
        step = jnp.full((b,), t - 1, dtype=jnp.int32)
        x0_hat = denoise_fn(img, step)
        if direct is None:
            direct = x0_hat
        n_t = jnp.full((b,), t, dtype=jnp.int32)
        if d.op.requires_x_end:
            x2 = x_end if x_end is not None else d.op.x_end_from_xt(x0_hat, img, n_t)
            xt_bar = d.op.degrade(x0_hat, n_t, x_end=x2)
            xtm1_bar = d.op.degrade(x0_hat, n_t - 1, x_end=x2)
            img = img - xt_bar + xtm1_bar
        elif d.sampling_routine == "default":
            img = d.op.degrade_sampling(x0_hat, n_t - 1, og=x0_hat)
        else:
            xt_bar = d.op.degrade(x0_hat, n_t, og=x0_hat)
            xtm1_bar = d.op.degrade(x0_hat, n_t - 1, og=x0_hat)
            img = img - xt_bar + xtm1_bar
    return direct, img


class FakeModel:
    """Deterministic stand-in 'UNet': a fixed random linear map + t bias."""

    def __init__(self, n, c, seed=0):
        k = jax.random.key(seed)
        self.w = 0.1 * jax.random.normal(k, (c, c))

    def __call__(self, x, t):
        return jnp.einsum("bhwc,cd->bhwd", x, self.w) + 0.01 * t.reshape(-1, 1, 1, 1)


@pytest.mark.parametrize("routine", ["default", "x0_step_down"])
def test_scan_matches_naive_loop_family_a(rng, routine):
    d = make_blur_diffusion(T=5, sampling_routine=routine)
    f = FakeModel(16, 3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float32)
    start = prepare_start(d, x)
    res = sample(d, f, start)
    want_direct, want_img = naive_reference_loop(d, f, start, 5)
    np.testing.assert_allclose(np.asarray(res.img), np.asarray(want_img), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.direct_recons), np.asarray(want_direct), atol=1e-5
    )


@pytest.mark.parametrize("fixed_end", [True, False])
def test_scan_matches_naive_loop_family_b(rng, fixed_end):
    T = 7
    op = GaussianNoise.create(timesteps=T)
    routine = "x0_step_down" if fixed_end else "ddim"
    d = ColdDiffusion(op=op, image_size=8, sampling_routine=routine)
    f = FakeModel(8, 3, seed=1)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), dtype=jnp.float32)
    x_end = noise if fixed_end else None
    res = sample(d, f, noise, x_end=x_end)
    want_direct, want_img = naive_reference_loop(d, f, noise, T, x_end=x_end)
    np.testing.assert_allclose(np.asarray(res.img), np.asarray(want_img), atol=1e-4)


def test_all_sample_trajectories(rng):
    d = make_blur_diffusion(T=4, sampling_routine="x0_step_down")
    f = FakeModel(16, 3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), dtype=jnp.float32)
    start = prepare_start(d, x)
    res = all_sample(d, f, start)
    assert res.x0_trajectory.shape == (4, 1, 16, 16, 3)
    assert res.xt_trajectory.shape == (4, 1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(res.xt_trajectory[0]), np.asarray(start), atol=1e-6)


def test_alg2_telescoping_invariant(rng):
    d = make_blur_diffusion(T=5, sampling_routine="x0_step_down")
    f = FakeModel(16, 3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), dtype=jnp.float32)
    start = prepare_start(d, x)
    res = all_sample(d, f, start)
    # x_{t-1} - x_t == D(x0_hat, t-1) - D(x0_hat, t) at every step
    for k in range(4):
        t_cur = 5 - k
        x_t = res.xt_trajectory[k]
        x_tm1 = res.xt_trajectory[k + 1]
        x0_hat = res.x0_trajectory[k]
        n = jnp.full((1,), t_cur, dtype=jnp.int32)
        want = d.op.degrade(x0_hat, n - 1) - d.op.degrade(x0_hat, n)
        np.testing.assert_allclose(
            np.asarray(x_tm1 - x_t), np.asarray(want), atol=1e-4
        )


def test_train_routines_run(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float32)
    t = jnp.asarray([1, 4])
    oracle = lambda xt, tt: xt
    for routine in ["Final", "Step", "Step_Gradient", "Final_small_noise",
                    "Final_random_mean", "Final_random_mean_and_actual",
                    "Gradient_norm"]:
        d = make_blur_diffusion(train_routine=routine)
        loss = d.p_losses(oracle, x, t, rng=jax.random.key(0))
        assert np.isfinite(float(loss)), routine
    for lt in ["l1", "l2", "sqrt"]:
        d = make_blur_diffusion(loss_type=lt)
        assert np.isfinite(float(d.loss(oracle, x, jax.random.key(1))))


def test_discrete_quantizes_q_sample(rng):
    d = make_blur_diffusion(discrete=True)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)) * 0.5, dtype=jnp.float32)
    y = np.asarray(d.q_sample(x, jnp.asarray([2, 3])))
    levels = (y + 1) * 0.5 * 255
    np.testing.assert_allclose(levels, np.round(levels), atol=1e-3)
