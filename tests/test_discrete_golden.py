"""Golden audit of the --discrete generation path.

A torch-free numpy walk of the reference's ``gen_sample`` reverse loop
(deblurring_diffusion_pytorch.py:457-593; gen_sample and gen_sample_2 are
line-identical) at T=4, compared step-by-step against colddiff's fused-scan
sampler.  Verifies bit-level placement of:

  - the channel-mean collapse: preamble (:413-415 / :546-549) and *inside*
    the x0_step_down re-degradation chain only when the chain index hits
    i == T-1 (:573-577) -- i.e. only the full-level re-degradation collapses;
  - the symmetry-breaking noise added *after* the collapse (:550-551);
  - 8-bit quantization: applied in q_sample ONLY (:954-958, truncation via
    torch .int()), never inside the reverse loop.
"""

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.diffusion import ColdDiffusion
from colddiff.operators import get_operator
from colddiff.sampling import prepare_start, sample
from colddiff.schedules import blur_routine_params, gaussian_kernel_1d

T = 4
SIZE = 8
B = 2


def np_blur(x, k1d):
    """Naive separable circular-pad depthwise blur, fp64 numpy.

    Independent of colddiff's linop matrices: direct cross-correlation like
    the reference's nn.Conv2d(padding_mode='circular') chains."""
    k1d = np.asarray(k1d, np.float64)
    ks = len(k1d)
    p = (ks - 1) // 2
    out = x.astype(np.float64)
    for axis in (1, 2):
        idx = (np.arange(x.shape[axis])[:, None] + np.arange(ks)[None] - p) % x.shape[axis]
        taken = np.take(out, idx, axis=axis)  # [..., n, ks, ...]
        out = np.tensordot(taken, k1d, axes=([axis + 1], [0]))
    return out


def oracle(xp, x, step):
    """Deterministic stand-in denoiser, written against the shared np/jnp API."""
    return 0.7 * x + 0.2 * xp.roll(x, 1, axis=1) + 0.01 * (step + 1)


def make_op(discrete=True):
    return get_operator("blur", image_size=SIZE, timesteps=T,
                        blur_routine="Constant", kernel_size=3, kernel_std=1.0,
                        discrete=discrete)


def kernels_1d():
    params = blur_routine_params("Constant", T, 3, 1.0, 0.01, 1.0)
    return [gaussian_kernel_1d(ks, std) for (ks, std, mode) in params]


def reference_gen_sample(x_in, noise, t=T):
    """The reference loop, transcribed semantics (deblur :526-593)."""
    ks = kernels_1d()
    img = x_in.astype(np.float64)
    for i in range(t):
        img = np_blur(img, ks[i])
    temp_shape = img.shape
    # discrete collapse of the start state (:546-549)
    img = np.broadcast_to(img.mean(axis=(1, 2), keepdims=True), temp_shape).copy()
    img = img + noise  # symmetry breaking AFTER collapse (:550-551)
    xt = img.copy()
    direct = None
    states = [img.copy()]
    while t:
        x = oracle(np, img, t - 1)
        if direct is None:
            direct = x.copy()
        x_times = x.copy()
        for i in range(t):
            x_times = np_blur(x_times, ks[i])
            if i == T - 1:  # collapse ONLY at the full level (:573-577)
                x_times = np.broadcast_to(
                    x_times.mean(axis=(1, 2), keepdims=True), temp_shape
                ).copy()
        x_sub = x.copy()
        for i in range(t - 1):
            x_sub = np_blur(x_sub, ks[i])
        img = img - x_times + x_sub
        states.append(img.copy())
        t -= 1
    return xt, direct, img, states


def test_discrete_gen_sample_golden(rng):
    op = make_op(discrete=True)
    d = ColdDiffusion(op=op, image_size=SIZE, channels=3,
                      sampling_routine="x0_step_down", discrete=True)
    x_in = rng.uniform(-1, 1, (B, SIZE, SIZE, 3)).astype(np.float32)
    noise = 0.002 * rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32)

    want_xt, want_direct, want_img, _ = reference_gen_sample(x_in, noise)

    start = prepare_start(d, jnp.asarray(x_in))
    start = start + jnp.asarray(noise)
    res = sample(d, lambda x, t: oracle(jnp, x, t[0]), start)

    np.testing.assert_allclose(np.asarray(res.xt), want_xt, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.direct_recons), want_direct,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.img), want_img, atol=1e-4)


def test_discrete_gen_sample_stepwise(rng):
    """Every intermediate state matches, not just the endpoints."""
    op = make_op(discrete=True)
    d = ColdDiffusion(op=op, image_size=SIZE, channels=3,
                      sampling_routine="x0_step_down", discrete=True)
    x_in = rng.uniform(-1, 1, (B, SIZE, SIZE, 3)).astype(np.float32)
    noise = np.zeros((B, SIZE, SIZE, 3), np.float32)
    _, _, _, states = reference_gen_sample(x_in, noise)

    from colddiff.sampling import all_sample

    start = prepare_start(d, jnp.asarray(x_in))
    res = all_sample(d, lambda x, t: oracle(jnp, x, t[0]), start)
    got_states = [np.asarray(f) for f in res.xt_trajectory] + [np.asarray(res.img)]
    assert len(got_states) == len(states)
    for k, (got, want) in enumerate(zip(got_states, states)):
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=f"state {k} diverges")


def test_discrete_quantization_in_q_sample_only(rng):
    """Quantization: q_sample yes (truncation semantics), reverse loop no."""
    op = make_op(discrete=True)
    d = ColdDiffusion(op=op, image_size=SIZE, channels=3,
                      sampling_routine="x0_step_down", discrete=True)
    x = jnp.asarray(rng.uniform(-1, 1, (B, SIZE, SIZE, 3)).astype(np.float32))

    # q_sample output sits exactly on the 255-level truncation grid
    q = np.asarray(d.q_sample(x, jnp.full((B,), 1, jnp.int32)))
    lv = (q + 1.0) * 0.5 * 255.0
    np.testing.assert_allclose(lv, np.trunc(lv + 1e-4), atol=2e-3)

    # ... and equals trunc(raw degraded state), proving quantize-after-gather
    raw = np.asarray(op.degrade(x, jnp.full((B,), 2, jnp.int32)))
    want = (np.trunc((raw + 1.0) * 0.5 * 255.0) / 255.0) * 2.0 - 1.0
    q2 = np.asarray(d.q_sample(x, jnp.full((B,), 1, jnp.int32)))
    np.testing.assert_allclose(q2, want, atol=1e-6)

    # reverse loop states are NOT quantized (generic floats off the grid)
    start = prepare_start(d, x)
    res = sample(d, lambda xx, tt: oracle(jnp, xx, tt[0]), start)
    lv = (np.asarray(res.img) + 1.0) * 0.5 * 255.0
    assert np.abs(lv - np.round(lv)).max() > 1e-3
