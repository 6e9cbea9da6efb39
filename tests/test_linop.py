"""Golden tests: linop matrices must match torch conv/interpolate semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from colddiff.ops import linop
from colddiff.schedules import gaussian_kernel_1d, gaussian_kernel_2d


def torch_depthwise_blur(x_nchw, k2d, mode):
    """Reference-style depthwise conv (deblurring_diffusion_pytorch.py:352-361)."""
    c = x_nchw.shape[1]
    k = torch.as_tensor(k2d, dtype=torch.float64)[None, None].repeat(c, 1, 1, 1)
    p = (k2d.shape[0] - 1) // 2
    pad_mode = {"circular": "circular", "reflect": "reflect", "zeros": "constant"}[mode]
    xp = F.pad(x_nchw, (p, p, p, p), mode=pad_mode)
    return F.conv2d(xp, k, groups=c)


@pytest.mark.parametrize("mode", ["circular", "reflect", "zeros"])
@pytest.mark.parametrize("ks,std", [(3, 0.5), (11, 7.0), (15, 1.2)])
def test_conv1d_matrix_matches_torch_conv2d(rng, mode, ks, std):
    n = 28
    x = rng.standard_normal((2, 3, n, n))
    xt = torch.as_tensor(x, dtype=torch.float64)
    k2d = gaussian_kernel_2d((ks, ks), (std, std)).astype(np.float64)
    want = torch_depthwise_blur(xt, k2d, mode).numpy()

    m = linop.conv1d_matrix(gaussian_kernel_1d(ks, std).astype(np.float64), n, mode)
    got = np.einsum("ij,bcjw->bciw", m, x)
    got = np.einsum("ij,bchj->bchi", m, got)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "nearest", "nearest-exact", "area"])
@pytest.mark.parametrize("n_in,n_out", [(32, 17), (32, 31), (28, 14), (16, 5), (8, 8)])
def test_resize1d_matrix_matches_torch_interpolate(rng, mode, n_in, n_out):
    x = rng.standard_normal((2, 3, n_in, n_in))
    xt = torch.as_tensor(x, dtype=torch.float64)
    want = F.interpolate(xt, size=(n_out, n_out), mode=mode, antialias=False).numpy()

    m = linop.resize1d_matrix(n_in, n_out, mode)
    got = np.einsum("ij,bcjw->bciw", m, x)
    got = np.einsum("ij,bchj->bchi", m, got)
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "area"])
def test_resize_step_matrix_matches_torch_roundtrip(rng, mode):
    # one resolution-pyramid step: down to s then nearest-exact back up
    # (resolution_diffusion_pytorch.py:370-371)
    n, s = 32, 13
    x = rng.standard_normal((2, 3, n, n))
    xt = torch.as_tensor(x, dtype=torch.float64)
    down = F.interpolate(xt, size=(s, s), mode=mode, antialias=False)
    want = F.interpolate(down, size=(n, n), mode="nearest-exact").numpy()

    m = linop.resize_step_matrix(n, s, mode)
    got = np.einsum("ij,bcjw->bciw", m, x)
    got = np.einsum("ij,bchj->bchi", m, got)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_cumulative_matrices_compose(rng):
    n = 16
    mats = [rng.standard_normal((n, n)) * 0.3 for _ in range(5)]
    cum = linop.cumulative_matrices(mats)
    assert cum.shape == (6, n, n)
    np.testing.assert_allclose(cum[0], np.eye(n), atol=1e-7)
    want = mats[2] @ mats[1] @ mats[0]
    np.testing.assert_allclose(cum[3], want, rtol=2e-5, atol=1e-6)


def test_apply_separable_gathers_per_sample(rng):
    import jax.numpy as jnp

    n, T = 8, 4
    mats = [rng.standard_normal((n, n)) * 0.4 for _ in range(T)]
    cum = jnp.asarray(linop.cumulative_matrices(mats))
    x = rng.standard_normal((3, n, n, 2)).astype(np.float32)
    t = jnp.asarray([0, 2, 4])
    y = np.asarray(linop.apply_separable(jnp.asarray(x), cum, t))

    np.testing.assert_allclose(y[0], x[0], atol=1e-5)
    for b, steps in [(1, 2), (2, 4)]:
        want = x[b]
        for i in range(steps):
            want = np.einsum("ij,jwc->iwc", mats[i], want)
            want = np.einsum("ij,hjc->hic", mats[i], want)
        np.testing.assert_allclose(y[b], want, rtol=2e-4, atol=2e-4)
