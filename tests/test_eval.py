"""Eval stack tests: metrics, GMM, FID machinery, harness + CLI smoke."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.eval import (
    EvalHarness,
    calculate_fid_given_samples,
    fid_features_fn,
    fit_gmm,
    frechet_distance,
    psnr,
    rmse,
    sample_gmm,
    ssim,
)


def test_ssim_properties(rng):
    x = jnp.asarray(rng.random((2, 32, 32, 3)), dtype=jnp.float32)
    assert float(ssim(x, x)) > 0.9999
    noisy = x + 0.2 * jnp.asarray(rng.standard_normal(x.shape), dtype=jnp.float32)
    s = float(ssim(x, noisy))
    assert 0.0 < s < 0.95
    very_noisy = x + 0.8 * jnp.asarray(rng.standard_normal(x.shape), dtype=jnp.float32)
    assert float(ssim(x, very_noisy)) < s


def test_rmse_psnr(rng):
    x = jnp.zeros((1, 8, 8, 1))
    y = jnp.ones((1, 8, 8, 1)) * 0.5
    assert abs(float(rmse(x, y)) - 0.5) < 1e-6
    assert float(psnr(x, x)) > 100


def test_gmm_recovers_two_clusters(rng):
    a = rng.standard_normal((200, 2)) * 0.1 + np.array([2.0, 2.0])
    b = rng.standard_normal((200, 2)) * 0.1 + np.array([-2.0, -2.0])
    data = jnp.asarray(np.concatenate([a, b]), dtype=jnp.float32)
    gmm = fit_gmm(data, 2, jax.random.key(0), n_iters=50)
    means = np.sort(np.asarray(gmm.means)[:, 0])
    np.testing.assert_allclose(means, [-2.0, 2.0], atol=0.2)
    draws = np.asarray(sample_gmm(gmm, jax.random.key(1), 500))
    assert abs(abs(draws[:, 0]).mean() - 2.0) < 0.3


def test_frechet_distance_zero_for_identical():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    assert frechet_distance(mu, sigma, mu + 1.0, sigma) > 3.9


def test_fid_fallback_extractor_discriminates(rng):
    feats = fid_features_fn()
    assert not feats.is_inception  # no weights in this container
    real = rng.random((64, 16, 16, 3)).astype(np.float32) * 2 - 1
    same = rng.random((64, 16, 16, 3)).astype(np.float32) * 2 - 1
    diff = np.clip(real + 0.8 * rng.standard_normal(real.shape), -1, 1).astype(np.float32)
    fid_close = calculate_fid_given_samples([real, same], batch_size=32, features=feats)
    fid_far = calculate_fid_given_samples([real, diff], batch_size=32, features=feats)
    assert fid_far > fid_close >= 0


def test_harness_test_from_data_and_manifold(tmp_path, rng):
    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator

    op = get_operator("blur", image_size=16, timesteps=3, blur_routine="Constant",
                      kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32))
    h = EvalHarness(d, model, params, results_folder=str(tmp_path))

    ds = SyntheticDataset(16, 3, length=12)
    batch = np.stack([ds[i] for i in range(4)])
    h.test_from_data(batch, milestone=7)
    assert (tmp_path / "og-7.png").exists()
    assert (tmp_path / "x0-7.gif").exists()
    assert (tmp_path / "xt-7-2.png").exists()

    out = h.fid_distance_decrease_from_manifold(ds, end=8, batch_size=4)
    # no Inception weights in this container -> loud proxy_fid_* keys
    assert out["extractor"] == "fallback-random-projection"
    for key in ("proxy_fid_degraded", "proxy_fid_sampled", "rmse_direct",
                "ssim_sampled", "proxy_fid_improvement"):
        assert np.isfinite(out[key])
    assert not any(k.startswith("fid_") for k in out)
    # metrics run in the reference's [0,1] domain (deblurring...py:1619-1623):
    # SSIM is then bounded by 1 and RMSE by 1 (regression: they were computed
    # on [-1,1] data, doubling RMSE and pushing SSIM outside [-1, 1])
    for name in ("degraded", "sampled", "direct"):
        assert out[f"ssim_{name}"] <= 1.0 + 1e-5
        assert 0.0 <= out[f"rmse_{name}"] <= 1.0

    p = h.paper_trajectory_strip(batch)
    assert p.exists()

    res = h.gmm_mean_samples(ds, clusters=1, num=4, noise_level=0.002)
    assert res.img.shape == (4, 16, 16, 3)


def test_harness_sample_and_save_for_fid(tmp_path):
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator

    op = get_operator("noise", timesteps=3)
    d = ColdDiffusion(op=op, image_size=8, channels=3, sampling_routine="ddim")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32))
    h = EvalHarness(d, model, params, results_folder=str(tmp_path))
    out = h.sample_and_save_for_fid(num=5, batch_size=4)
    assert len(list(out.glob("*.png"))) == 5


def test_cli_train_smoke(tmp_path):
    cmd = [
        sys.executable, "-m", "colddiff.cli.main", "train",
        "--degradation", "blur", "--dataset", "synthetic",
        "--image_size", "16", "--time_steps", "3",
        "--blur_size", "3", "--blur_std", "1.0", "--blur_routine", "Constant",
        "--model", "UnetConvNext", "--dim", "8",
        "--batch_size", "8", "--train_steps", "1", "--grad_accum", "1",
        "--save_and_sample_every", "100",
        "--save_folder", str(tmp_path / "out"),
    ]
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize force-registers the TPU when this is set
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "out" / "model").exists()
