"""Named paper-figure generators, degrade_range, trajectory thinning."""

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.data.datasets import SyntheticDataset
from colddiff.diffusion import ColdDiffusion
from colddiff.eval import EvalHarness
from colddiff.models import UnetConvNext
from colddiff.operators import get_operator
from colddiff.sampling import all_sample


def make_harness(tmp_path, timesteps=3, discrete=False):
    op = get_operator("blur", image_size=16, timesteps=timesteps,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0,
                      discrete=discrete)
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down", discrete=discrete)
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))
    return EvalHarness(d, model, params, results_folder=str(tmp_path))


def test_degrade_range_matches_sequential(rng):
    op = get_operator("blur", image_size=12, timesteps=5,
                      blur_routine="Incremental", kernel_size=3, kernel_std=0.5)
    x0 = jnp.asarray(rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32))
    # range from 0 == plain degrade
    full = op.degrade(x0, jnp.full((2,), 4, jnp.int32))
    np.testing.assert_allclose(np.asarray(op.degrade_range(x0, 0, 4)),
                               np.asarray(full), atol=1e-6)
    # composing ranges == one long chain: D(x, 0->2) then D(., 2->5) == D(x, 5)
    mid = op.degrade_range(x0, 0, 2)
    end = op.degrade_range(mid, 2, 5)
    want = op.degrade(x0, jnp.full((2,), 5, jnp.int32))
    np.testing.assert_allclose(np.asarray(end), np.asarray(want), atol=1e-5)
    # empty range is identity
    np.testing.assert_allclose(np.asarray(op.degrade_range(x0, 3, 3)),
                               np.asarray(x0), atol=0)


def test_degrade_range_discrete_collapse(rng):
    op = get_operator("blur", image_size=8, timesteps=3,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0,
                      discrete=True)
    x0 = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    y = op.degrade_range(x0, 1, 3)  # reaches T -> channel-mean collapse
    y = np.asarray(y)
    assert np.allclose(y, y.mean(axis=(1, 2), keepdims=True), atol=1e-6)


def test_degrade_range_family_b(rng):
    # closed-form ratio interpolation: advancing x_{n0} -> x_{n1} without x0
    # must equal degrading x0 straight to n1 (added round 3; the endpoint is
    # required for the partial chain)
    op = get_operator("noise", timesteps=4)
    x0 = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    x_end = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    n0 = jnp.full((2,), 1, jnp.int32)
    x1 = op.degrade(x0, n0, x_end=x_end)
    got = op.degrade_range(x1, 1, 3, x_end=x_end)
    want = op.degrade(x0, jnp.full((2,), 3, jnp.int32), x_end=x_end)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # missing endpoint fails loudly
    try:
        op.degrade_range(x1, 1, 3)
        raise AssertionError("expected AssertionError for missing x_end")
    except AssertionError as e:
        assert "endpoint" in str(e)


def test_all_sample_traj_stride(tmp_path, rng):
    h = make_harness(tmp_path, timesteps=4)
    og = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    start = h.d.op.degrade(og, jnp.full((2,), 4, jnp.int32))
    key = jax.random.key(3)
    full = all_sample(h.d, h.denoise, start, rng=key)
    thin = all_sample(h.d, h.denoise, start, rng=key, traj_stride=2)
    assert full.xt_trajectory.shape[0] == 4
    assert thin.xt_trajectory.shape[0] == 2
    np.testing.assert_allclose(np.asarray(thin.img), np.asarray(full.img),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(thin.xt_trajectory[0]),
                               np.asarray(full.xt_trajectory[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(thin.xt_trajectory[1]),
                               np.asarray(full.xt_trajectory[2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(thin.x0_trajectory[1]),
                               np.asarray(full.x0_trajectory[2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(thin.direct_recons),
                               np.asarray(full.direct_recons), atol=1e-5)
    try:
        all_sample(h.d, h.denoise, start, rng=key, traj_stride=3)
        raise AssertionError("expected ValueError for non-dividing stride")
    except ValueError:
        pass


def test_named_paper_figures(tmp_path):
    h = make_harness(tmp_path)
    ds = SyntheticDataset(16, 3, length=8)
    batch = np.stack([ds[i] for i in range(4)])

    paths = h.paper_invert_section_images(batch)
    assert all(p.exists() for p in paths)
    assert (tmp_path / "blurry_image_0.png").exists()
    assert (tmp_path / "sampling_recons_0.png").exists()

    paths = h.paper_showing_diffusion_images(batch, to_show=(0, 1, 2))
    assert len(paths) == 4 and all(p.exists() for p in paths)

    paths = h.paper_showing_diffusion_images_diff(batch, to_show=(0, 1))
    assert {p.name for p in paths} == {"all_alg1_0.png", "all_alg2_0.png"}

    paths = h.paper_showing_sampling_diff_images(batch)
    assert (tmp_path / "x0_alg1_0.png").exists()
    assert (tmp_path / "og_img_3.png").exists()
    assert len(paths) == 4

    paths = h.paper_cover_page_both_sampling(batch[:2], n_frames=3)
    assert (tmp_path / "all_1_0.png").exists()
    assert (tmp_path / "all_2_1.png").exists()


def test_sample_from_blur(tmp_path, rng):
    h = make_harness(tmp_path, timesteps=4)
    img = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    res = h.sample_from_blur(img, start=2)
    assert res.img.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(res.img)).all()
    assert (tmp_path / "sample-xt-from_blur.png").exists()
    # xt really is the continued chain: D(img, 2->4)
    want = h.d.op.degrade_range(jnp.asarray(img), 2, 4)
    np.testing.assert_allclose(np.asarray(res.xt), np.asarray(want), atol=1e-6)


def test_save_gif_titles(tmp_path, rng):
    from colddiff.utils import add_title_bar, save_gif

    frames = [rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
              for _ in range(3)]
    save_gif(frames, tmp_path / "t.gif", titles=True)
    assert (tmp_path / "t.gif").exists()
    bar = add_title_bar(np.zeros((8, 8, 3), np.uint8), ["0", "og"])
    assert bar.shape == (8 + 20 + 20, 28, 3)
    assert (bar[:20] != 0).any()  # magenta strip present
