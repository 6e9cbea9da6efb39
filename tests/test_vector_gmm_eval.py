"""Family-B vector-GMM blind generation + data-as-x_T eval methods.

Ports under test (reference cites in the harness docstrings):
  - gmm_vector_samples        (sample_as_a_vector_gmm, denoise :1091-1158)
  - gmm_vector_samples_and_save (sample_as_a_vector_gmm_and_save :1161-1213)
  - sample_from_data_save     (denoise :1362-1395)
  - test_from_data_save_results (defading_diffusion_gaussian.py:1146-1244)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colddiff.diffusion import ColdDiffusion
from colddiff.eval.harness import EvalHarness
from colddiff.models import UnetConvNext
from colddiff.operators import get_operator


class TinyDataset:
    def __init__(self, n=24, size=8, channels=3, seed=0):
        rng = np.random.default_rng(seed)
        self.items = [
            np.asarray(rng.uniform(-1, 1, (size, size, channels)), np.float32)
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vecgmm")
    op = get_operator("noise", timesteps=3)
    d = ColdDiffusion(op=op, image_size=8, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((2,), jnp.int32))
    return EvalHarness(d, model, params, results_folder=str(tmp / "res"))


def test_gmm_vector_samples_shapes_and_artifacts(harness):
    ds = TinyDataset()
    res = harness.gmm_vector_samples(ds, siz=4, clusters=2, num=6,
                                     max_fit=16)
    assert res.img.shape == (6, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(res.img)))
    root = harness.results_folder
    assert (root / "og-4-2-vec.png").exists()
    assert (root / "Gif-4-2-vec-x0.gif").exists()
    assert (root / "Gif-4-2-vec-xt.gif").exists()


def test_gmm_vector_samples_and_save_dumps_pngs(harness):
    ds = TinyDataset()
    out = harness.gmm_vector_samples_and_save(ds, siz=4, clusters=2,
                                              n_sample=7, batch_size=4,
                                              max_fit=16)
    # reference dir naming: <results>_<siz>_<clusters>
    assert out.name.endswith("_4_2")
    files = sorted(p.name for p in out.glob("*.png"))
    assert files == [f"sample-x0-{i}.png" for i in sorted(range(7), key=str)]


def test_sample_from_data_save_slice_semantics(harness):
    ds = TinyDataset(n=10)
    out = harness.sample_from_data_save(ds, start=2, end=8, batch_size=4)
    # reference keeps idx with start < idx <= end -> 6 images
    files = list(out.glob("sample-x0-*.png"))
    assert len(files) == 6


def test_interpolation_degrade_range_closed_form(harness):
    """Family-B degrade_range must equal degrading the clean image directly:
    degrade_range(q(x0, n0), n0, n1, x_end) == q(x0, n1) for the same x_end."""
    op = harness.d.op
    rng = jax.random.key(3)
    x0 = jax.random.uniform(rng, (4, 8, 8, 3), minval=-1, maxval=1)
    x_end = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    for n0, n1 in [(1, 3), (2, 3), (0, 2), (2, 2)]:
        at_n0 = op.degrade(x0, jnp.full((4,), n0, jnp.int32), x_end=x_end)
        stepped = op.degrade_range(at_n0, n0, n1, x_end=x_end)
        direct = op.degrade(x0, jnp.full((4,), n1, jnp.int32), x_end=x_end)
        np.testing.assert_allclose(np.asarray(stepped), np.asarray(direct),
                                   atol=1e-5, err_msg=f"range {n0}->{n1}")


def test_gmm_from_blur_samples_and_save(harness):
    ds = TinyDataset(n=12)
    out = harness.gmm_from_blur_samples_and_save(
        ds, start=0, end=11, siz=4, clusters=2, n_sample=5, batch_size=4)
    # reference dir naming: <results>_{siz}_{clusters}_{sample_at}; T=3 -> 1
    assert out.name.endswith("_4_2_1")
    assert len(list(out.glob("sample-x0-*.png"))) == 5
    gmm_dir = out.with_name(out.name.replace("_4_2_1", "_gmm_4_2_1"))
    assert len(list(gmm_dir.glob("sample-*.png"))) == 5


def test_from_data_save_results_four_folders(harness):
    ds = TinyDataset(n=5)
    harness.test_from_data_save_results(ds, num=5, batch_size=4)
    root = harness.results_folder
    for tag in ("orig", "blur", "d_deblur", "deblur"):
        d = root.with_name(f"{root.name}_{tag}")
        assert len(list(d.glob("*.png"))) == 5, tag
