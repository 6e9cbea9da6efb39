"""Harness extras: mixup / from_random / controlled reconstruct / opt."""

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.data.datasets import SyntheticDataset
from colddiff.diffusion import ColdDiffusion
from colddiff.eval import EvalHarness
from colddiff.models import UnetConvNext
from colddiff.operators import get_operator


def make_harness(tmp_path):
    op = get_operator("blur", image_size=16, timesteps=3, blur_routine="Constant",
                      kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))
    return EvalHarness(d, model, params, results_folder=str(tmp_path))


def test_harness_extras(tmp_path):
    h = make_harness(tmp_path)
    ds = SyntheticDataset(16, 3, length=8)
    b1 = np.stack([ds[i] for i in range(4)])
    b2 = np.stack([ds[i + 4] for i in range(4)])

    h.test_with_mixup(b1, b2, milestone="mix")
    assert (tmp_path / "og-mix.png").exists()

    h.test_from_random(b1, milestone="rand")
    assert (tmp_path / "xt-rand.gif").exists()

    h.controlled_direct_reconstruct(b1, extra="7")
    assert (tmp_path / "sample-recon-7.png").exists()

    out = h.save_training_data(ds, num=5)
    assert len(list(out.glob("*.png"))) == 5

    deg = h.opt(b1)
    assert deg.shape == b1.shape
    # full degradation heavily smooths the image
    assert float(jnp.std(deg)) < np.std(b1)
