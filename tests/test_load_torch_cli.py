"""Resuming from reference PyTorch Trainer checkpoints ({step, model, ema},
deblurring_diffusion_pytorch.py:1140-1149) via Trainer(load_torch_path=...)
and the CLI --load_torch_path flag — the migration path for users bringing
their reference-trained .pt files to colddiff."""

import jax
import numpy as np
import pytest
import torch

from colddiff.data.datasets import SyntheticDataset
from colddiff.diffusion import ColdDiffusion
from colddiff.models import UnetConvNext
from colddiff.models.import_torch import import_unet_convnext
from colddiff.operators import get_operator
from colddiff.train import Trainer

from tests.test_import_torch import _synth_convnext_sd

DIM, CH = 8, 3


def _save_reference_blob(path, sd_model, sd_ema, step=7):
    """torch.save the reference Trainer format, with the DataParallel
    ``module.`` + ``denoise_fn.`` scoping and a degradation buffer that the
    loader must skip (the deblur GaussianDiffusion registers its blur convs
    as submodules, deblurring_diffusion_pytorch.py:348-389)."""

    def scoped(sd):
        out = {f"module.denoise_fn.{k}": torch.as_tensor(v)
               for k, v in sd.items()}
        out["module.gaussian_kernels.0.weight"] = torch.zeros(CH, 1, 3, 3)
        return out

    torch.save({"step": step, "model": scoped(sd_model),
                "ema": scoped(sd_ema)}, path)


def _make_trainer(tmp_path, mults, **kw):
    op = get_operator("blur", image_size=16, timesteps=4,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=CH,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=DIM, dim_mults=mults, channels=CH)
    kw.setdefault("train_num_steps", 1)
    return Trainer(d, model, SyntheticDataset(16, CH, length=16),
                   train_batch_size=8,
                   results_folder=str(tmp_path / "results"),
                   num_workers=1, **kw)


def test_trainer_load_torch_path(tmp_path):
    mults = (1, 2)
    sd_m = _synth_convnext_sd(DIM, mults, CH)
    sd_e = {k: v + 1.0 for k, v in sd_m.items()}  # make ema distinguishable
    pt = tmp_path / "model.pt"
    _save_reference_blob(pt, sd_m, sd_e, step=7)

    tr = _make_trainer(tmp_path, mults, load_torch_path=str(pt),
                       train_num_steps=8, save_and_sample_every=100)
    assert tr.step == 7
    assert int(jax.device_get(tr.state.step)) == 7
    for want_sd, got in [(sd_m, tr.state.params), (sd_e, tr.state.ema_params)]:
        want = import_unet_convnext(want_sd, DIM, mults, CH)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, jax.device_get(b),
                                                    atol=0),
            want, got)
    # the imported model still trains (sharded state round-trips the step fn)
    tr.train(log_every=10)
    assert tr.step == 8


def test_trainer_rejects_both_load_paths(tmp_path):
    with pytest.raises(ValueError, match="not both"):
        _make_trainer(tmp_path, (1, 2), load_path="x", load_torch_path="y")


def test_cli_test_from_torch_checkpoint(tmp_path):
    """End-to-end: a reference .pt drives CLI sampling via --load_torch_path."""
    mults = (1, 2, 4, 8)  # the CLI's fixed ConvNeXt dim_mults
    sd = _synth_convnext_sd(DIM, mults, CH)
    pt = tmp_path / "model.pt"
    _save_reference_blob(pt, sd, sd, step=3)

    from tests._cli import run_cli

    run_cli([
        "test",
        "--test_type", "test_data",
        "--degradation", "blur", "--dataset", "synthetic",
        "--image_size", "16", "--time_steps", "3",
        "--model", "UnetConvNext", "--dim", str(DIM),
        "--batch_size", "4",
        "--blur_size", "3", "--blur_std", "1.0", "--blur_routine", "Constant",
        "--save_folder", str(tmp_path / "out"),
        "--load_torch_path", str(pt),
    ])
    assert list((tmp_path / "out").glob("*.png"))
