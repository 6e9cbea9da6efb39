"""Evaluation harness: the reference Trainer's ``--test_type`` surface.

Implements (SURVEY.md section 2.4):
  - ``test_from_data``: degrade a batch, run all_sample, dump per-step PNG
    grids + animated GIFs (deblurring_diffusion_pytorch.py:1238-1266;
    snowification diffusion.py:838-863).
  - ``fid_distance_decrease_from_manifold``: FID / RMSE / SSIM of degraded vs
    sampled vs direct-recon against originals (deblur :1567-1704).
  - ``sample_and_save_for_fid``: Family-B unconditional generation -> PNG tree
    for external FID (denoising_diffusion_pytorch.py:821-854).
  - GMM blind-generation samplers (deblur :1391-1512): fit a GMM to train-set
    channel means, expand samples to constant images, add symmetry-breaking
    noise, reverse-sample.
  - ``paper_showing_diffusion_images``-style trajectory strips (deblur
    :1269-1388) via PIL hconcat.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import ColdDiffusion
from ..sampling import all_sample, prepare_start, sample
from ..utils import create_folder, save_gif, save_image_grid
from .fid import calculate_fid_given_samples, fid_features_fn
from .gmm import fit_gmm, sample_gmm
from .metrics import rmse, ssim

__all__ = ["EvalHarness"]


class EvalHarness:
    def __init__(
        self,
        diffusion: ColdDiffusion,
        model,
        params,
        results_folder: str = "./results_eval",
        fid_weights: Optional[str] = None,
    ):
        self.d = diffusion
        self.model = model
        self.params = params
        self.results_folder = Path(results_folder)
        create_folder(self.results_folder)
        self._features = None
        self._fid_weights = fid_weights

        def denoise(x, t):
            return model.apply(params, x, t)

        self.denoise = denoise
        self._all_sample = jax.jit(
            lambda img, x_end, rng: all_sample(self.d, self.denoise, img,
                                               x_end=x_end, rng=rng)
        )

    @property
    def features(self):
        if self._features is None:
            self._features = fid_features_fn(self._fid_weights)
        return self._features

    # ------------------------------------------------------------------ #

    def _degrade_start(self, og, rng):
        end_rng, op_rng = jax.random.split(rng)
        x_end = self.d.op.sample_x_end(end_rng, og)
        op = self.d.op
        if hasattr(op, "randomize"):
            op = op.randomize(op_rng, og.shape[0])
        start = prepare_start(
            self.d.replace(op=op), og, x_end=x_end, op_rng=None
        )
        return start, x_end, op

    def test_from_data(self, batch, milestone: int = 0, rng=None, fps: int = 5):
        """Full trajectory dump for one batch (PNG grids + GIFs)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        start, x_end, op = self._degrade_start(og, rng)
        res = all_sample(self.d.replace(op=op), self.denoise, start, x_end=x_end,
                         rng=rng)
        x0s = np.asarray(res.x0_trajectory)
        xts = np.asarray(res.xt_trajectory)
        root = self.results_folder
        save_image_grid(np.asarray(og), root / f"og-{milestone}.png")
        for k in range(x0s.shape[0]):
            save_image_grid(x0s[k], root / f"x0-{milestone}-{k}.png")
            save_image_grid(xts[k], root / f"xt-{milestone}-{k}.png")
        save_gif(list(x0s), root / f"x0-{milestone}.gif", fps=fps)
        save_gif(list(xts), root / f"xt-{milestone}.gif", fps=fps)
        return res

    def test_with_mixup(self, batch1, batch2, milestone: str = "mixup", rng=None):
        """Sample from an average of two batches (snow diffusion.py:865-881)."""
        og = (jnp.asarray(batch1) + jnp.asarray(batch2)) / 2.0
        return self.test_from_data(np.asarray(og), milestone=milestone, rng=rng)

    def test_from_random(self, batch, milestone: str = "random", rng=None):
        """Sample from a 0.9-scaled batch (snow diffusion.py:884-895)."""
        og = jnp.asarray(batch) * 0.9
        return self.test_from_data(np.asarray(og), milestone=milestone, rng=rng)

    def controlled_direct_reconstruct(self, batch, extra: str = "0", rng=None):
        """Fixed-seed single-pass reconstruction grids
        (defading_diffusion_gaussian.py:922-943)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        start, x_end, op = self._degrade_start(og, rng)
        res = sample(self.d.replace(op=op), self.denoise, start, x_end=x_end, rng=rng)
        root = self.results_folder
        for name, imgs in [("og", og), ("xt", res.xt),
                           ("direct_recons", res.direct_recons),
                           ("recon", res.img)]:
            save_image_grid(np.asarray(imgs), root / f"sample-{name}-{extra}.png")
        return res

    def save_training_data(self, dataset, num: int = 64):
        """Dump training images as PNGs (deblur :1712-1722)."""
        out = self.results_folder / "training_data"
        create_folder(out)
        from PIL import Image

        for i in range(min(num, len(dataset))):
            arr = ((np.asarray(dataset[i]) + 1) * 127.5).astype(np.uint8)
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
            Image.fromarray(arr).save(out / f"{i}.png")
        return out

    def opt(self, batch, t: Optional[int] = None, rng=None):
        """Pure forward degradation, no model (deblur ``opt``, :595-607)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        steps = t if t is not None else self.d.num_timesteps
        end_rng, op_rng = jax.random.split(rng)
        x_end = self.d.op.sample_x_end(end_rng, og)
        return prepare_start(self.d, og, steps, x_end=x_end, op_rng=op_rng)

    # ------------------------------------------------------------------ #

    def fid_distance_decrease_from_manifold(
        self, dataset, start: int = 0, end: int = 1000, batch_size: int = 32,
        rng=None,
    ) -> dict:
        """The paper's Table harness: prints and returns the 3x3 metric grid."""
        rng = rng if rng is not None else jax.random.key(0)
        idx = range(start, min(end, len(dataset)))
        originals, degradeds, sampleds, directs = [], [], [], []
        buf = []
        for i in idx:
            buf.append(dataset[i])
            if len(buf) == batch_size:
                self._manifold_batch(np.stack(buf), rng, originals, degradeds,
                                     sampleds, directs)
                rng = jax.random.fold_in(rng, i)
                buf = []
        if buf:
            self._manifold_batch(np.stack(buf), rng, originals, degradeds,
                                 sampleds, directs)
        og = np.concatenate(originals)
        bl = np.concatenate(degradeds)
        sm = np.concatenate(sampleds)
        dr = np.concatenate(directs)

        out = {}
        for name, other in [("degraded", bl), ("sampled", sm), ("direct", dr)]:
            out[f"fid_{name}"] = calculate_fid_given_samples(
                [og, other], features=self.features
            )
            out[f"rmse_{name}"] = float(rmse(jnp.asarray(og), jnp.asarray(other)))
            out[f"ssim_{name}"] = float(
                ssim(jnp.asarray(og), jnp.asarray(other), data_range=1.0)
            )
        out["fid_improvement"] = out["fid_degraded"] - out["fid_sampled"]
        for k, v in out.items():
            print(f"{k}: {v:.5f}")
        return out

    def _manifold_batch(self, batch, rng, originals, degradeds, sampleds, directs):
        og = jnp.asarray(batch)
        start, x_end, op = self._degrade_start(og, rng)
        res = self._all_sample(start, x_end, rng)
        originals.append(np.asarray(og))
        degradeds.append(np.asarray(res.xt_trajectory[0]))
        sampleds.append(np.asarray(res.img))
        directs.append(np.asarray(res.x0_trajectory[0]))

    # ------------------------------------------------------------------ #

    def sample_and_save_for_fid(
        self, num: int = 6400, batch_size: int = 128, rng=None, image_size=None,
        out_name: str = "fid_out", endpoint_dataset=None,
    ) -> Path:
        """Family-B unconditional generation -> PNG tree.

        ``endpoint_dataset``: demixing samples from dataset-2 images instead
        of noise (demixing_diffusion_pytorch.py:806-836).
        """
        from PIL import Image

        rng = rng if rng is not None else jax.random.key(0)
        s = image_size or self.d.image_size
        out = self.results_folder / out_name
        create_folder(out)
        count = 0
        sample_jit = jax.jit(
            lambda noise, r: sample(self.d, self.denoise, noise, x_end=noise, rng=r)
        )
        ep_idx = 0
        while count < num:
            rng, nrng, srng = jax.random.split(rng, 3)
            if endpoint_dataset is not None:
                idxs = [(ep_idx + i) % len(endpoint_dataset)
                        for i in range(batch_size)]
                ep_idx += batch_size
                noise = jnp.asarray(
                    np.stack([endpoint_dataset[i] for i in idxs])
                )
            else:
                noise = jax.random.normal(
                    nrng, (batch_size, s, s, self.d.channels)
                )
            res = sample_jit(noise, srng)
            imgs = np.asarray((jnp.clip(res.img, -1, 1) + 1) * 127.5).astype(np.uint8)
            for i in range(imgs.shape[0]):
                if count >= num:
                    break
                arr = imgs[i]
                if arr.shape[-1] == 1:
                    arr = arr[..., 0]
                Image.fromarray(arr).save(out / f"{count}.png")
                count += 1
        return out

    # ------------------------------------------------------------------ #

    def gmm_mean_samples(
        self, dataset, clusters: int = 1, num: int = 64, noise_level: float = 0.0,
        rng=None, max_fit: int = 5000,
    ):
        """Blind generation via GMM over train-set channel means
        (sample_as_a_mean_blur_torch_gmm[_ablation], deblur :1391-1512)."""
        rng = rng if rng is not None else jax.random.key(0)
        n_fit = min(len(dataset), max_fit)
        means = np.stack(
            [np.asarray(dataset[i]).mean(axis=(0, 1)) for i in range(n_fit)]
        )
        f_rng, s_rng, n_rng, samp_rng = jax.random.split(rng, 4)
        gmm = fit_gmm(jnp.asarray(means), clusters, f_rng)
        draws = sample_gmm(gmm, s_rng, num)  # [num, C]
        s = self.d.image_size
        img = jnp.broadcast_to(
            draws[:, None, None, :], (num, s, s, draws.shape[-1])
        )
        # gen_sample preamble (deblur :465-482): degrade the start image
        # through the chain (identity for constant images under normalized
        # blur, incl. the discrete collapse), then add symmetry-breaking noise
        img = prepare_start(self.d, img)
        if noise_level > 0:
            img = img + noise_level * jax.random.normal(n_rng, img.shape)
        res = sample(self.d, self.denoise, img, rng=samp_rng)
        return res

    # ------------------------------------------------------------------ #

    def gmm_blur_samples(
        self, dataset, clusters: int = 10, num: int = 64, sample_at: int = None,
        gmm_res: int = 16, noise_level: float = 0.0, rng=None, max_fit: int = 2000,
    ):
        """Blind generation via GMM over *degraded low-res images* at level
        ``sample_at`` (sample_as_a_blur_torch_gmm, deblur :1514-1564):
        degrade train images to sample_at, downsample, flatten, fit GMM,
        sample, upsample, reverse-sample from sample_at."""
        rng = rng if rng is not None else jax.random.key(0)
        T = self.d.num_timesteps
        sample_at = sample_at if sample_at is not None else T
        s = self.d.image_size
        n_fit = min(len(dataset), max_fit)
        imgs = jnp.asarray(np.stack([dataset[i] for i in range(n_fit)]))
        lvl = jnp.full((n_fit,), sample_at, dtype=jnp.int32)
        degraded = self.d.op.degrade(imgs, lvl)
        c = degraded.shape[-1]
        low = jax.image.resize(
            degraded, (n_fit, gmm_res, gmm_res, c), method="bilinear"
        ).reshape(n_fit, -1)
        f_rng, s_rng, n_rng, samp_rng = jax.random.split(rng, 4)
        gmm = fit_gmm(low, clusters, f_rng)
        draws = sample_gmm(gmm, s_rng, num).reshape(num, gmm_res, gmm_res, c)
        start = jax.image.resize(draws, (num, s, s, c), method="bilinear")
        # gen_sample re-degrades the GMM draw through the chain before the
        # reverse loop (deblur :465-482)
        start = prepare_start(self.d, start, sample_at)
        if noise_level > 0:
            start = start + noise_level * jax.random.normal(n_rng, start.shape)
        return sample(self.d, self.denoise, start, sample_at, rng=samp_rng)

    def forward_and_backward(self, batch, rng=None, prefix: str = "fb"):
        """Forward degradation frames + reverse frames for figure strips
        (denoising_diffusion_pytorch.py:437-478; deblur :691-861)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        b = og.shape[0]
        T = self.d.num_timesteps
        end_rng, _ = jax.random.split(rng)
        x_end = self.d.op.sample_x_end(end_rng, og)
        # forward trajectory: D(og, n) for every level
        fwd = [np.asarray(og)]
        for n in range(1, T + 1):
            fwd.append(np.asarray(self.d.op.degrade(
                og, jnp.full((b,), n), x_end=x_end, og=og)))
        res = all_sample(self.d, self.denoise, jnp.asarray(fwd[-1]),
                         x_end=x_end, rng=rng)
        bwd = [np.asarray(f) for f in res.xt_trajectory] + [np.asarray(res.img)]
        save_gif(fwd, self.results_folder / f"{prefix}-forward.gif")
        save_gif(bwd, self.results_folder / f"{prefix}-backward.gif")
        return fwd, bwd

    def paper_cover_page(self, batch, n_frames: int = 8, rng=None,
                         name: str = "cover_page.png"):
        """Multi-image trajectory grid: rows = samples, columns = reverse steps
        (paper_showing_diffusion_images_cover_page, deblur :1269-1330)."""
        from PIL import Image

        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        start, x_end, op = self._degrade_start(og, rng)
        res = all_sample(self.d.replace(op=op), self.denoise, start,
                         x_end=x_end, rng=rng)
        frames = np.concatenate(
            [np.asarray(res.xt_trajectory), np.asarray(res.img)[None]], axis=0
        )  # [T+1, B, H, W, C]
        T1 = frames.shape[0]
        pick = np.linspace(0, T1 - 1, min(n_frames, T1)).astype(int)
        rows = []
        for b in range(og.shape[0]):
            rows.append(np.concatenate([frames[k, b] for k in pick], axis=1))
        page = np.concatenate(rows, axis=0)
        page = ((np.clip(page, -1, 1) + 1) * 127.5).astype(np.uint8)
        if page.shape[-1] == 1:
            page = page[..., 0]
        path = self.results_folder / name
        Image.fromarray(page).save(path)
        return path

    def paper_trajectory_strip(self, batch, n_frames: int = 8, rng=None,
                               name: str = "trajectory_strip.png"):
        """Horizontal forward+reverse trajectory strip (paper figures)."""
        from PIL import Image

        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch[:1])
        start, x_end, op = self._degrade_start(og, rng)
        res = all_sample(self.d.replace(op=op), self.denoise, start, x_end=x_end,
                         rng=rng)
        frames = np.asarray(res.xt_trajectory)[:, 0]  # [T, H, W, C]
        T = frames.shape[0]
        pick = np.linspace(0, T - 1, min(n_frames, T)).astype(int)
        strip = np.concatenate([frames[i] for i in pick], axis=1)
        strip = ((np.clip(strip, -1, 1) + 1) * 127.5).astype(np.uint8)
        if strip.shape[-1] == 1:
            strip = strip[..., 0]
        path = self.results_folder / name
        Image.fromarray(strip).save(path)
        return path
