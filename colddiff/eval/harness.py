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
        to_lab: bool = False,
        model_chunk: int = 16,
        endpoint_dataset=None,
        mesh=None,
        refresh_every: int = 1,
        bf16: bool = False,
    ):
        self.d = diffusion
        self.model = model
        # opt-in prediction caching (colddiff/sampling.py:sample): the x0
        # prediction is refreshed every K reverse steps and reused in
        # between, cutting UNet calls ~K-fold (measured 20.1 img/s/chip bf16
        # at K=4 vs 5.5 exact; quality record docs/examples/
        # refresh_quality.json).  K=1 (default) is the exact reference
        # algorithm; every metric artifact stamps the active value so
        # accelerated numbers can never masquerade as exact ones.
        self.refresh_every = int(refresh_every)
        # Mesh-parallel eval (beyond the reference's single-GPU loops): with a
        # ``jax.sharding.Mesh``, params replicate across it, eval batches are
        # sharded along the data axis, and XLA partitions the whole jitted
        # sampling loop -- the manifold sweep and FID generation are
        # embarrassingly parallel, so throughput scales with chips.  The
        # per-shard sub-batch keeps the ``model_chunk`` scheduling fix: the
        # chunk size scales with the mesh so each device still runs B<=16
        # programs.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicate

            params = replicate(params, mesh)
            if model_chunk:
                model_chunk = model_chunk * mesh.size
        # bf16 eval compute (the bench-pinned recipe, 1.42x the fp32
        # forward): cast params once here and inputs at apply time, outputs
        # back to fp32 -- the reverse-scan carry and all degradation math
        # stay fp32 (operators pin Precision.HIGHEST internally)
        self.bf16 = bf16
        if bf16:
            from ..utils import bf16_params

            params = bf16_params(params)
        self.params = params
        # Family-B demixing: degradation endpoints come from a second dataset
        # (demixing_diffusion_pytorch.py:714-730); other ops synthesize their
        # own (noise / constant color) or need none (Family A)
        self.endpoint_dataset = endpoint_dataset
        self.results_folder = Path(results_folder)
        create_folder(self.results_folder)
        self._features = None
        self._fid_weights = fid_weights
        # Lab-space models: dataset rgb -> lab before the diffusion, outputs
        # lab -> rgb before saving/metrics (snowification diffusion.py:287-294,
        # :331-336; the reference FID harness feeds raw rgb into a lab-space
        # forward process -- diffusion.py:1043 -- which we treat as a bug and
        # convert instead)
        self.to_lab = to_lab

        def apply_fn(xc, tc):
            if bf16:
                xc = xc.astype(jnp.bfloat16)
            return model.apply(params, xc, tc).astype(jnp.float32)

        def denoise(x, t):
            # chunk big eval batches: XLA schedules the 128px UNet forward
            # poorly above B~16 (round-1 B=64 cliff; docs/ROADMAP.md) and the
            # manifold harness runs batches of 32
            from ..utils import apply_in_chunks

            if model_chunk and x.shape[0] > model_chunk:
                return apply_in_chunks(apply_fn, model_chunk, x, t)
            return apply_fn(x, t)

        self.denoise = denoise
        # the diffusion (with its operator state) is a jit *argument*, not a
        # closure: randomized operators (fade crops, random snow) change per
        # batch and must reach the reverse loop (see _degrade_start)
        # plain sample(), NOT all_sample(): the manifold harness consumes
        # only xt / direct_recons / img, all of which sample() returns
        # without materializing the two [T, B, H, W, C] trajectory buffers
        # (~2.5 GB at T=200/B=32/128px fp32) that all_sample allocates
        self._sample = jax.jit(
            lambda d, img, x_end, rng: sample(d, self.denoise, img,
                                              x_end=x_end, rng=rng,
                                              refresh_every=self.refresh_every)
        )

    @property
    def features(self):
        if self._features is None:
            self._features = fid_features_fn(self._fid_weights)
        return self._features

    # ------------------------------------------------------------------ #

    def _pre(self, og: jnp.ndarray) -> jnp.ndarray:
        """Dataset space (rgb [-1,1]) -> model space."""
        if self.to_lab:
            from ..ops.image import rgb2lab

            return rgb2lab(og)
        return og

    def _post(self, imgs) -> np.ndarray:
        """Model space -> rgb [-1,1] (applied over any [..., H, W, 3])."""
        if self.to_lab:
            from ..ops.image import lab2rgb

            return np.asarray(lab2rgb(jnp.asarray(imgs)))
        return np.asarray(imgs)

    def _post_result(self, res):
        """Convert every image field of a SampleResult to dataset space
        (lab2rgb under ``to_lab``; identity otherwise) so callers can save
        or measure any field without knowing the model's color space."""
        if not self.to_lab:
            return res
        from ..ops.image import lab2rgb

        return type(res)(*(None if f is None else lab2rgb(jnp.asarray(f))
                           for f in res))

    def _sample_x_end(self, rng, og):
        """Endpoint for Family-B ops: the operator's own synthesis when it
        has one, else images from ``endpoint_dataset`` (animorphosis)."""
        x_end = self.d.op.sample_x_end(rng, og)
        if x_end is None and getattr(self.d.op, "requires_x_end", False):
            if self.endpoint_dataset is None:
                raise ValueError(
                    "this degradation interpolates toward a second dataset; "
                    "construct EvalHarness(endpoint_dataset=...) "
                    "(CLI: --data_path_2)")
            n = og.shape[0]
            idx = np.asarray(
                jax.random.randint(rng, (n,), 0, len(self.endpoint_dataset)))
            x_end = self._pre(jnp.asarray(
                np.stack([self.endpoint_dataset[int(i)] for i in idx])))
        return x_end

    def _place(self, x):
        """Shard a batch-major array over the eval mesh (identity without
        one).  Non-divisible batches stay unsharded (still correct, just
        unpartitioned) -- hot sweeps pad first via :meth:`_mesh_pad`."""
        if self.mesh is None or x is None or x.shape[0] % self.mesh.size:
            return x
        from ..parallel import shard_batch

        return shard_batch(x, self.mesh)

    def _mesh_pad(self, x):
        """Pad the batch dim to a mesh multiple (repeat last row); returns
        ``(padded, real_n)``.  Callers slice outputs back to ``real_n``."""
        n = x.shape[0]
        if self.mesh is None:
            return x, n
        pad = (-n) % self.mesh.size
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        return x, n

    def _degrade_start(self, og, rng):
        end_rng, op_rng = jax.random.split(rng)
        x_end = self._sample_x_end(end_rng, og)
        op = self.d.op
        if hasattr(op, "randomize"):
            op = op.randomize(op_rng, og.shape[0])
        if self.mesh is not None:
            from ..parallel import replicate

            op = replicate(op, self.mesh)
        x_end = self._place(x_end)
        start = prepare_start(
            self.d.replace(op=op), self._place(og), x_end=x_end, op_rng=None
        )
        return start, x_end, op

    def test_from_data(self, batch, milestone: int = 0, rng=None, fps: int = 5):
        """Full trajectory dump for one batch (PNG grids + GIFs)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        start, x_end, op = self._degrade_start(self._pre(og), rng)
        res = all_sample(self.d.replace(op=op), self.denoise, start, x_end=x_end,
                         rng=rng, refresh_every=self.refresh_every)
        x0s = self._post(res.x0_trajectory)
        xts = self._post(res.xt_trajectory)
        root = self.results_folder
        save_image_grid(np.asarray(og), root / f"og-{milestone}.png")
        for k in range(x0s.shape[0]):
            save_image_grid(x0s[k], root / f"x0-{milestone}-{k}.png")
            save_image_grid(xts[k], root / f"xt-{milestone}-{k}.png")
        save_gif(list(x0s), root / f"x0-{milestone}.gif", fps=fps, titles=True)
        save_gif(list(xts), root / f"xt-{milestone}.gif", fps=fps, titles=True)
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
        start, x_end, op = self._degrade_start(self._pre(og), rng)
        res = sample(self.d.replace(op=op), self.denoise, start, x_end=x_end,
                     rng=rng, refresh_every=self.refresh_every)
        root = self.results_folder
        for name, imgs in [("og", og), ("xt", self._post(res.xt)),
                           ("direct_recons", self._post(res.direct_recons)),
                           ("recon", self._post(res.img))]:
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
        """Pure forward degradation, no model (deblur ``opt``, :595-607).

        Input and output are dataset-space rgb; the degradation itself runs
        in model space (lab under ``to_lab``), like every other method."""
        rng = rng if rng is not None else jax.random.key(0)
        og = self._pre(jnp.asarray(batch))
        steps = t if t is not None else self.d.num_timesteps
        end_rng, op_rng = jax.random.split(rng)
        x_end = self._sample_x_end(end_rng, og)
        return self._post(
            prepare_start(self.d, og, steps, x_end=x_end, op_rng=op_rng))

    # ------------------------------------------------------------------ #

    def fid_distance_decrease_from_manifold(
        self, dataset, start: int = 0, end: int = 1000, batch_size: int = 32,
        rng=None,
    ) -> dict:
        """The paper's Table harness: prints and returns the 3x3 metric grid.

        Images wider than 256px are nearest-downscaled to 64 before the
        metrics, as the snowification harness does
        (snowification/diffusion/diffusion.py:1050-1054)."""
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

        # loud extractor identity: fallback numbers must never be mistaken
        # for real Inception-FID, so they get ``proxy_fid_*`` keys
        extractor = getattr(self.features, "name",
                            "inception" if getattr(self.features, "is_inception",
                                                   False) else "fallback")
        fid_key = "fid" if self.features.is_inception else "proxy_fid"
        # stamp the active prediction-caching factor: metrics produced by an
        # accelerated (refresh_every > 1) run must never be mistaken for the
        # exact reference algorithm's
        out = {"extractor": extractor, "refresh_every": self.refresh_every,
               "bf16": self.bf16}
        # the reference unnormalizes to [0,1] before RMSE/SSIM
        # (deblurring_diffusion_pytorch.py:1619-1623, :1679-1699); FID takes
        # the [-1,1] convention directly (the extractor owns normalization)
        og01 = jnp.asarray((og + 1.0) * 0.5)
        for name, other in [("degraded", bl), ("sampled", sm), ("direct", dr)]:
            out[f"{fid_key}_{name}"] = calculate_fid_given_samples(
                [og, other], features=self.features
            )
            other01 = jnp.asarray((other + 1.0) * 0.5)
            out[f"rmse_{name}"] = float(rmse(og01, other01))
            out[f"ssim_{name}"] = float(ssim(og01, other01, data_range=1.0))
        out[f"{fid_key}_improvement"] = (
            out[f"{fid_key}_degraded"] - out[f"{fid_key}_sampled"]
        )
        for k, v in out.items():
            print(f"{k}: {v:.5f}" if isinstance(v, float) else f"{k}: {v}")
        return out

    def _manifold_batch(self, batch, rng, originals, degradeds, sampleds, directs):
        og = jnp.asarray(batch)
        padded, n = self._mesh_pad(self._pre(og))
        start, x_end, op = self._degrade_start(padded, rng)
        res = self._sample(self.d.replace(op=op), start, x_end, rng)
        rows = [np.asarray(og), self._post(res.xt)[:n],
                self._post(res.img)[:n], self._post(res.direct_recons)[:n]]
        if rows[0].shape[1] > 256:
            # torch F.interpolate(size=64) default mode='nearest'
            # (snowification diffusion.py:1050-1054): src = floor(i * scale)
            h = rows[0].shape[1]
            idx = np.minimum((np.arange(64) * (h / 64)).astype(int), h - 1)
            rows = [r[:, idx][:, :, idx] for r in rows]
        for acc, r in zip((originals, degradeds, sampleds, directs), rows):
            acc.append(r)

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
            lambda noise, r: sample(self.d, self.denoise, noise, x_end=noise,
                                    rng=r, refresh_every=self.refresh_every)
        )
        ep_idx = 0
        while count < num:
            rng, nrng, srng = jax.random.split(rng, 3)
            if endpoint_dataset is not None:
                idxs = [(ep_idx + i) % len(endpoint_dataset)
                        for i in range(batch_size)]
                ep_idx += batch_size
                noise = self._pre(jnp.asarray(
                    np.stack([endpoint_dataset[i] for i in idxs])
                ))
            else:
                # unit-normal noise is a dataset-space (rgb [-1,1]-scale)
                # distribution; route it through _pre so a lab-space model
                # starts from the same distribution as the endpoint-dataset
                # branch rather than raw N(0,1) in lab coordinates
                noise = self._pre(jax.random.normal(
                    nrng, (batch_size, s, s, self.d.channels)
                ))
            res = sample_jit(self._place(jnp.asarray(noise)), srng)
            img = self._post(res.img)
            imgs = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
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
        # per-image channel means in MODEL space (lab means != rgb means
        # converted, so _pre comes before the reduction), batched in chunks
        means = np.concatenate([
            np.asarray(self._pre(jnp.asarray(np.stack(
                [dataset[i] for i in range(lo, min(lo + 256, n_fit))]
            ))).mean(axis=(1, 2)))
            for lo in range(0, n_fit, 256)
        ])
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
        return self._post_result(sample(self.d, self.denoise, img,
                                        rng=samp_rng,
                                        refresh_every=self.refresh_every))

    # ------------------------------------------------------------------ #

    def gmm_blur_samples(
        self, dataset, clusters: int = 10, num: int = 64, sample_at: int = None,
        gmm_res: int = 16, noise_level: float = 0.0, rng=None, max_fit: int = 2000,
    ):
        """Blind generation via GMM over *degraded low-res images* at level
        ``sample_at`` (sample_as_a_blur_torch_gmm, deblur :1514-1564):
        degrade train images to sample_at, downsample, flatten, fit GMM,
        sample, upsample, continue the degradation chain sample_at -> T
        (sample_from_blur with start=sample_at, :1551), reverse from T."""
        rng = rng if rng is not None else jax.random.key(0)
        T = self.d.num_timesteps
        sample_at = sample_at if sample_at is not None else T
        s = self.d.image_size
        n_fit = min(len(dataset), max_fit)
        imgs = self._pre(jnp.asarray(np.stack([dataset[i] for i in range(n_fit)])))
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
        if noise_level > 0:
            start = start + noise_level * jax.random.normal(n_rng, start.shape)
        xt = self.d.op.degrade_range(start, sample_at, T)
        return self._post_result(sample(self.d, self.denoise, xt,
                                        rng=samp_rng,
                                        refresh_every=self.refresh_every))

    # ------------------------------------------------------------------ #
    # Family-B vector-GMM blind generation + data-as-x_T sampling

    def _fit_vector_gmm(self, dataset, siz, clusters, rng, max_fit):
        """Fit a GMM to bilinear-downsized flattened *clean* dataset images
        (the shared preamble of sample_as_a_vector_gmm*,
        denoising_diffusion_pytorch.py:1091-1117)."""
        n_fit = min(len(dataset), max_fit)
        imgs = self._pre(jnp.asarray(np.stack([dataset[i] for i in range(n_fit)])))
        c = imgs.shape[-1]
        low = jax.image.resize(
            imgs, (n_fit, siz, siz, c), method="bilinear"
        ).reshape(n_fit, -1)
        return fit_gmm(low, clusters, rng), c

    def _vector_gmm_starts(self, gmm, rng, num, siz, c):
        """GMM draws -> [num, image_size, image_size, c] bilinear-upsized x_T
        (denoising_diffusion_pytorch.py:1119-1125)."""
        s = self.d.image_size
        draws = sample_gmm(gmm, rng, num).reshape(num, siz, siz, c)
        return jax.image.resize(draws, (num, s, s, c), method="bilinear")

    def gmm_vector_samples(self, dataset, siz: int = 64, clusters: int = 10,
                           num: int = 100, rng=None, max_fit: int = 2000,
                           save: bool = True, traj_stride: int = 1):
        """Blind generation via GMM over downsized clean train images
        (sample_as_a_vector_gmm, denoising_diffusion_pytorch.py:1091-1158;
        demixing :1080, defading-generation :1148): the upsized GMM draw is
        x_T and the endpoint is estimated per reverse step (the reference's
        Family-B all_sample always calls get_x2_bar_from_xt, :495 -- matched
        here by x_end=None).  Saves the og grid + x0/xt trajectory GIFs."""
        rng = rng if rng is not None else jax.random.key(0)
        f_rng, s_rng, samp_rng = jax.random.split(rng, 3)
        gmm, c = self._fit_vector_gmm(dataset, siz, clusters, f_rng, max_fit)
        start = self._vector_gmm_starts(gmm, s_rng, num, siz, c)
        res = self._post_result(all_sample(self.d, self.denoise, start,
                                           rng=samp_rng,
                                           traj_stride=traj_stride,
                                           refresh_every=self.refresh_every))
        if save:
            tag = f"{siz}-{clusters}-vec"
            save_image_grid(self._post(start),
                            self.results_folder / f"og-{tag}.png")
            x0s = [np.asarray(f) for f in res.x0_trajectory]
            xts = [np.asarray(f) for f in res.xt_trajectory]
            save_gif(x0s + [np.asarray(res.img)],
                     self.results_folder / f"Gif-{tag}-x0.gif", titles=True)
            save_gif(xts + [np.asarray(res.img)],
                     self.results_folder / f"Gif-{tag}-xt.gif", titles=True)
        return res

    def gmm_vector_samples_and_save(self, dataset, siz: int = 64,
                                    clusters: int = 10, n_sample: int = 1000,
                                    batch_size: int = 100, rng=None,
                                    max_fit: int = 2000, out_dir=None) -> Path:
        """PNG-dump variant for external FID: fit once, then draw/reverse in
        batches and save each final reconstruction as sample-x0-<cnt>.png
        (sample_as_a_vector_gmm_and_save, denoising_diffusion_pytorch.py:
        1161-1213; the pycave-backed sample_as_a_vector_pytorch_gmm_and_save
        :1215-1286 differs only in GMM backend -- one JAX EM serves both).
        Output dir mirrors the reference's ``<results>_<siz>_<clusters>/``."""
        rng = rng if rng is not None else jax.random.key(0)
        f_rng, rng = jax.random.split(rng)
        gmm, c = self._fit_vector_gmm(dataset, siz, clusters, f_rng, max_fit)
        out = Path(out_dir) if out_dir is not None else (
            self.results_folder.with_name(
                f"{self.results_folder.name}_{siz}_{clusters}")
        )
        create_folder(out)
        sample_jit = jax.jit(
            lambda img, r: sample(self.d, self.denoise, img, rng=r,
                                  refresh_every=self.refresh_every).img
        )
        cnt = 0
        while cnt < n_sample:
            rng, d_rng, s_rng = jax.random.split(rng, 3)
            start = self._vector_gmm_starts(gmm, d_rng, batch_size, siz, c)
            imgs = self._post(sample_jit(start, s_rng))
            for i in range(imgs.shape[0]):
                if cnt >= n_sample:
                    break
                self._save_png(imgs[i], out / f"sample-x0-{cnt}.png")
                cnt += 1
        return out

    def gmm_from_blur_samples_and_save(self, dataset, start: int = 0,
                                       end: Optional[int] = 1000,
                                       siz: int = 64, clusters: int = 10,
                                       n_sample: int = 1000,
                                       batch_size: int = 100,
                                       sample_at: Optional[int] = None,
                                       rng=None, out_dir=None) -> Path:
        """Fit a GMM at the half-degraded level and reverse-sample from it
        (sample_as_a_vector_from_blur_pytorch_gmm_and_save,
        denoising_diffusion_pytorch.py:1288-1360).  The reference method is
        dead as written -- it calls ``opt`` and ``all_sample_from_blur``,
        neither of which exists on the hot GaussianDiffusion -- so this
        implements its stated intent: degrade the dataset to
        ``sample_at = T // 2``, bilinear-downsize + flatten + fit a GMM
        there, then treat upsized GMM draws as x_{sample_at} and reverse the
        remaining steps (endpoint estimated per step, like the reference's
        Family-B all_sample).  Works for Family A too (degrade needs no
        endpoint there).  Saves ``sample-x0-<cnt>.png`` finals and
        ``sample-<cnt>.png`` GMM starts in the reference's mirrored
        ``<results>_{siz}_{clusters}_{sample_at}`` trees."""
        rng = rng if rng is not None else jax.random.key(0)
        T = self.d.num_timesteps
        sample_at = T // 2 if sample_at is None else int(sample_at)
        s = self.d.image_size
        last = len(dataset) - 1 if end is None else min(end, len(dataset) - 1)
        idxs = list(range(start + 1, last + 1))
        lows = []
        c = None
        for lo in range(0, len(idxs), 256):
            chunk = self._pre(jnp.asarray(np.stack(
                [dataset[i] for i in idxs[lo:lo + 256]])))
            rng, e_rng = jax.random.split(rng)
            x_end = self._sample_x_end(e_rng, chunk)
            lvl = jnp.full((chunk.shape[0],), sample_at, dtype=jnp.int32)
            deg = self.d.op.degrade(chunk, lvl, x_end=x_end, og=chunk)
            c = deg.shape[-1]
            lows.append(np.asarray(jax.image.resize(
                deg, (deg.shape[0], siz, siz, c), method="bilinear"
            ).reshape(deg.shape[0], -1)))
        f_rng, rng = jax.random.split(rng)
        gmm = fit_gmm(jnp.asarray(np.concatenate(lows)), clusters, f_rng)
        base = Path(out_dir) if out_dir is not None else self.results_folder
        out = base.with_name(f"{base.name}_{siz}_{clusters}_{sample_at}")
        out_gmm = base.with_name(f"{base.name}_gmm_{siz}_{clusters}_{sample_at}")
        create_folder(out)
        create_folder(out_gmm)
        sample_jit = jax.jit(
            lambda img, r: sample(self.d, self.denoise, img, sample_at,
                                  rng=r, refresh_every=self.refresh_every).img
        )
        cnt = 0
        while cnt < n_sample:
            rng, d_rng, s_rng = jax.random.split(rng, 3)
            draws = sample_gmm(gmm, d_rng, batch_size).reshape(
                batch_size, siz, siz, c)
            xt = jax.image.resize(draws, (batch_size, s, s, c),
                                  method="bilinear")
            imgs = self._post(sample_jit(xt, s_rng))
            starts = self._post(xt)
            for i in range(imgs.shape[0]):
                if cnt >= n_sample:
                    break
                self._save_png(imgs[i], out / f"sample-x0-{cnt}.png")
                self._save_png(starts[i], out_gmm / f"sample-{cnt}.png")
                cnt += 1
        return out

    def sample_from_data_save(self, dataset, start: int = 0,
                              end: Optional[int] = 1000, batch_size: int = 32,
                              rng=None, out_dir=None) -> Path:
        """Reverse-sample clean dataset images treated directly as x_T and
        dump the final reconstructions as individual PNGs
        (sample_from_data_save, denoising_diffusion_pytorch.py:1362-1395;
        demixing :1351, defading-generation :1419).  Keeps the reference's
        slice semantics: images with start < idx <= end."""
        rng = rng if rng is not None else jax.random.key(0)
        last = len(dataset) - 1 if end is None else min(end, len(dataset) - 1)
        idxs = range(start + 1, last + 1)
        out = Path(out_dir) if out_dir is not None else (
            self.results_folder / "sample_from_data")
        create_folder(out)
        sample_jit = jax.jit(
            lambda img, r: sample(self.d, self.denoise, img, rng=r,
                                  refresh_every=self.refresh_every).img
        )
        cnt = 0
        batch = []

        def flush(batch, cnt, rng):
            # pad a ragged tail to the compiled batch size; save only the
            # real images
            n = len(batch)
            batch = batch + [batch[-1]] * (batch_size - n)
            imgs = self._post(
                sample_jit(self._place(jnp.asarray(np.stack(batch))), rng))
            for i in range(n):
                self._save_png(imgs[i], out / f"sample-x0-{cnt}.png")
                cnt += 1
            return cnt

        for idx in idxs:
            batch.append(self._pre(jnp.asarray(dataset[idx])))
            if len(batch) == batch_size:
                rng, s_rng = jax.random.split(rng)
                cnt = flush(batch, cnt, s_rng)
                batch = []
        if batch:
            rng, s_rng = jax.random.split(rng)
            cnt = flush(batch, cnt, s_rng)
        return out

    def test_from_data_save_results(self, dataset, num: Optional[int] = None,
                                    batch_size: int = 32, rng=None) -> Path:
        """Per-image PNG trees of original / degraded / direct-recon / final
        reconstruction over the eval set (test_from_data_save_results,
        defading_diffusion_gaussian.py:1146-1244; --test_type
        test_save_images).  Folders mirror the reference's
        ``<results>_{orig,blur,d_deblur,deblur}``."""
        rng = rng if rng is not None else jax.random.key(0)
        n = min(num or len(dataset), len(dataset))
        dirs = {}
        for tag in ("orig", "blur", "d_deblur", "deblur"):
            d = self.results_folder.with_name(f"{self.results_folder.name}_{tag}")
            create_folder(d)
            dirs[tag] = d
        cnt = 0
        for lo in range(0, n, batch_size):
            og = jnp.asarray(
                np.stack([dataset[i] for i in range(lo, min(lo + batch_size, n))])
            )
            rng, b_rng = jax.random.split(rng)
            start, x_end, op = self._degrade_start(self._pre(og), b_rng)
            res = sample(self.d.replace(op=op), self.denoise, start,
                         x_end=x_end, rng=b_rng,
                         refresh_every=self.refresh_every)
            rows = {
                "orig": np.asarray(og),
                "blur": self._post(res.xt),
                "d_deblur": self._post(res.direct_recons),
                "deblur": self._post(res.img),
            }
            for i in range(og.shape[0]):
                for tag, imgs in rows.items():
                    self._save_png(imgs[i], dirs[tag] / f"{cnt}.png")
                cnt += 1
        return self.results_folder

    def forward_and_backward(self, batch, rng=None, prefix: str = "fb"):
        """Forward degradation frames + reverse frames for figure strips
        (denoising_diffusion_pytorch.py:437-478; deblur :691-861)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        og_m = self._pre(og)
        b = og.shape[0]
        T = self.d.num_timesteps
        end_rng, _ = jax.random.split(rng)
        x_end = self._sample_x_end(end_rng, og_m)
        # forward trajectory: D(og, n) for every level (model space; frames
        # converted back to rgb for the GIFs)
        fwd_m = [og_m] + [
            self.d.op.degrade(og_m, jnp.full((b,), n), x_end=x_end, og=og_m)
            for n in range(1, T + 1)
        ]
        res = self._post_result(all_sample(self.d, self.denoise, fwd_m[-1],
                                           x_end=x_end, rng=rng,
                                           refresh_every=self.refresh_every))
        fwd = [self._post(f) for f in fwd_m]
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
        res = self._run_all_sample(og, rng)
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

    # ------------------------------------------------------------------ #
    # named paper-figure generators (reference --test_type surface)

    def _run_all_sample(self, og, rng, s_times=None, routine=None):
        """``og`` is dataset-space rgb; the result's fields are converted
        back to dataset space (to_lab-safe for every figure generator)."""
        d = self.d if routine is None else self.d.replace(sampling_routine=routine)
        start, x_end, op = self._degrade_start(self._pre(og), rng)
        return self._post_result(all_sample(d.replace(op=op), self.denoise,
                                            start, t=s_times, x_end=x_end,
                                            rng=rng,
                                            refresh_every=self.refresh_every))

    @staticmethod
    def _panel(imgs, pad: int = 10, color: float = -1.0) -> np.ndarray:
        """hconcat [H,W,C] images with a uniform border (cv2.copyMakeBorder +
        hconcat in the reference; color -1 = black, +1 = white)."""
        out = []
        for im in imgs:
            im = np.asarray(im)
            if im.shape[-1] == 1:
                im = np.repeat(im, 3, axis=-1)
            out.append(np.pad(im, ((pad, pad), (pad, pad), (0, 0)),
                              constant_values=color))
        return np.concatenate(out, axis=1)

    @staticmethod
    def _save_png(img, path):
        from PIL import Image

        img = ((np.clip(np.asarray(img), -1, 1) + 1) * 127.5).astype(np.uint8)
        if img.shape[-1] == 1:
            img = img[..., 0]
        Image.fromarray(img).save(path)
        return path

    def paper_invert_section_images(self, batch, s_times=None, rng=None):
        """Per-sample [degraded | direct recon | sampled recon | original]
        panels with 10px black borders
        (denoising_diffusion_pytorch.py:910-956)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        res = self._run_all_sample(og, rng, s_times)
        root = self.results_folder
        paths = []
        for cnt in range(max(og.shape[0] // 3, 1)):
            parts = {
                "blurry_image": res.xt_trajectory[0][cnt],
                "direct_recons": res.x0_trajectory[0][cnt],
                "sampling_recons": res.x0_trajectory[-1][cnt],
                "original": og[cnt],
            }
            for name, im in parts.items():
                self._save_png(im, root / f"{name}_{cnt}.png")
            paths.append(self._save_png(
                self._panel(list(parts.values()), color=-1.0) ,
                root / f"all_{cnt}.png"))
        return paths

    def paper_showing_diffusion_images(self, batch, s_times=None, rng=None,
                                       to_show=(0, 2, 4, 8, 16, 32, 64, 80,
                                                88, 92, 96, 98, 99)):
        """Per-sample reverse-trajectory strips at fixed step indices + the
        final reconstruction (denoising_diffusion_pytorch.py:957-996)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        res = self._run_all_sample(og, rng, s_times)
        xts = np.asarray(res.xt_trajectory)
        steps = xts.shape[0]
        pick = [j for j in to_show if j < steps]
        root = self.results_folder
        paths = []
        for cnt in range(og.shape[0]):
            frames = [xts[j, cnt] for j in pick]
            frames.append(np.asarray(res.x0_trajectory[-1][cnt]))
            paths.append(self._save_png(self._panel(frames, pad=0),
                                        root / f"all_{cnt}.png"))
        return paths

    def paper_showing_diffusion_images_diff(
        self, batch, s_times=None, rng=None,
        to_show=(0, 1, 2, 4, 8, 10, 12, 16, 17, 18, 19, 20),
    ):
        """Algorithm-1 vs Algorithm-2 trajectory strips for sample 0
        (denoising_diffusion_pytorch.py:997-1049 all_sample_both_sample)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        root = self.results_folder
        paths = []
        for alg, routine in (("alg2", "x0_step_down"), ("alg1", "default")):
            res = self._run_all_sample(og, rng, s_times, routine=routine)
            xts = np.asarray(res.xt_trajectory)
            pick = [j for j in to_show if j < xts.shape[0]]
            frames = [xts[j, 0] for j in pick]
            frames.append(np.asarray(res.x0_trajectory[-1][0]))
            paths.append(self._save_png(self._panel(frames, pad=0),
                                        root / f"all_{alg}_0.png"))
        return paths

    def paper_showing_sampling_diff_images(self, batch, s_times=None, rng=None):
        """Per-sample [original | alg1 final | alg2 final] white-bordered
        panels (denoising_diffusion_pytorch.py:1051-1090)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        res2 = self._run_all_sample(og, rng, s_times, routine="x0_step_down")
        res1 = self._run_all_sample(og, rng, s_times, routine="default")
        root = self.results_folder
        paths = []
        for cnt in range(og.shape[0]):
            self._save_png(res1.x0_trajectory[-1][cnt],
                           root / f"x0_alg1_{cnt}.png")
            self._save_png(res2.x0_trajectory[-1][cnt],
                           root / f"x0_alg2_{cnt}.png")
            self._save_png(og[cnt], root / f"og_img_{cnt}.png")
            panel = self._panel(
                [og[cnt], res1.x0_trajectory[-1][cnt],
                 res2.x0_trajectory[-1][cnt]], color=1.0)
            paths.append(self._save_png(panel, root / f"all_{cnt}.png"))
        return paths

    def paper_cover_page_both_sampling(self, batch, n_frames: int = 8,
                                       rng=None):
        """Forward strip + one reverse strip per sampling algorithm
        (deblur paper_showing_diffusion_images_cover_page_both_sampling,
        :1269-1337 via forward_and_backward_2)."""
        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch)
        og_m = self._pre(og)
        b = og.shape[0]
        T = self.d.num_timesteps
        end_rng, _ = jax.random.split(rng)
        x_end = self._sample_x_end(end_rng, og_m)
        fwd_m = [og_m] + [
            self.d.op.degrade(og_m, jnp.full((b,), n), x_end=x_end, og=og_m)
            for n in range(1, T + 1)
        ]
        fwd = [self._post(f) for f in fwd_m]
        root = self.results_folder
        pick = np.linspace(0, T, min(n_frames, T + 1)).astype(int)
        paths = []
        for alg, routine in (("1", "default"), ("2", "x0_step_down")):
            d = self.d.replace(sampling_routine=routine)
            res = self._post_result(all_sample(d, self.denoise, fwd_m[-1],
                                               x_end=x_end, rng=rng,
                                               refresh_every=self.refresh_every))
            bwd = [np.asarray(f) for f in res.xt_trajectory]
            bwd.append(np.asarray(res.img))
            for k in range(b):
                frames = [fwd[j][k] for j in pick]
                frames += [bwd[j][k] for j in pick[1:]]
                paths.append(self._save_png(
                    self._panel(frames, pad=0), root / f"all_{alg}_{k}.png"))
        return paths

    def sample_from_blur(self, img, start: int = 0, rng=None,
                         prefix: str = "from_blur"):
        """Continue the degradation chain from level ``start`` to T on an
        already-degraded input, then reverse-sample
        (GaussianDiffusion.sample_from_blur, deblur :863-925; Trainer wiring
        sample_as_a_blur_torch_gmm :1551)."""
        rng = rng if rng is not None else jax.random.key(0)
        img = jnp.asarray(img)
        T = self.d.num_timesteps
        xt = self.d.op.degrade_range(self._pre(img), start, T)
        res = self._post_result(sample(self.d, self.denoise, xt, rng=rng,
                                       refresh_every=self.refresh_every))
        root = self.results_folder
        save_image_grid(np.asarray(img), root / f"sample-og-{prefix}.png")
        save_image_grid(np.asarray(res.xt), root / f"sample-xt-{prefix}.png")
        save_image_grid(np.asarray(res.direct_recons),
                        root / f"sample-direct_recons-{prefix}.png")
        save_image_grid(np.asarray(res.img), root / f"sample-recon-{prefix}.png")
        return res

    def paper_trajectory_strip(self, batch, n_frames: int = 8, rng=None,
                               name: str = "trajectory_strip.png"):
        """Horizontal forward+reverse trajectory strip (paper figures)."""
        from PIL import Image

        rng = rng if rng is not None else jax.random.key(0)
        og = jnp.asarray(batch[:1])
        res = self._run_all_sample(og, rng)
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
