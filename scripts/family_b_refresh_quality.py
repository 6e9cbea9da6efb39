"""refresh_every quality on the Family-B generation path (hot / noise).

The deblurring sweep (scripts/eval_refresh_quality.py) showed prediction
caching is ~free in quality for conditional Family-A reconstruction.  This
measures the harder case: *unconditional generation from pure noise* with
the interpolation core (sample_and_save_for_fid path,
denoising_diffusion_pytorch.py:821-854), where the x0 prediction genuinely
evolves along the reverse pass.  For K in {1, 2, 4, 8}: proxy-FID
(generated, train set) with the same-distribution floor and noise ceiling
anchors of docs/examples/family_b_generation.md, plus throughput.

Run (real TPU, needs the converged runs/family_b_hot64/model checkpoint):
  python scripts/family_b_refresh_quality.py [out.json]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

T = 200
IMG = 64
N_GEN = 256


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "docs/examples/family_b_refresh_quality.json")

    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.eval.fid import calculate_fid_given_samples, fid_features_fn
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.sampling import sample
    from colddiff.train import Trainer
    from colddiff.utils import apply_in_chunks, retry_compile

    op = get_operator("noise", timesteps=T)
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    ds = SyntheticDataset(IMG, 3, length=256)
    tr = Trainer(d, model, ds, train_batch_size=16, train_num_steps=0,
                 results_folder="/tmp/fb_refresh",
                 load_path="runs/family_b_hot64/model")
    params = jax.device_get(tr.state.ema_params)

    def denoise(x, t):
        if x.shape[0] > 16:
            return apply_in_chunks(
                lambda xc, tc: model.apply(params, xc, tc), 16, x, t)
        return model.apply(params, x, t)

    train_imgs = np.stack([ds[i] for i in range(256)])
    feats = fid_features_fn()
    fid_key = "proxy_fid" if not feats.is_inception else "fid"

    def pfid(a, b):
        return float(calculate_fid_given_samples(
            [np.asarray(a), np.asarray(b)], batch_size=32, features=feats))

    noise = jax.random.normal(jax.random.key(7), (N_GEN, IMG, IMG, 3))
    results = {
        "checkpoint": "runs/family_b_hot64/model",
        "config": f"GaussianNoise (hot) T={T} @{IMG}px, x0_step_down "
                  "fixed-endpoint generation, fp32 sampler",
        "n_generated": N_GEN,
        "extractor": getattr(feats, "name", "inception"),
        "calibration": {
            f"{fid_key}_train_half_vs_half": pfid(train_imgs[:128],
                                                  train_imgs[128:]),
            f"{fid_key}_noise_vs_train": pfid(np.asarray(
                jnp.clip(noise[:128], -1, 1)), train_imgs),
        },
        "sweep": [],
    }
    print(json.dumps(results["calibration"]), flush=True)

    for k in (1, 2, 4, 8):
        fn = jax.jit(lambda nz, rng, k=k: sample(
            d, denoise, nz, x_end=nz, rng=rng, refresh_every=k).img)
        img = retry_compile(lambda: fn(noise, jax.random.key(1)))
        float(jnp.sum(img))
        t0 = time.time()
        img = fn(noise, jax.random.key(1))
        float(jnp.sum(img))
        dt = time.time() - t0
        img = np.asarray(jnp.clip(img, -1, 1))
        entry = {
            "refresh_every": k,
            "img_per_s": round(N_GEN / dt, 2),
            f"{fid_key}_generated_vs_train": pfid(img, train_imgs),
            "gen_mean": float(img.mean()),
            "gen_std": float(img.std()),
        }
        results["sweep"].append(entry)
        print(json.dumps(entry), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
