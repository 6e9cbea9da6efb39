"""Blind "cold generation" record: discrete deblurring + channel-mean GMM.

The paper's most distinctive claim is generation WITHOUT a noise prior:
train a conditional deblurring model with the discrete channel-mean
collapse, fit a GMM to the training set's per-channel means, expand GMM
draws to constant images (the fully-degraded state), break symmetry with
tiny noise, and reverse-sample (reference README.md:87-99;
sample_as_a_mean_blur_torch_gmm, deblurring_diffusion_pytorch.py:1391-1456).

This trains the canonical config scaled to 64px (the 128px reference is
T=300 ks=27; here T=150 ks=15, same Exponential routine + --discrete),
then runs the EvalHarness.gmm_mean_samples path and records
proxy-FID(generated, train) against the same floor/ceiling anchors as the
family-B record.

Run (real TPU):
  python scripts/gmm_generation.py [train_steps] [out.json]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

T = 150
IMG = 64
BATCH = 16
N_GEN = 256


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "docs/examples/gmm_generation.json")

    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.eval.fid import calculate_fid_given_samples, fid_features_fn
    from colddiff.eval.harness import EvalHarness
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.train import Trainer
    from colddiff.utils import enable_compilation_cache, save_image_grid

    enable_compilation_cache()
    op = get_operator("blur", image_size=IMG, timesteps=T,
                      blur_routine="Exponential", kernel_size=15,
                      kernel_std=0.01, discrete=True)
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down", discrete=True)
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    ds = SyntheticDataset(IMG, 3, length=256)

    tr = Trainer(d, model, ds, train_batch_size=BATCH,
                 train_num_steps=train_steps, gradient_accumulate_every=2,
                 save_and_sample_every=10**9,
                 results_folder="runs/gmm_gen64", num_workers=1, seed=0,
                 bf16=True)
    t0 = time.time()
    losses = []
    state = tr.state
    for step in range(train_steps):
        batch, batch2 = tr._next_superbatch()
        state, loss = tr._train_step(state, tr.diffusion, batch, batch2)
        if step % 1000 == 0 or step == train_steps - 1:
            losses.append({"step": step, "loss": float(loss)})
            print(json.dumps(losses[-1]), flush=True)
    train_time = time.time() - t0
    tr.state = state
    tr.step = train_steps
    tr.save()
    params = jax.device_get(state.ema_params)

    train_imgs = np.stack([ds[i] for i in range(256)])
    feats = fid_features_fn()
    fid_key = "proxy_fid" if not feats.is_inception else "fid"

    def pfid(a, b):
        return float(calculate_fid_given_samples(
            [np.asarray(a), np.asarray(b)], batch_size=32, features=feats))

    noise = np.asarray(jax.random.normal(jax.random.key(7),
                                         (128, IMG, IMG, 3)))
    results = {
        "config": f"discrete blur-generation T={T} ks=15 Exponential @{IMG}px,"
                  f" UnetConvNext(64,(1,2,4,8)), bf16 train, seed 0 "
                  "(reference 128px config README.md:87-99 scaled to 64px)",
        "train_steps": train_steps,
        "train_time_s": round(train_time, 1),
        "loss_trajectory": losses,
        "extractor": getattr(feats, "name", "inception"),
        "calibration": {
            f"{fid_key}_train_half_vs_half": pfid(train_imgs[:128],
                                                  train_imgs[128:]),
            f"{fid_key}_noise_vs_train": pfid(np.clip(noise, -1, 1),
                                              train_imgs),
        },
        "gmm": {},
    }
    print(json.dumps(results["calibration"]), flush=True)

    # the reference sweeps symmetry-breaking noise 0.000 (perfect) and 0.002
    # ("broken symmetry", README.md:95-99); GMM cluster 1 is the canonical run
    harness = EvalHarness(d, model, params,
                          results_folder="runs/gmm_gen64/eval")
    for noise_level in (0.0, 0.002):
        t0 = time.time()
        res = harness.gmm_mean_samples(ds, clusters=1, num=N_GEN,
                                       noise_level=noise_level,
                                       rng=jax.random.key(3))
        img = np.asarray(jnp.clip(res.img, -1, 1))
        dt = time.time() - t0
        entry = {
            "noise_level": noise_level,
            f"{fid_key}_generated_vs_train": pfid(img, train_imgs),
            "img_per_s_incl_gmm_fit": round(N_GEN / dt, 2),
            "gen_mean": float(img.mean()), "gen_std": float(img.std()),
            "train_mean": float(train_imgs.mean()),
            "train_std": float(train_imgs.std()),
        }
        results["gmm"][str(noise_level)] = entry
        print(json.dumps(entry), flush=True)
        save_image_grid(
            img[:64],
            f"docs/examples/gmm_generation_noise{noise_level}.png", nrow=8)
    save_image_grid(train_imgs[:64],
                    "docs/examples/gmm_generation_train_set.png", nrow=8)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
