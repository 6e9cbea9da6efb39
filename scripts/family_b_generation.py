"""Family-B (hot / interpolation-to-noise) generation quality record.

The conditional cold-diffusion claim already carries a converged record
(docs/examples/convergence.md, blur). This closes the other headline
workflow: *unconditional generation from noise* with the interpolation core
and DDIM-style endpoint estimation (the reference's
``sample_and_save_for_fid`` path, denoising_diffusion_pytorch.py:821-854,
with ``gen_sample`` :383-434).

Train the GaussianNoise operator on the synthetic set to convergence, then
generate from pure noise with both routines ('x0_step_down' fixed endpoint
vs 'ddim' per-step endpoint estimation) and record proxy-FID(generated,
train set), calibrated against proxy-FID(train half, train half) as the
same-distribution floor and proxy-FID(noise, train) as the far ceiling.

Run (real TPU):
  python scripts/family_b_generation.py [train_steps] [out.json]

Writes docs/examples/family_b_generation.json and two sample grids.
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
BATCH = 16
N_GEN = 256


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "docs/examples/family_b_generation.json")

    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.eval.fid import calculate_fid_given_samples, fid_features_fn
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.sampling import sample
    from colddiff.train import Trainer
    from colddiff.utils import apply_in_chunks, save_image_grid

    op = get_operator("noise", timesteps=T)
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    ds = SyntheticDataset(IMG, 3, length=256)

    tr = Trainer(
        d, model, ds,
        train_batch_size=BATCH,
        train_num_steps=train_steps,
        gradient_accumulate_every=2,
        save_and_sample_every=10**9,
        results_folder="runs/family_b_hot64",
        num_workers=1,
        seed=0,
    )
    t0 = time.time()
    losses = []
    state = tr.state
    for step in range(train_steps):
        batch, batch2 = tr._next_superbatch()
        state, loss = tr._train_step(state, tr.diffusion, batch, batch2)
        if step % 500 == 0 or step == train_steps - 1:
            losses.append({"step": step, "loss": float(loss)})
            print(json.dumps(losses[-1]), flush=True)
    train_time = time.time() - t0
    tr.state = state
    tr.step = train_steps
    tr.save()
    params = jax.device_get(state.ema_params)

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
        "config": f"GaussianNoise (hot) T={T} @{IMG}px, "
                  f"UnetConvNext(64,(1,2,4,8)), B={BATCH} accum x2, seed 0",
        "train_steps": train_steps,
        "train_time_s": round(train_time, 1),
        "loss_trajectory": losses,
        "extractor": getattr(feats, "name", "inception"),
        "calibration": {
            f"{fid_key}_train_half_vs_half": pfid(train_imgs[:128],
                                                  train_imgs[128:]),
            f"{fid_key}_noise_vs_train": pfid(np.asarray(
                jnp.clip(noise[:128], -1, 1)), train_imgs),
        },
        "routines": {},
    }
    print(json.dumps(results["calibration"]), flush=True)

    for routine in ("x0_step_down", "ddim"):
        dr = d.replace(sampling_routine=routine)

        def gen(nz, rng, dr=dr, fixed=routine == "x0_step_down"):
            return sample(dr, denoise, nz,
                          x_end=nz if fixed else None, rng=rng).img

        fn = jax.jit(lambda nz, rng, g=gen: g(nz, rng))
        img = fn(noise, jax.random.key(1))
        float(jnp.sum(img))
        t0 = time.time()
        img = fn(noise, jax.random.key(1))
        float(jnp.sum(img))
        dt = time.time() - t0
        img = np.asarray(jnp.clip(img, -1, 1))
        entry = {
            f"{fid_key}_generated_vs_train": pfid(img, train_imgs),
            "img_per_s": round(N_GEN / dt, 2),
            "gen_mean": float(img.mean()),
            "gen_std": float(img.std()),
            "train_mean": float(train_imgs.mean()),
            "train_std": float(train_imgs.std()),
        }
        results["routines"][routine] = entry
        print(json.dumps({routine: entry}), flush=True)
        save_image_grid(img[:64],
                        f"docs/examples/family_b_{routine}_samples.png",
                        nrow=8)
    save_image_grid(train_imgs[:64],
                    "docs/examples/family_b_train_set.png", nrow=8)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
