"""Quality cost of the opt-in ``refresh_every`` prediction cache.

``refresh_every=K`` reuses the UNet's x0 prediction for K reverse steps
(colddiff/sampling.py), cutting sampler cost ~K-fold. This measures what
that buys and what it costs on a *converged* checkpoint: RMSE / SSIM /
proxy-FID of the sampled reconstructions vs the originals, for K in
{1, 2, 4, 8} fp32 plus K in {1, 4, 8} under the pinned bf16-compute
recipe, on the canonical 128px blur config (the convergence run of
docs/examples/convergence.md).

Run (real TPU):
  python scripts/refresh_quality.py runs/convergence_blur128/model \
      [out.json] [n_images]

Writes docs/examples/refresh_quality.json by default; bench.py quotes it
next to the refresh_every throughput number (VERDICT round-2 item 2: an
acceleration claim must carry its quality cost).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/convergence_blur128/model"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "docs/examples/refresh_quality.json"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.eval.fid import calculate_fid_given_samples, fid_features_fn
    from colddiff.eval.metrics import rmse, ssim
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.sampling import prepare_start, sample
    from colddiff.train import Trainer
    from colddiff.utils import apply_in_chunks

    # canonical convergence config (see docs/examples/convergence.md)
    op = get_operator("blur", image_size=128, timesteps=200,
                      blur_routine="Exponential_reflect", kernel_size=15,
                      kernel_std=0.01)
    d = ColdDiffusion(op=op, image_size=128, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    ds = SyntheticDataset(128, 3, length=max(n, 64))
    tr = Trainer(d, model, ds, train_batch_size=16, train_num_steps=0,
                 results_folder="/tmp/refresh_quality", load_path=ckpt)
    params = jax.device_get(tr.state.ema_params)

    og = jnp.asarray(np.stack([ds[i] for i in range(n)]))

    def denoise(x, t):
        if x.shape[0] > 16:
            return apply_in_chunks(
                lambda xc, tc: model.apply(params, xc, tc), 16, x, t)
        return model.apply(params, x, t)

    start = prepare_start(d, og, op_rng=None)
    feats = fid_features_fn()
    results = {"checkpoint": ckpt, "n_images": n, "timesteps": 200,
               "extractor": getattr(feats, "name", "inception"),
               "degraded": {
                   "rmse": float(rmse((og + 1) / 2,
                                      (jnp.clip(start, -1, 1) + 1) / 2)),
                   # SSIM on [0,1]-unnormalized images with data_range=1,
                   # matching harness.fid_distance_decrease_from_manifold
                   # and the reference's ssim(a, b, data_range=1) call.
                   "ssim": float(ssim((og + 1) / 2,
                                      (jnp.clip(start, -1, 1) + 1) / 2)),
               },
               "sweep": []}

    for k in (1, 2, 4, 8):
        fn = jax.jit(lambda img, rng, k=k: sample(
            d, denoise, img, rng=rng, refresh_every=k).img)
        img = fn(start, jax.random.key(0))
        float(jnp.sum(img))  # force through the axon tunnel
        t0 = time.time()
        img = fn(start, jax.random.key(0))
        float(jnp.sum(img))
        dt = time.time() - t0
        img = jnp.clip(img, -1, 1)
        proxy_fid = calculate_fid_given_samples(
            [np.asarray(og), np.asarray(img)], batch_size=32, features=feats)
        entry = {
            "refresh_every": k,
            "img_per_s": round(n / dt, 3),
            "rmse": float(rmse((og + 1) / 2, (img + 1) / 2)),
            "ssim": float(ssim((og + 1) / 2, (img + 1) / 2)),
            f"{'proxy_' if not feats.is_inception else ''}fid": float(proxy_fid),
        }
        results["sweep"].append(entry)
        print(json.dumps(entry), flush=True)

    # quality of the pinned bench recipe (bf16 UNet compute, fp32 sampler
    # math) vs full-fp32 on the same checkpoint: the headline number's
    # precision recipe carries its own quality record too
    from colddiff.utils import bf16_params, retry_compile

    pb = bf16_params(params)

    def denoise_bf16(x, t):
        def one(xc, tc):
            return model.apply(pb, xc.astype(jnp.bfloat16), tc).astype(
                jnp.float32)
        if x.shape[0] > 16:
            return apply_in_chunks(one, 16, x, t)
        return one(x, t)

    results["bf16_sweep"] = []
    for k in (1, 4, 8):
        fnb = jax.jit(lambda img, rng, k=k: sample(
            d, denoise_bf16, img, rng=rng, refresh_every=k).img)
        imgb = retry_compile(lambda: fnb(start, jax.random.key(0)))
        float(jnp.sum(imgb))
        t0 = time.time()
        imgb = fnb(start, jax.random.key(0))
        float(jnp.sum(imgb))
        dt = time.time() - t0
        imgb = jnp.clip(imgb, -1, 1)
        entry = {
            "refresh_every": k,
            "img_per_s": round(n / dt, 3),
            "rmse": float(rmse((og + 1) / 2, (imgb + 1) / 2)),
            "ssim": float(ssim((og + 1) / 2, (imgb + 1) / 2)),
            f"{'proxy_' if not feats.is_inception else ''}fid": float(
                calculate_fid_given_samples(
                    [np.asarray(og), np.asarray(imgb)], batch_size=32,
                    features=feats)),
        }
        results["bf16_sweep"].append(entry)
        print(json.dumps({"bf16": entry}), flush=True)
    # kept for readers of the old record layout
    results["bf16_compute_refresh1"] = {
        kk: v for kk, v in results["bf16_sweep"][0].items()
        if kk not in ("refresh_every", "img_per_s")}

    # compact summary bench.py attaches to its refresh4 throughput number
    by_k = {e["refresh_every"]: e for e in results["sweep"]}
    fid_key = "proxy_fid" if not feats.is_inception else "fid"

    def sig(x, digits=4):
        # significant digits, NOT round(x, 3): the proxy-FID values are
        # ~2.5e-4 and decimal-place rounding zeroes them (VERDICT r3 #7).
        return float(f"{x:.{digits}g}")

    if 1 in by_k and 4 in by_k:
        results["summary"] = {
            "rmse_refresh1": sig(by_k[1]["rmse"]),
            "rmse_refresh4": sig(by_k[4]["rmse"]),
            "ssim_refresh1": sig(by_k[1]["ssim"]),
            "ssim_refresh4": sig(by_k[4]["ssim"]),
            f"{fid_key}_refresh1": sig(by_k[1][fid_key]),
            f"{fid_key}_refresh4": sig(by_k[4][fid_key]),
        }
    bf_by_k = {e["refresh_every"]: e for e in results.get("bf16_sweep", [])}
    for k in (4, 8):
        if k in bf_by_k and "summary" in results:
            e = bf_by_k[k]
            results["summary"][f"bf16_refresh{k}_img_per_s"] = e["img_per_s"]
            results["summary"][f"bf16_refresh{k}_rmse"] = sig(e["rmse"])
            results["summary"][f"bf16_refresh{k}_ssim"] = sig(e["ssim"])
            results["summary"][f"bf16_refresh{k}_{fid_key}"] = sig(e[fid_key])

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
