"""bf16-vs-fp32 training loss parity on the flagship config.

The pinned bench recipe trains with true bf16 compute (fp32 master weights,
fp32 optimizer state, norm statistics in at-least-fp32). This verifies the
recipe carries quality evidence like the sampling recipe does (VERDICT r3
item 1): train the canonical 128px blur config for N steps twice from the
same init/seed/data, fp32 compute vs bf16 compute, and record both loss
trajectories.

Run on the real TPU:
  python scripts/train_loss_parity.py [n_steps] [out.json]

Writes docs/examples/train_bf16_parity.json by default.
"""

import json
import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, ".")

T = 200
IMG = 128
BATCH = 16


def run(bf16: bool, n_steps: int):
    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.train import Trainer

    op = get_operator(
        "blur", image_size=IMG, timesteps=T,
        blur_routine="Exponential_reflect", kernel_size=15, kernel_std=0.01,
    )
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    ds = SyntheticDataset(IMG, 3, length=256)

    losses = []
    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(
            d, model, ds,
            train_batch_size=BATCH,
            train_num_steps=10**9,
            gradient_accumulate_every=2,
            save_and_sample_every=10**9,
            results_folder=tmp,
            num_workers=1,
            bf16=bf16,
            seed=0,
        )
        state = tr.state
        t0 = time.time()
        for step in range(n_steps):
            batch, batch2 = tr._next_superbatch()
            state, loss = tr._train_step(state, tr.diffusion, batch, batch2)
            losses.append(float(loss))
        dt = time.time() - t0
    return losses, dt


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "docs/examples/train_bf16_parity.json")

    results = {"config": "blur128 Exponential_reflect T=200, "
                         "UnetConvNext(64,(1,2,4,8)), B=16 accum x2, seed 0",
               "n_steps": n_steps}
    for tag, bf16 in (("fp32", False), ("bf16", True)):
        losses, dt = run(bf16, n_steps)
        tail = float(np.mean(losses[-50:]))
        results[tag] = {
            "loss_first10_mean": float(np.mean(losses[:10])),
            "loss_tail50_mean": tail,
            "losses_every10": [round(x, 5) for x in losses[::10]],
            "wall_s": round(dt, 1),
        }
        print(f"{tag}: tail50 loss {tail:.5f} ({dt:.0f}s)", flush=True)

    f32, b16 = results["fp32"]["loss_tail50_mean"], results["bf16"]["loss_tail50_mean"]
    results["tail50_rel_diff"] = abs(b16 - f32) / f32
    print(f"tail50 rel diff: {results['tail50_rel_diff']:.3%}", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
