"""Training-step throughput on the real TPU: images/sec/chip.

The reference's only training-throughput signal is a 100-step wall-clock
print (snowification/diffusion/diffusion.py:727-729); this measures the same
quantity properly on the flagship CelebA-128 deblurring config: one jitted,
buffer-donating optimizer step (scan-based grad-accum x2, Adam, EMA), timed
over in-memory batches so the data pipeline is excluded.

Run on the real TPU:
  python scripts/bench_train.py [bf16|fp32] [--remat] [--batch N] [--accum K]

(--batch/--accum explore the microbatching axis at fixed images/step:
 the pinned recipe is B=16 accum x2; --batch 32 --accum 1 runs the same
 32 images as one microbatch.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

T = 200
IMG = 128
BATCH = 16
STEPS = 8


def main():
    args = sys.argv[1:]
    bf16 = "fp32" not in args
    remat = "--remat" in args
    bsz = int(args[args.index("--batch") + 1]) if "--batch" in args else BATCH
    accum = int(args[args.index("--accum") + 1]) if "--accum" in args else 2

    import tempfile

    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.train import Trainer
    from colddiff.utils import enable_compilation_cache

    # repeat runs of the same config skip the minutes-long remote compile
    enable_compilation_cache()

    op = get_operator(
        "blur", image_size=IMG, timesteps=T,
        blur_routine="Exponential_reflect", kernel_size=15, kernel_std=0.01,
    )
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    ds = SyntheticDataset(IMG, 3, length=bsz * 4)

    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(
            d, model, ds,
            train_batch_size=bsz,
            train_num_steps=10**9,
            gradient_accumulate_every=accum,
            save_and_sample_every=10**9,
            results_folder=tmp,
            num_workers=1,
            bf16=bf16,
            remat=remat,
        )
        batch, batch2 = tr._next_superbatch()
        # compile + warmup
        state, loss = tr._train_step(tr.state, tr.diffusion, batch, batch2)
        print("warmup loss:", float(loss), flush=True)
        t0 = time.time()
        for _ in range(STEPS):
            state, loss = tr._train_step(state, tr.diffusion, batch, batch2)
        _ = float(loss)  # host fetch barrier (axon block_until_ready quirk)
        dt = (time.time() - t0) / STEPS
        # one optimizer step consumes accum * bsz images
        ips = accum * bsz / dt
        tag = (("bf16" if bf16 else "fp32") + ("+remat" if remat else "")
               + f" B={bsz} accum={accum}")
        print(f"{tag}: {dt*1e3:.1f} ms/opt-step, "
              f"{ips:.2f} train images/sec/chip", flush=True)


if __name__ == "__main__":
    main()
