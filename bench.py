"""Benchmark: sampled images/sec/chip, CelebA-128 deblurring config, T=200.

North-star metric (BASELINE.md): full reverse-sampling throughput at 128px
with the flagship ConvNeXt UNet (dim=64, mults (1,2,4,8)) and the reference's
CelebA-128 blur config (T=200, kernel 15, std 0.01, Exponential_reflect,
x0_step_down sampling -- README.md:74,80).

``vs_baseline`` is measured against a faithful same-chip implementation of the
*reference algorithm* (sequential per-step depthwise conv chains inside the
reverse loop, O(T) convs per D(x0,t) call => O(T^2) per run, exactly the cost
model of deblurring_diffusion_pytorch.py:393-455), with the identical UNet.
The reference repo publishes no numbers (BASELINE.json "published": {}), so
same-hardware algorithmic speedup is the honest comparable; the additional
TPU-vs-A100 hardware factor comes on top of it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

T = 200
IMG = 128
BATCH = 16
KS = 15
STD = 0.01
ROUTINE = "Exponential_reflect"
RUNS = 3


def build():
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator

    op = get_operator(
        "blur", image_size=IMG, timesteps=T, blur_routine=ROUTINE,
        kernel_size=KS, kernel_std=STD,
    )
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((BATCH,), jnp.int32))
    return d, model, params


def time_fn(fn, *args, runs=RUNS):
    out = jax.block_until_ready(fn(*args))  # compile + warmup
    t0 = time.time()
    for _ in range(runs):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / runs, out


def main():
    from colddiff.sampling import prepare_start, sample
    from colddiff.schedules import blur_routine_params, gaussian_kernel_2d

    d, model, params = build()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BATCH, IMG, IMG, 3)), dtype=jnp.float32)

    @jax.jit
    def ours(params, img):
        start = prepare_start(d, img)
        fn = lambda xt, t: model.apply(params, xt, t)
        return sample(d, fn, start).img

    dt, _ = time_fn(ours, params, img)
    ips = BATCH / dt

    # ---- reference cost model on the same chip ---------------------------- #
    kparams = blur_routine_params(ROUTINE, T, KS, STD)
    kernels = jnp.asarray(
        np.stack([gaussian_kernel_2d((k, k), (s, s)) for (k, s, _) in kparams])
    )  # all same size KS here
    pad = (KS - 1) // 2

    def conv_step(x, k2d):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        w = jnp.tile(k2d[:, :, None, None], (1, 1, 1, 3))  # HWIO depthwise
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3,
        )

    def degrade_naive(x, n):
        # sequential masked chain, the reference's q_sample cost model
        def body(carry, inp):
            i, k2d = inp
            y = conv_step(carry, k2d)
            keep = (i < n).reshape(-1, 1, 1, 1)
            return jnp.where(keep, y, carry), None

        out, _ = jax.lax.scan(body, x, (jnp.arange(T), kernels))
        return out

    @jax.jit
    def naive(params, img):
        start = degrade_naive(img, jnp.full((BATCH,), T))
        def body(carry, k):
            cur = carry
            t_cur = T - k
            step = jnp.full((BATCH,), t_cur - 1, dtype=jnp.int32)
            x0 = model.apply(params, cur, step)
            xt_bar = degrade_naive(x0, jnp.full((BATCH,), 1) * t_cur)
            xtm1_bar = degrade_naive(x0, jnp.full((BATCH,), 1) * (t_cur - 1))
            return cur - xt_bar + xtm1_bar, None

        out, _ = jax.lax.scan(body, start, jnp.arange(T))
        return out

    dt_naive, _ = time_fn(naive, params, img, runs=1)
    ips_naive = BATCH / dt_naive

    print(json.dumps({
        "metric": "sampled_images_per_sec_per_chip_128px_T200",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / ips_naive, 2),
        "baseline_images_per_sec_same_chip_reference_algorithm": round(ips_naive, 3),
        "batch": BATCH,
        "timesteps": T,
        "model": "UnetConvNext(dim=64,(1,2,4,8))",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
