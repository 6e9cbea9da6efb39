"""Benchmark: sampled images/sec/chip, CelebA-128 deblurring config, T=200.

North-star metric (BASELINE.md): full reverse-sampling throughput at 128px
with the flagship ConvNeXt UNet (dim=64, mults (1,2,4,8)) and the reference's
CelebA-128 blur config (T=200, kernel 15, std 0.01, Exponential_reflect,
x0_step_down sampling -- README.md:74,80).

``vs_baseline``: the reference repo publishes no numbers (BASELINE.json
"published": {}), so the honest comparable is the *reference algorithm on the
same chip*: Algorithm 2 with sequential per-step depthwise conv chains
(O(T) convs per D(x0,t) call -> T + T^2 convs per run plus T UNet calls,
exactly the cost model of deblurring_diffusion_pytorch.py:393-455 / :927-960).
A single fused T=200 naive program is too large to execute reliably, so the
baseline time is composed from measured on-chip per-op times
(t_unet, t_conv), cross-checked by running the full naive program at T=50.
The TPU-vs-A100 hardware factor comes on top of this algorithmic ratio.

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
NAIVE_CHECK_T = 50


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


def make_naive(model, params, t_steps):
    """Reference-algorithm sampler: sequential masked conv chains."""
    from colddiff.schedules import blur_routine_params, gaussian_kernel_2d

    kparams = blur_routine_params(ROUTINE, t_steps, KS, STD)
    kernels = jnp.asarray(
        np.stack([gaussian_kernel_2d((k, k), (s, s)) for (k, s, _) in kparams])
    )
    pad = (KS - 1) // 2
    w_all = jnp.tile(kernels[:, :, :, None, None], (1, 1, 1, 1, 3))  # [T,k,k,1,3]

    def conv_step(x, w):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3,
        )

    def degrade_naive(x, n):
        def body(carry, inp):
            i, w = inp
            y = conv_step(carry, w)
            keep = (i < n).reshape(-1, 1, 1, 1)
            return jnp.where(keep, y, carry), None

        out, _ = jax.lax.scan(body, x, (jnp.arange(t_steps), w_all))
        return out

    @jax.jit
    def naive(params, img):
        full = jnp.full((img.shape[0],), t_steps)
        start = degrade_naive(img, full)

        def body(carry, k):
            cur = carry
            t_cur = t_steps - k
            step = jnp.full((img.shape[0],), t_cur - 1, dtype=jnp.int32)
            x0 = model.apply(params, cur, step)
            xt_bar = degrade_naive(x0, jnp.full((img.shape[0],), 1) * t_cur)
            xtm1_bar = degrade_naive(x0, jnp.full((img.shape[0],), 1) * (t_cur - 1))
            return cur - xt_bar + xtm1_bar, None

        out, _ = jax.lax.scan(body, start, jnp.arange(t_steps))
        return out

    return naive, conv_step, w_all


def main():
    from colddiff.sampling import prepare_start, sample

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

    extras = {}
    vs_baseline = None
    try:
        naive_fn, conv_step, w_all = make_naive(model, params, NAIVE_CHECK_T)

        # per-op times for the composed T=200 baseline estimate
        unet = jax.jit(lambda p, x: model.apply(p, x, jnp.zeros((BATCH,), jnp.int32)))
        t_unet, _ = time_fn(unet, params, img, runs=5)
        conv_j = jax.jit(lambda x: conv_step(x, w_all[0]))
        t_conv, _ = time_fn(conv_j, img, runs=20)

        naive_t200_est = T * t_unet + (T + T * T) * t_conv
        ips_naive_est = BATCH / naive_t200_est
        vs_baseline = ips / ips_naive_est
        extras.update({
            "t_unet_ms": round(t_unet * 1e3, 3),
            "t_conv_ms": round(t_conv * 1e3, 4),
            "baseline_T200_images_per_sec_composed": round(ips_naive_est, 3),
        })

        # cross-check: full naive program at T=50 vs composed estimate at T=50
        dt_naive50, _ = time_fn(naive_fn, params, img, runs=1)
        est50 = NAIVE_CHECK_T * t_unet + (NAIVE_CHECK_T + NAIVE_CHECK_T**2) * t_conv
        extras.update({
            "naive_T50_measured_s": round(dt_naive50, 3),
            "naive_T50_composed_s": round(est50, 3),
        })
    except Exception as e:  # baseline must never block the headline number
        extras["baseline_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": "sampled_images_per_sec_per_chip_128px_T200",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "batch": BATCH,
        "timesteps": T,
        "model": "UnetConvNext(dim=64,(1,2,4,8))",
        "device": str(jax.devices()[0]),
        **extras,
    }))


if __name__ == "__main__":
    main()
