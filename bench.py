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
A single fused T=200 naive program is too large to execute reliably on this
chip, so the baseline is the quadratic cost model a*T + b*T^2 fitted to two
*measured* full naive runs (T=25 and T=50) and extrapolated to T=200
(standalone per-op timings are dispatch-dominated through the tunnel and
overestimate the baseline ~8x -- rejected).  The TPU-vs-A100 hardware factor
comes on top of this algorithmic ratio.

PINNED PROTOCOL (schema v3, comparable across BENCH_r*.json rounds):
  - headline ``value`` = images/sec at **B=16**, bfloat16 UNet compute with
    fp32 degradation math and fp32 loss/params (the intended TPU recipe);
  - B=32/64 and fp32-everything numbers are reported in extras, never as
    the headline (round 2's headline floated to the best batch; pinned
    per VERDICT round-2 weak-point 7);
  - ``refresh_every=4`` throughput is an opt-in extra and is reported next
    to its measured quality cost (docs/examples/refresh_quality.json,
    produced by scripts/eval_refresh_quality.py) when that record exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time
from pathlib import Path

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


def _force(out):
    """Force completion: on the axon backend block_until_ready can return
    before execution finishes; a scalar host fetch is the reliable barrier."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def time_fn(fn, *args, runs=RUNS):
    for attempt in range(3):  # the remote-compile tunnel flakes occasionally
        try:
            out = fn(*args)
            _force(out)  # compile + warmup
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)
    t0 = time.time()
    for _ in range(runs):
        out = fn(*args)
        _force(out)
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
    from colddiff.utils import enable_compilation_cache

    # reruns of the same bench skip the minutes-long remote compiles
    enable_compilation_cache()
    d, model, params = build()
    rng = np.random.default_rng(0)

    def make_ours(bf16: bool):
        from colddiff.utils import apply_in_chunks, bf16_params

        p = bf16_params(params) if bf16 else params

        @jax.jit
        def ours(p, img):
            start = prepare_start(d, img)

            def apply_one(xt, t):
                out = model.apply(p, xt.astype(jnp.bfloat16 if bf16 else xt.dtype), t)
                return out.astype(jnp.float32)

            def fn(xt, t):
                # XLA schedules the 128px UNet poorly above B=16 (round-1
                # B=64 cliff); chunking restores flat per-image throughput
                return apply_in_chunks(apply_one, BATCH, xt, t)

            return sample(d, fn, start).img

        return ours, p

    extras = {"bench_protocol": "v3: headline pinned to B=16 bf16-compute"}
    # batch sweep on the bf16 path; headline = PINNED B=16 images/sec
    headline_ips = 0.0
    ours_bf16, p_bf16 = make_ours(True)
    for b in (16, 32, 64):
        img = jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), dtype=jnp.float32)
        try:
            dt, _ = time_fn(ours_bf16, p_bf16, img)
        except Exception as e:
            extras[f"batch{b}_error"] = f"{type(e).__name__}"[:80]
            continue
        ips_b = b / dt
        extras[f"images_per_sec_bf16_b{b}"] = round(ips_b, 3)
        if b == BATCH:
            headline_ips = ips_b

    if headline_ips == 0.0:
        # The B=16 bf16 run IS the pinned protocol: without it there is no
        # headline. Fail loudly instead of printing value=0.0 as if measured.
        raise SystemExit(
            "bench protocol v3 FAILED: the pinned B=16 bf16 measurement did "
            f"not complete ({extras.get('batch16_error', 'unknown error')})")

    img16 = jnp.asarray(rng.standard_normal((BATCH, IMG, IMG, 3)), dtype=jnp.float32)
    ours_fp32, p_fp32 = make_ours(False)
    dt32, _ = time_fn(ours_fp32, p_fp32, img16)
    extras["images_per_sec_fp32_b16"] = round(BATCH / dt32, 3)

    # opt-in prediction-cache acceleration (beyond reference parity; the
    # headline stays the exact-algorithm number)
    try:
        def make_cached(k):
            @jax.jit
            def ours_cached(p, img):
                start = prepare_start(d, img)

                def fn(xt, t):
                    return model.apply(p, xt.astype(jnp.bfloat16), t).astype(
                        jnp.float32
                    )

                return sample(d, fn, start, refresh_every=k).img

            return ours_cached

        for k in (4, 8):
            dtc, _ = time_fn(make_cached(k), p_bf16, img16)
            extras[f"images_per_sec_bf16_b16_refresh{k}"] = round(
                BATCH / dtc, 3)
        # quality cost of the prediction cache, measured once on a trained
        # checkpoint (scripts/eval_refresh_quality.py) and committed; the
        # acceleration number never travels without it
        qpath = Path(__file__).parent / "docs/examples/refresh_quality.json"
        if qpath.exists():
            q = json.loads(qpath.read_text())
            extras["refresh4_quality_vs_refresh1"] = q.get("summary", q)
    except Exception as e:
        extras["refresh_error"] = f"{type(e).__name__}"[:80]

    vs_baseline = None
    try:
        # two measured naive runs -> fit a*T + b*T^2 -> extrapolate to T=200
        times = {}
        for t_steps in (25, NAIVE_CHECK_T):
            naive_fn, _, _ = make_naive(model, params, t_steps)
            dt_n, _ = time_fn(naive_fn, params, img16, runs=1)
            times[t_steps] = dt_n
        t1, t2 = 25, NAIVE_CHECK_T
        m = np.array([[t1, t1 * (t1 + 1)], [t2, t2 * (t2 + 1)]])
        a, bq = np.linalg.solve(m, np.array([times[t1], times[t2]]))
        naive_t200 = float(a * T + bq * T * (T + 1))
        ips_naive = BATCH / naive_t200
        vs_baseline = headline_ips / ips_naive
        extras.update({
            "naive_T25_measured_s": round(times[t1], 3),
            "naive_T50_measured_s": round(times[t2], 3),
            "baseline_T200_extrapolated_s": round(naive_t200, 2),
            "baseline_T200_images_per_sec": round(ips_naive, 4),
        })
    except Exception as e:  # baseline must never block the headline number
        extras["baseline_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": "sampled_images_per_sec_per_chip_128px_T200",
        "value": round(headline_ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "batch": BATCH,
        "timesteps": T,
        "model": "UnetConvNext(dim=64,(1,2,4,8)) bf16 compute",
        "device": str(jax.devices()[0]),
        **extras,
    }))


if __name__ == "__main__":
    main()
