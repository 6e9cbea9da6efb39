"""Roofline check for the flagship UNet forward: achieved vs hardware peaks.

Uses XLA's own compiled cost analysis for FLOPs / HBM traffic (no hand
counting) and in-program looped timing (single dispatches are useless through
the axon tunnel -- scripts/bench_front.py).  Peaks are TPU v5e single-chip
datasheet numbers; the verdict prints which roof the program sits under.

Run: python scripts/roofline.py [fp32|bf16] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

# TPU v5e, one chip
PEAK_BF16_TFLOPS = 197.0
PEAK_FP32_TFLOPS = PEAK_BF16_TFLOPS / 4  # fp32 via multi-pass MXU
PEAK_HBM_GBS = 819.0

IMG = 128
K = 16
RUNS = 3


def force(x):
    return float(jnp.sum(x))


def main():
    tag = (sys.argv[1:] or ["fp32"])[0]
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dt = jnp.bfloat16 if tag == "bf16" else jnp.float32

    from colddiff.models import UnetConvNext

    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), dt)
    t = jnp.zeros((b,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    if tag == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    fwd = jax.jit(lambda xx, tt: model.apply(params, xx, tt))
    compiled = fwd.lower(x, t).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))

    def looped(k):
        @jax.jit
        def run(xx, tt):
            # the fp32 time-embedding path can promote the output; keep the
            # loop carry dtype stable
            return jax.lax.fori_loop(
                0, k, lambda i, y: model.apply(params, y, tt).astype(y.dtype),
                xx)
        return run

    f16, f1 = looped(K), looped(1)
    force(f16(x, t)); force(f1(x, t))
    t0 = time.time()
    for _ in range(RUNS):
        force(f16(x, t))
    t16 = (time.time() - t0) / RUNS
    t0 = time.time()
    for _ in range(RUNS):
        force(f1(x, t))
    t1 = (time.time() - t0) / RUNS
    dt_call = (t16 - t1) / (K - 1)

    tflops = flops / dt_call / 1e12
    gbs = bytes_ / dt_call / 1e9
    peak_t = PEAK_BF16_TFLOPS if tag == "bf16" else PEAK_FP32_TFLOPS
    # time the program would need at each roof alone
    t_compute = flops / (peak_t * 1e12)
    t_mem = bytes_ / (PEAK_HBM_GBS * 1e9)
    bound = "compute" if t_compute > t_mem else "bandwidth"
    sol = max(t_compute, t_mem)
    print(f"UNet fwd {tag} B={b} @{IMG}px: {dt_call*1e3:.2f} ms/call")
    print(f"  XLA cost: {flops/1e9:.1f} GFLOP, {bytes_/1e6:.0f} MB accessed")
    print(f"  achieved: {tflops:.1f} TFLOP/s ({100*tflops/peak_t:.0f}% of "
          f"{tag} peak), {gbs:.0f} GB/s ({100*gbs/PEAK_HBM_GBS:.0f}% of HBM)")
    print(f"  roofline: {bound}-bound; speed-of-light {sol*1e3:.2f} ms "
          f"-> running at {100*sol/dt_call:.0f}% of light")


if __name__ == "__main__":
    main()
