"""How far is XLA's conv from the MXU roof? Conv3x3 pair vs same-FLOPs matmul.

The flagship UNet is conv-dominated; the fp32 program sits at ~103% of the
fp32 roofline but the bf16 program at only ~26% of bf16 peak
(scripts/roofline.py).  This isolates where the bf16 gap lives: time the
level-k 3x3 conv pair (C -> 2C -> C, the ConvNextBlock net) against a matmul
with identical contraction shape ([N, 9C] @ [9C, 2C] + [N, 18C] @ [18C, C]),
which is what a perfect im2col conv would execute.

Run: python scripts/bench_conv_mxu.py [bf16|fp32]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

K = 32
RUNS = 3
SHAPES = [  # (B, H, W, C) per UNet level
    (16, 128, 128, 64),
    (16, 64, 64, 128),
    (16, 32, 32, 256),
    (16, 16, 16, 512),
]


def force(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(make_fn, *args):
    def looped(k):
        f = make_fn()

        @jax.jit
        def run(*a):
            def body(i, y):
                return f(*((y,) + a[1:])).astype(y.dtype)
            return jax.lax.fori_loop(0, k, body, a[0])
        return run

    f16, f1 = looped(K), looped(1)
    force(f16(*args)); force(f1(*args))
    t0 = time.time()
    for _ in range(RUNS):
        force(f16(*args))
    t16 = (time.time() - t0) / RUNS
    t0 = time.time()
    for _ in range(RUNS):
        force(f1(*args))
    t1 = (time.time() - t0) / RUNS
    return (t16 - t1) / (K - 1)


def main():
    tag = (sys.argv[1:] or ["bf16"])[0]
    dt = jnp.bfloat16 if tag == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    for (b, h, w, c) in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
        w1 = jnp.asarray(rng.standard_normal((3, 3, c, 2 * c)) * 0.05, dt)
        w2 = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.05, dt)

        def conv_pair():
            def f(x, w1, w2):
                y = jax.lax.conv_general_dilated(
                    x, w1, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jax.lax.conv_general_dilated(
                    y, w2, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return f

        n = b * h * w
        xm = jnp.asarray(rng.standard_normal((n, 9 * c)), dt)
        m1 = jnp.asarray(rng.standard_normal((9 * c, 2 * c)) * 0.05, dt)
        m2 = jnp.asarray(rng.standard_normal((2 * c, 9 * c)) * 0.05, dt)

        def mm_pair():
            # [N,9C]@[9C,2C] then [N,2C]@[2C,9C]: shape-preserving chain with
            # exactly each conv's FLOPs (conv1 N*9C*2C*2, conv2 N*18C*C*2)
            def f(xm, m1, m2):
                return (xm @ m1) @ m2
            return f

        flops = 2 * n * 9 * c * 2 * c * 2  # two convs, equal FLOPs each
        t_conv = timeit(conv_pair, x, w1, w2)
        t_mm = timeit(mm_pair, xm, m1, m2)
        print(f"{tag} ({b},{h},{w},{c}): conv pair {t_conv*1e6:7.0f} us "
              f"({flops/t_conv/1e12:6.1f} TF/s) | matmul pair "
              f"{t_mm*1e6:7.0f} us ({flops/t_mm/1e12:6.1f} TF/s) | "
              f"conv/mm = {t_conv/t_mm:.2f}x", flush=True)


if __name__ == "__main__":
    main()
