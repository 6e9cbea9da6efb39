"""Probe: which conv3x3 formulation reaches bf16 MXU rate per UNet level?

The flagship UNet is dense-conv dominated and XLA's bf16 conv only reaches
~54 TF/s of the 197 peak (docs/PERF.md).  This times, per level shape, in
bf16 (fp32 accumulation via preferred_element_type):

  conv      XLA's native lax.conv_general_dilated (the shipping path)
  taps9     sum of 9 shifted dots: [N,C] @ [C,Co] per (dy,dx) tap
  patches   lax.conv_general_dilated_patches -> one [N,9C] @ [9C,Co] dot
  mm        same-FLOPs matmul chain (MXU upper bound, no window reads)

All run inside one fori_loop'd jit (single dispatches through the axon
tunnel carry ~26 ms launch latency, CLAUDE.md).

Run on the real chip: python scripts/probe_bf16_conv.py [fp32]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

K = 128  # loop long enough that K*op_time >> tunnel launch noise (~ms)
RUNS = 5
SHAPES = [  # (B, H, W, C) per UNet level; conv pair C -> 2C -> C
    (16, 128, 128, 64),
    (16, 64, 64, 128),
    (16, 32, 32, 256),
    (16, 16, 16, 512),
]


def force(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(f, *args):
    def looped(k):
        @jax.jit
        def run(*a):
            def body(i, y):
                return f(*((y,) + a[1:])).astype(y.dtype)
            return jax.lax.fori_loop(0, k, body, a[0])
        return run

    fk, f1 = looped(K), looped(1)
    force(fk(*args)); force(f1(*args))

    def med(fn):
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            force(fn(*args))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    return (med(fk) - med(f1)) / (K - 1)


def conv(x, w1, w2):
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv_raw(x, w1, w2):
    # no preferred_element_type: accumulate in the input dtype's default
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def one_taps9(x, w):  # w: [3,3,C,Co]
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, w.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, c))
            acc += jnp.dot(xs.reshape(-1, c), w[dy, dx],
                           preferred_element_type=jnp.float32
                           ).reshape(b, h, wd, -1)
    return acc.astype(x.dtype)


def taps9(x, w1, w2):
    return one_taps9(one_taps9(x, w1), w2)


def one_patches(x, w):  # one [N,9C]@[9C,Co] dot on materialized patches
    b, h, wd, c = x.shape
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches channel order is C-major [c, ky, kx] -> match w reshape
    wm = w.transpose(2, 0, 1, 3).reshape(9 * c, -1)
    return jnp.dot(p.reshape(-1, 9 * c), wm,
                   preferred_element_type=jnp.float32
                   ).reshape(b, h, wd, -1).astype(x.dtype)


def patches(x, w1, w2):
    return one_patches(one_patches(x, w1), w2)


def main():
    tag = (sys.argv[1:] or ["bf16"])[0]
    dt = jnp.bfloat16 if tag == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    for (b, h, w, c) in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
        w1 = jnp.asarray(rng.standard_normal((3, 3, c, 2 * c)) * 0.05, dt)
        w2 = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.05, dt)
        n = b * h * w
        xm = jnp.asarray(rng.standard_normal((n, 9 * c)), dt)
        m1 = jnp.asarray(rng.standard_normal((9 * c, 2 * c)) * 0.05, dt)
        m2 = jnp.asarray(rng.standard_normal((2 * c, 9 * c)) * 0.05, dt)

        flops = 2 * n * 9 * c * 2 * c * 2
        # correctness spot-check once per shape (fp32 path)
        if tag == "fp32":
            ref = conv(x, w1, w2)
            np.testing.assert_allclose(np.asarray(taps9(x, w1, w2)),
                                       np.asarray(ref), rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(patches(x, w1, w2)),
                                       np.asarray(ref), rtol=2e-4, atol=2e-4)

        out = [f"{tag} ({b},{h},{w},{c}):"]
        for name, f, args in [
            ("conv", conv, (x, w1, w2)),
            ("conv_raw", conv_raw, (x, w1, w2)),
            ("taps9", taps9, (x, w1, w2)),
            ("patches", patches, (x, w1, w2)),
            ("mm", lambda xm, m1, m2: ((xm @ m1) @ m2), (xm, m1, m2)),
        ]:
            try:
                t = timeit(f, *args)
                out.append(f"{name} {t*1e6:7.0f}us {flops/t/1e12:5.1f}TF/s")
            except Exception as e:
                out.append(f"{name} FAIL({type(e).__name__})")
        print(" | ".join(out), flush=True)


if __name__ == "__main__":
    main()
