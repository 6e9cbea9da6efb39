"""Race the fused ConvNeXt-front kernels against XLA on the real TPU.

Single dispatches through the axon tunnel cost ~26 ms regardless of the op,
so each candidate runs K iterations inside ONE jitted program (fori_loop with
a data dependency); per-op time = (t_K - t_1) / (K - 1).

Round-2 measured (v5e, fp32, this script):
  (16,128,128,64): xla 1574 us | old pallas 2184 | packed ...
  (16, 64, 64,128): xla  183 us | old  565 | packed(xo) 519
  (16, 32, 32,256): xla   58 us | old  208 | packed(xo) 293
  (64,128,128,64): xla 9681 us | old 8818 (pallas beats XLA's B=64 cliff)
XLA is near-optimal for C >= 128 (no lane padding); the fight is C=64.

Run:  python scripts/bench_front.py [all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from colddiff.ops.pallas.convnext_front import (  # noqa: E402
    _pallas_forward_packed,
    convnext_front_reference,
)

K = 32
RUNS = 3


def force(out):
    return float(jnp.sum(out))


def looped(fn_one, k):
    @jax.jit
    def run(x, *rest):
        return jax.lax.fori_loop(0, k, lambda i, y: fn_one(y, *rest), x)

    return run


def time_call(fn, *args, runs=RUNS):
    force(fn(*args))
    t0 = time.time()
    for _ in range(runs):
        force(fn(*args))
    return (time.time() - t0) / runs


def time_op(fn_one, *args):
    t_k = time_call(looped(fn_one, K), *args)
    t_1 = time_call(looped(fn_one, 1), *args)
    return (t_k - t_1) / (K - 1)


def main():
    rng = np.random.default_rng(0)
    shapes = [(16, 128, 128, 64), (32, 128, 128, 64), (64, 128, 128, 64)]
    if "all" in sys.argv[1:]:
        shapes += [(16, 64, 64, 128), (16, 32, 32, 256)]
    for shp in shapes:
        b, hgt, wid, c = shp
        x = jnp.asarray(rng.standard_normal(shp), jnp.float32)
        w = jnp.asarray(rng.standard_normal((7, 7, c)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        cond = jnp.asarray(rng.standard_normal((b, c)) * 0.1, jnp.float32)
        g = jnp.asarray(1 + 0.1 * rng.standard_normal((c,)), jnp.float32)
        bt = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)

        cands = {
            "xla": lambda xx, *a: convnext_front_reference(xx, *a, norm=True),
            "xla_hi": lambda xx, *a: convnext_front_reference(
                xx, *a, norm=True, precision="highest"),
            "packed": lambda xx, *a: _pallas_forward_packed(xx, *a, True, 1e-5),
        }
        args = (w, bias, cond, g, bt)
        y_ref = jax.jit(cands["xla_hi"])(x, *args)
        print(shp, flush=True)
        for name, fn in cands.items():
            try:
                if "nonorm" not in name:
                    err = float(jnp.max(jnp.abs(jax.jit(fn)(x, *args) - y_ref)))
                else:
                    err = 0.0
                dt = time_op(fn, x, *args)
                print(f"  {name:14s} {dt*1e6:9.1f} us   err_vs_fp32={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"  {name:14s} {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
