"""Race the fully fused ConvNeXt-block kernel against the production
baseline (Pallas front + XLA convs) and pure XLA on the real TPU.

Same timing discipline as bench_front.py: the axon tunnel costs ~26 ms per
dispatch, so each candidate runs K iterations inside ONE jitted fori_loop
(the block is residual-shaped, so output feeds back as input); per-op time
= (t_K - t_1) / (K - 1).

Candidates at the flagship level-0 shape (B, 128, 128, 64), hidden 128:
  fused      -- ops/pallas/convnext_block.py kernel (one VMEM round-trip)
  front+xla  -- current production: Pallas front, XLA conv tail
  xla        -- plain XLA chain (convnext_block_reference)

Run:  python scripts/bench_block.py [fp32] [b64]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from colddiff.ops.pallas.convnext_block import (  # noqa: E402
    convnext_block,
    convnext_block_reference,
)

K = 32
RUNS = 3


def force(out):
    return float(jnp.sum(out.astype(jnp.float32)))


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
    dtype = jnp.float32 if "fp32" in sys.argv[1:] else jnp.bfloat16
    batches = [64] if "b64" in sys.argv[1:] else [16]
    c, hid = 64, 128
    for b in batches:
        shp = (b, 128, 128, c)
        x = jnp.asarray(rng.standard_normal(shp) * 0.5, dtype)
        a = [
            jnp.asarray(rng.standard_normal((7, 7, c)) * 0.1, dtype),   # dw_w
            jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype),        # dw_b
            jnp.asarray(rng.standard_normal((b, c)) * 0.1, dtype),      # cond
            jnp.asarray(1 + 0.1 * rng.standard_normal((c,)), dtype),    # gamma
            jnp.asarray(0.1 * rng.standard_normal((c,)), dtype),        # beta
            jnp.asarray(rng.standard_normal((3, 3, c, hid)) * 0.05, dtype),
            jnp.asarray(rng.standard_normal((hid,)) * 0.1, dtype),
            jnp.asarray(rng.standard_normal((3, 3, hid, c)) * 0.05, dtype),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype),
        ]

        cands = {
            "fused": lambda xx, *r: convnext_block(xx, *r, force="pallas"),
            "front+xla": lambda xx, *r: convnext_block(xx, *r, force="xla"),
            "xla": lambda xx, *r: convnext_block_reference(xx, *r),
        }
        y_ref = jax.jit(lambda xx, *r: convnext_block_reference(
            xx.astype(jnp.float32), *[v.astype(jnp.float32) for v in r]))(
            x, *a)
        print(f"{shp} {np.dtype(dtype).name}", flush=True)
        for name, fn in cands.items():
            try:
                y = jax.jit(fn)(x, *a)
                err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref)))
                dt = time_op(fn, x, *a)
                print(f"  {name:10s} {dt*1e6:9.1f} us   err_vs_fp32={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"  {name:10s} {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
