"""Profile the B>=32 UNet-forward throughput cliff (VERDICT round-1 item 3).

Times the flagship ConvNeXt UNet forward (dim=64, mults (1,2,4,8), 128px)
at several batch sizes, plus a lax.map-chunked variant that splits big
batches into chunks of 16 inside the same program.  Single dispatches
through the axon tunnel cost ~26 ms, so K forwards run inside ONE jitted
program (fori_loop with a data dependency through the image); per-call
time = (t_K - t_1) / (K - 1).

Run on the real TPU:  python scripts/profile_batch_cliff.py [bf16|fp32]...
Optionally set COLDDIFF_PROFILE_BATCHES=16,32 to restrict batch sizes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from colddiff.models import UnetConvNext  # noqa: E402
from colddiff.utils import apply_in_chunks  # noqa: E402

IMG = 128
K = 16
RUNS = 3


def force(out):
    return float(jnp.sum(out))


def time_call(fn, *args, runs=RUNS):
    force(fn(*args))
    t0 = time.time()
    for _ in range(runs):
        force(fn(*args))
    return (time.time() - t0) / runs


def main():
    tags = sys.argv[1:] or ["bf16"]
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    x0 = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.key(0), x0, jnp.zeros((2,), jnp.int32))
    rng = np.random.default_rng(0)

    for tag in tags:
        dt_in = jnp.bfloat16 if tag == "bf16" else jnp.float32
        p = (jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
             if tag == "bf16" else params)

        def one(x, t):
            return model.apply(p, x.astype(dt_in), t).astype(jnp.float32)

        def looped(fn, k):
            @jax.jit
            def run(x, t):
                return jax.lax.fori_loop(0, k, lambda i, y: fn(y, t), x)
            return run

        import os

        batches = tuple(int(s) for s in os.environ.get(
            "COLDDIFF_PROFILE_BATCHES", "16,32,64").split(","))
        for b in batches:
            x = jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)),
                            dtype=jnp.float32)
            t = jnp.zeros((b,), jnp.int32)
            dt = (time_call(looped(one, K), x, t)
                  - time_call(looped(one, 1), x, t)) / (K - 1)
            line = f"{tag} B={b:3d}: {dt*1e3:8.2f} ms/call  {b/dt:8.1f} img/s"
            if b > 16:
                chunked = lambda xx, tt: apply_in_chunks(one, 16, xx, tt)
                dtc = (time_call(looped(chunked, K), x, t)
                       - time_call(looped(chunked, 1), x, t)) / (K - 1)
                line += f"   chunked16: {dtc*1e3:8.2f} ms  {b/dtc:8.1f} img/s"
            print(line, flush=True)


if __name__ == "__main__":
    main()
