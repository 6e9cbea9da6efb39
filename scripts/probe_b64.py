"""Is the B=64 UNet cliff still there after the attention rewrite?

Times the flagship UNet forward at B=16/32/64 directly and via
apply_in_chunks(16), fp32 and bf16.  Run: python scripts/probe_b64.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from colddiff.models import UnetConvNext  # noqa: E402
from colddiff.utils import apply_in_chunks  # noqa: E402

IMG, K, RUNS = 128, 8, 3


def force(o):
    return float(jnp.sum(o))


def timeit(fn, x, t):
    def looped(kk):
        @jax.jit
        def run(x, t):
            return jax.lax.fori_loop(0, kk, lambda i, y: fn(y, t), x)

        return run

    f1, fk = looped(1), looped(K)
    force(f1(x, t)); force(fk(x, t))
    t0 = time.time()
    for _ in range(RUNS):
        force(fk(x, t))
    tk = (time.time() - t0) / RUNS
    t0 = time.time()
    for _ in range(RUNS):
        force(f1(x, t))
    t1 = (time.time() - t0) / RUNS
    return (tk - t1) / (K - 1)


def main():
    rng = np.random.default_rng(0)
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    x0 = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    params0 = model.init(jax.random.key(0), x0, jnp.zeros((2,), jnp.int32))
    for tag, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        params = jax.tree_util.tree_map(lambda a: a.astype(dt), params0)

        def direct(xx, tt):
            return model.apply(params, xx, tt).astype(xx.dtype)

        def chunked(xx, tt):
            return apply_in_chunks(direct, 16, xx, tt)

        for b in (16, 32, 64):
            x = jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), dt)
            t = jnp.zeros((b,), jnp.int32)
            td = timeit(direct, x, t)
            tc = timeit(chunked, x, t) if b > 16 else td
            print(
                f"{tag} B={b:2d}: direct {td*1e3:7.2f} ms "
                f"({td/b*1e6:6.1f} us/img)   chunk16 {tc*1e3:7.2f} ms "
                f"({tc/b*1e6:6.1f} us/img)",
                flush=True,
            )


if __name__ == "__main__":
    main()
