"""Direct (unchunked) large-batch bf16 sampling throughput.

The production sampler chunks the UNet forward to B=16 programs
(apply_in_chunks) because round-1 measured a B=64 scheduling cliff.
Round 4 disproved the cliff for bf16 *forwards* (direct B=64 slightly
beats B=16 per image); this measures whether the full T=200 reverse
sampler also benefits from dropping the chunking at B in {32, 64}.

Run (real TPU): python scripts/bench_sample_direct.py [b32|b64|b16 ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

T, IMG = 200, 128


def main():
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.sampling import prepare_start, sample
    from colddiff.utils import (bf16_params, enable_compilation_cache,
                                retry_compile)

    enable_compilation_cache()
    batches = [int(a[1:]) for a in sys.argv[1:] if a.startswith("b")] or [32]

    op = get_operator("blur", image_size=IMG, timesteps=T,
                      blur_routine="Exponential_reflect", kernel_size=15,
                      kernel_std=0.01)
    d = ColdDiffusion(op=op, image_size=IMG, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    x0 = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.key(0), x0, jnp.zeros((2,), jnp.int32))
    pb = bf16_params(params)
    rng = np.random.default_rng(0)

    for b in batches:
        img = jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), jnp.float32)

        @jax.jit
        def run(p, img):
            start = prepare_start(d, img)

            def fn(xt, t):  # DIRECT apply: no chunking
                return model.apply(p, xt.astype(jnp.bfloat16), t).astype(
                    jnp.float32)

            return sample(d, fn, start).img

        retry_compile(lambda: float(jnp.sum(run(pb, img))))
        t0 = time.time()
        for _ in range(2):
            float(jnp.sum(run(pb, img)))
        dt = (time.time() - t0) / 2
        print(f"direct B={b}: {dt:.2f} s/run, {b/dt:.3f} img/s", flush=True)


if __name__ == "__main__":
    main()
