"""Where do the flagship UNet's 26 ms go? Ablation timing on the real TPU.

Times the full forward and variants with pieces knocked out (attention as
identity, ConvNeXt fronts with norm off, halved conv mult), all via module
monkey-patching so the remaining graph is untouched.  In-program looped
timing (see bench_front.py for why single dispatches are useless here).

Run:  python scripts/profile_unet_parts.py [bf16|fp32]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import colddiff.models.layers as L  # noqa: E402
from colddiff.models import UnetConvNext  # noqa: E402

IMG = 128
B = 16
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


def time_model(model, params, x, t):
    def looped(k):
        @jax.jit
        def run(x, t):
            return jax.lax.fori_loop(
                0, k, lambda i, y: model.apply(params, y, t).astype(y.dtype), x)
        return run

    return (time_call(looped(K), x, t) - time_call(looped(1), x, t)) / (K - 1)


def main():
    tag = (sys.argv[1:] or ["bf16"])[0]
    dt = jnp.bfloat16 if tag == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, IMG, IMG, 3)), dt)
    t = jnp.zeros((B,), jnp.int32)

    def build():
        model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
        params = model.init(jax.random.key(0), x, t)
        if tag == "bf16":
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params)
        return model, params

    model, params = build()
    base = time_model(model, params, x, t)
    print(f"{tag} full UNet        : {base*1e3:7.2f} ms", flush=True)

    # attention -> identity
    orig_attn = L.LinearAttention.__call__
    L.LinearAttention.__call__ = lambda self, xx: xx * 0.0
    try:
        m2, p2 = build()
        no_attn = time_model(m2, p2, x, t)
    finally:
        L.LinearAttention.__call__ = orig_attn
    print(f"{tag} attn ablated     : {no_attn*1e3:7.2f} ms "
          f"(attn+proj ~ {(base-no_attn)*1e3:.2f} ms)", flush=True)

    # fronts -> identity (isolate front cost).  NB: the package __init__
    # re-exports the function under the same name, shadowing the submodule
    # attribute -- fetch the real module from sys.modules
    import importlib

    importlib.import_module("colddiff.ops.pallas.convnext_front")
    F = sys.modules["colddiff.ops.pallas.convnext_front"]
    orig_front = F.convnext_front
    F.convnext_front = lambda xx, w, b, cond, g, bt, **kw: xx
    try:
        m3, p3 = build()
        no_front = time_model(m3, p3, x, t)
    finally:
        F.convnext_front = orig_front
    print(f"{tag} fronts ablated   : {no_front*1e3:7.2f} ms "
          f"(fronts ~ {(base-no_front)*1e3:.2f} ms)", flush=True)

    # dense 3x3 pair halved (mult=1 instead of 2)
    orig_mult = L.ConvNextBlock.mult
    L.ConvNextBlock.mult = 1
    try:
        m4, p4 = build()
        half = time_model(m4, p4, x, t)
    finally:
        L.ConvNextBlock.mult = orig_mult
    print(f"{tag} conv mult=1      : {half*1e3:7.2f} ms "
          f"(half the 3x3 FLOPs ~ {(base-half)*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
