"""End-to-end flagship UNet forward under each Pallas dispatch mode.

The block-level microbench (scripts/bench_block.py) ranks the candidates at
the level-0 shape, but in the live UNet XLA fuses across block boundaries,
so dispatch defaults are decided HERE, end to end:

  front  -- production: Pallas ConvNeXt front ON (default dispatch)
  xla    -- no Pallas at all (COLDDIFF_NO_PALLAS=1)

(The round-4 'block' mode is gone: the fused ConvNeXt-block kernel won its
microbench, lost end to end -- 15.55 vs 14.40 ms/fwd -- and was deleted with
its COLDDIFF_NO_BLOCK_FUSION switch; both live in git history.)

Dispatch reads env at trace time, so each mode runs in a subprocess.

Run (real TPU):  python scripts/bench_fwd_modes.py [fp32] [bN]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

CHILD = r"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from colddiff.models import UnetConvNext

dtype = jnp.float32 if sys.argv[1] == "fp32" else jnp.bfloat16
B = int(sys.argv[2]); K = 16; RUNS = 3
model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
x0 = jnp.zeros((2, 128, 128, 3), jnp.float32)
params = model.init(jax.random.key(0), x0, jnp.zeros((2,), jnp.int32))
params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

def fwd(p, x, t):
    return model.apply(p, x.astype(dtype), t).astype(jnp.float32)

def looped(k):
    @jax.jit
    def run(p, x, t):
        def body(i, xx):
            return fwd(p, xx, t) * 0.5 + xx * 0.5
        return jax.lax.fori_loop(0, k, body, x)
    return run

def force(y):
    return float(jnp.sum(y))

def timeit(fn, *a):
    force(fn(*a))
    t0 = time.time()
    for _ in range(RUNS):
        force(fn(*a))
    return (time.time() - t0) / RUNS

x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 128, 128, 3)),
                jnp.float32)
t = jnp.zeros((B,), jnp.int32)
t_k = timeit(looped(K), params, x, t)
t_1 = timeit(looped(1), params, x, t)
print(f"RESULT {(t_k - t_1) / (K - 1) * 1e3:.3f}", flush=True)
"""

MODES = {
    "front": {},
    "xla": {"COLDDIFF_NO_PALLAS": "1"},
}


def main():
    prec = "fp32" if "fp32" in sys.argv[1:] else "bf16"
    b = next((int(a[1:]) for a in sys.argv[1:] if a.startswith("b")), 16)
    out = {}
    for name, env in MODES.items():
        e = dict(os.environ, **env)
        r = subprocess.run(
            [sys.executable, "-c", CHILD, prec, str(b)],
            capture_output=True, text=True, env=e, timeout=1800)
        ms = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                ms = float(line.split()[1])
        if ms is None:
            print(f"{name}: FAILED\n{r.stdout[-800:]}\n{r.stderr[-800:]}",
                  flush=True)
        else:
            out[name] = ms
            print(f"{name:6s} {ms:7.3f} ms/fwd  (B={b} {prec})", flush=True)
    print(json.dumps({"b": b, "prec": prec, "ms": out}), flush=True)


if __name__ == "__main__":
    main()
