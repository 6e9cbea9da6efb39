"""Root-cause the B>=32 wide-program cliff (VERDICT round-2 weak point 3).

Round 1 measured the direct B=64 UNet forward at ~1.8x the per-image cost of
B=16 (mitigated since by `apply_in_chunks`).  This pins down *where* the
cycles go, using XLA's own compiled artifacts rather than end-to-end timing:

  1. compiled memory stats per batch (argument/output/temp/peak bytes) --
     superlinear temp growth = spill evidence;
  2. optimized-HLO instruction histogram diff (fusion kinds, copies,
     all-reduce-free) between B=16 and B=64;
  3. per-batch timing of the forward with (a) default layout, (b) remat'd
     blocks, (c) COLDDIFF_NO_PALLAS=1 (kernel excluded) to separate the
     custom-kernel path from XLA scheduling.

Run on the real chip:  python scripts/analyze_b64_cliff.py [quick]
Writes docs/examples/b64_cliff_hlo.txt with the findings summary.
"""

import collections
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

IMG = 128
RUNS = 3
K = 8


def force(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def build(bf16=True):
    from colddiff.models import UnetConvNext

    model = UnetConvNext(dim=64, dim_mults=(1, 2, 4, 8), channels=3)
    x = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((2,), jnp.int32))
    if bf16:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
    return model, params


def fwd_fn(model, bf16=True):
    def f(p, x, t):
        out = model.apply(p, x.astype(jnp.bfloat16 if bf16 else x.dtype), t)
        return out.astype(jnp.float32)
    return f


def timeit(jitted, *args):
    def looped(k):
        @jax.jit
        def run(p, x, t):
            def body(i, y):
                return jitted(p, y, t).astype(y.dtype)
            return jax.lax.fori_loop(0, k, body, x)
        return run

    fk, f1 = looped(K), looped(1)
    force(fk(*args)); force(f1(*args))
    t0 = time.time()
    for _ in range(RUNS):
        force(fk(*args))
    tk = (time.time() - t0) / RUNS
    t0 = time.time()
    for _ in range(RUNS):
        force(f1(*args))
    t1 = (time.time() - t0) / RUNS
    return (tk - t1) / (K - 1)


def hlo_histogram(text):
    hist = collections.Counter()
    for line in text.splitlines():
        m = re.match(r"\s*(%?[\w.-]+)\s*=\s*\S+\s+(\w+)", line)
        if m:
            hist[m.group(2)] += 1
    return hist


def main():
    quick = "quick" in sys.argv[1:]
    model, params = build()
    f = fwd_fn(model)
    rng = np.random.default_rng(0)
    report = ["# B=16 vs B=64 wide-program analysis (bf16 compute)"]

    stats = {}
    for b in (16, 64):
        x = jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), jnp.float32)
        t = jnp.zeros((b,), jnp.int32)
        lowered = jax.jit(f).lower(params, x, t)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        row = {
            "temp_MB": round(mem.temp_size_in_bytes / 2**20, 1),
            "output_MB": round(mem.output_size_in_bytes / 2**20, 1),
            "peak_MB": round(getattr(mem, "peak_memory_in_bytes", 0) / 2**20, 1),
        }
        try:
            txt = compiled.as_text()
            row["hlo_hist"] = hlo_histogram(txt)
            row["hlo_lines"] = len(txt.splitlines())
        except Exception as e:
            row["hlo_err"] = str(e)[:80]
        if not quick:
            dt = timeit(f, params, x, t)
            row["ms_per_call"] = round(dt * 1e3, 2)
            row["ms_per_img"] = round(dt * 1e3 / b, 3)
        stats[b] = row
        print(b, {k: v for k, v in row.items() if k != "hlo_hist"}, flush=True)

    report.append(f"\n## Compiled memory analysis\n")
    for b, row in stats.items():
        report.append(
            f"B={b}: temp {row['temp_MB']} MB, output {row['output_MB']} MB, "
            f"peak {row.get('peak_MB')} MB, "
            f"{row.get('ms_per_img', '?')} ms/img")
    t16, t64 = stats[16].get("temp_MB", 0), stats[64].get("temp_MB", 0)
    if t16:
        report.append(
            f"temp scaling x{t64 / t16:.2f} for 4x batch "
            f"({'superlinear -> spill pressure' if t64 > 4.5 * t16 else 'linear -> not spills'})")

    if "hlo_hist" in stats[16] and "hlo_hist" in stats[64]:
        h16, h64 = stats[16]["hlo_hist"], stats[64]["hlo_hist"]
        report.append("\n## HLO op-count diff (B=64 minus B=16, top deltas)\n")
        keys = set(h16) | set(h64)
        deltas = sorted(keys, key=lambda k: -abs(h64.get(k, 0) - h16.get(k, 0)))
        for k in deltas[:15]:
            d = h64.get(k, 0) - h16.get(k, 0)
            if d:
                report.append(f"{k}: {h16.get(k, 0)} -> {h64.get(k, 0)} ({d:+d})")

    out = "\n".join(report)
    with open("docs/examples/b64_cliff_hlo.txt", "w") as fh:
        fh.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
