"""Microbench the UNet's Downsample/Upsample convs at their real shapes.

ConvTranspose(4x4, stride 2) lowers to an input-dilated conv on TPU; this
measures whether the equivalent subkernel (space-to-depth) form is faster.

Variants per upsample shape:
  xla   : nn.ConvTranspose as the model uses it
  s2d   : four 2x2-subkernel matmuls + pixel interleave (same math)

Run: python scripts/bench_resample.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, ".")

B = 16
K = 32
RUNS = 3

DOWN_SHAPES = [(128, 64), (64, 128), (32, 256)]   # (in_px, dim)
UP_SHAPES = [(16, 512, 256), (32, 256, 128), (64, 128, 64)]  # in_px, cin, cout
# note: up blocks emit dim_in channels then upsample dim_in -> dim_in
UP_SHAPES = [(16, 256, 256), (32, 128, 128), (64, 64, 64)]


def force(o):
    return float(jnp.sum(o))


def timeit(fn, *args):
    """Time fn via a shape-preserving loop: fn must map x -> same shape.
    (A loop-invariant body gets hoisted by XLA and times as zero.)"""

    def looped(kk):
        @jax.jit
        def run(x, *w):
            return jax.lax.fori_loop(0, kk, lambda i, y: fn(y, *w), x)

        return run

    f1, fk = looped(1), looped(K)
    force(f1(*args)); force(fk(*args))
    t0 = time.time()
    for _ in range(RUNS):
        force(fk(*args))
    tk = (time.time() - t0) / RUNS
    t0 = time.time()
    for _ in range(RUNS):
        force(f1(*args))
    t1 = (time.time() - t0) / RUNS
    return (tk - t1) / (K - 1)


def conv_transpose_xla(x, w, b):
    # mirror nn.ConvTranspose(dim, (4,4), strides 2, SAME)
    y = jax.lax.conv_transpose(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def conv_transpose_s2d(x, w, b):
    """Same math as SAME conv_transpose(4x4, s2) via 4 subkernel convs.

    Output pixel (2i+di, 2j+dj) sums input taps with kernel rows/cols of
    matching parity: a 2x2 conv per (di, dj) phase, then interleave.
    """
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    # Probed map (see git history): out[o] += x[i] * w[2i + 2 - o] per axis.
    # Phase o = 2i' + d taps kernel rows r with (r + d) even, at input offset
    # delta = (r - 2 + d) / 2 in {-1, 0} (d=0) or {0, 1} (d=1).
    phases = []
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for d0 in (0, 1):
        row = []
        for d1 in (0, 1):
            rows = [r for r in range(4) if (r + d0) % 2 == 0]
            cols = [c for c in range(4) if (c + d1) % 2 == 0]
            sub = w[jnp.array(rows)][:, jnp.array(cols)]  # [2,2,cin,cout]
            offs_r = [(r - 2 + d0) // 2 for r in rows]
            offs_c = [(c - 2 + d1) // 2 for c in cols]
            # gather shifted views from padded input and matmul
            acc = 0
            for a, orr in enumerate(offs_r):
                for bb, occ in enumerate(offs_c):
                    xv = jax.lax.dynamic_slice(
                        xp, (0, 1 + orr, 1 + occ, 0), (bsz, h, wdt, cin)
                    )
                    acc = acc + jnp.einsum(
                        "bhwc,cd->bhwd", xv, sub[a, bb]
                    )
            row.append(acc)
        phases.append(row)
    # interleave phases: out[2i+d0, 2j+d1] = phases[d0][d1][i, j]
    out = jnp.stack(
        [jnp.stack([phases[0][0], phases[0][1]], axis=3),
         jnp.stack([phases[1][0], phases[1][1]], axis=3)],
        axis=2,
    )  # [b, h, 2, w, 2, cout]
    return out.reshape(bsz, 2 * h, 2 * wdt, cout) + b


def down4x4(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def main():
    rng = np.random.default_rng(0)
    # time down+up round trips at the real model shapes; the variant
    # difference isolates the upsample implementation.
    print("-- down(4x4 s2) + up(4x4 s2) round trip, per variant --", flush=True)
    for up_px, c, _ in UP_SHAPES:
        hi = 2 * up_px
        x = jnp.asarray(rng.standard_normal((B, hi, hi, c)), jnp.float32)
        wd = jnp.asarray(rng.standard_normal((4, 4, c, c)) * 0.05, jnp.float32)
        wu = jnp.asarray(rng.standard_normal((4, 4, c, c)) * 0.05, jnp.float32)
        b = jnp.zeros((c,), jnp.float32)

        def pair_xla(x, wd, wu, b):
            return conv_transpose_xla(down4x4(x, wd, b), wu, b)

        def pair_s2d(x, wd, wu, b):
            return conv_transpose_s2d(down4x4(x, wd, b), wu, b)

        ya = np.asarray(pair_xla(x, wd, wu, b))
        yb = np.asarray(pair_s2d(x, wd, wu, b))
        err = np.abs(ya - yb).max() / (np.abs(ya).max() + 1e-9)
        t_x = timeit(pair_xla, x, wd, wu, b)
        t_s = timeit(pair_s2d, x, wd, wu, b)
        print(
            f"  up@{up_px:3d}px c{c:3d}: pair-xla {t_x*1e6:8.1f} us   "
            f"pair-s2d {t_s*1e6:8.1f} us   rel-err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
