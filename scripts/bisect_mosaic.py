"""Bisect which construct in the packed C=64 front kernel crashes Mosaic."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, out_shape=None, grid=None, in_spec=None,
        out_spec=None):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=out_shape or jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=grid or (1,),
            in_specs=[in_spec or pl.BlockSpec(
                (1,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1),
                memory_space=pltpu.VMEM)],
            out_specs=out_spec or pl.BlockSpec(
                (1,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1),
                memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)
        print(f"{name}: OK sum={float(jnp.sum(y)):.3f}", flush=True)
    except Exception as e:
        print(f"{name}: {type(e).__name__}: {str(e)[:100]}", flush=True)


def k_roll(x_ref, o_ref):
    row = x_ref[0]
    o_ref[0] = pltpu.roll(row, row.shape[-1] - 64, 1)


def k_roll_slice(x_ref, o_ref):
    row = x_ref[0]
    r = pltpu.roll(row, row.shape[-1] - 64, 1)
    o_ref[0, :, :8192] = r[:, :8192]
    o_ref[0, :, 8192:] = row[:, 8192:]


def k_masked_norm(x_ref, o_ref):
    h = x_ref[0]
    hgt, wc = h.shape
    c = 64
    hr = h.reshape(hgt, wc // 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (hgt, wc // 128, 128), 2)
    mean = jnp.zeros_like(hr)
    for g in range(2):
        m = (lane >= g * c) & (lane < (g + 1) * c)
        s = jnp.sum(jnp.where(m, hr, 0.0), axis=-1, keepdims=True)
        mean = mean + jnp.where(m, s, 0.0)
    mean = mean * (1.0 / c)
    o_ref[0] = (hr - mean).reshape(hgt, wc)


def k_dyn_sublane(x_ref, o_ref, *, hgt_t):
    base = pl.program_id(0) * hgt_t
    acc = None
    for dy in range(7):
        row = x_ref[0, pl.ds(base + dy, hgt_t), :]
        acc = row if acc is None else acc + row
    o_ref[0] = acc


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 8576)), jnp.float32)
    run("roll_whole_row", k_roll, x)
    run("roll_then_slice", k_roll_slice, x)
    xn = jnp.asarray(rng.standard_normal((1, 64, 8192)), jnp.float32)
    run("masked_norm", k_masked_norm, xn)
    xd = jnp.asarray(rng.standard_normal((1, 70, 8576)), jnp.float32)
    run("dyn_sublane", functools.partial(k_dyn_sublane, hgt_t=32),
        xd, out_shape=jax.ShapeDtypeStruct((1, 64, 8576), jnp.float32),
        grid=(2,),
        in_spec=pl.BlockSpec((1, 70, 8576), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
        out_spec=pl.BlockSpec((1, 32, 8576), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM))


if __name__ == "__main__":
    main()
