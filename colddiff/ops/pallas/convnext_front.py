"""Fused ConvNeXt block front: depthwise 7x7 conv + time bias + LayerNorm.

Profiling the flagship UNet on v5e shows the block front is the bandwidth
bottleneck: XLA runs dw-conv (~1.5 ms at level 0), the conditioning add and
the per-pixel channel LayerNorm as separate HBM passes over 67 MB tensors.
This kernel keeps an H-tile resident in VMEM and does all three in one pass:

  out = LN(dwconv7x7(x) + bias_dw + cond)        (ConvNextBlock, see
  deblurring_diffusion_pytorch.py:135-165 for the reference block)

Design:
  - the input is zero-padded by 3 in H/W once in XLA (cheap copy), so every
    grid program DMAs a *static-size* [Ht+6, W+6, C] halo window from HBM;
  - the 49 taps unroll to shifted multiply-adds on the VMEM tile (VPU);
  - channel stats ride the lane axis (C last), so LayerNorm is a native
    lane reduction;
  - grid = (B, H / Ht); backward is a recompute custom VJP in plain XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["convnext_front", "convnext_front_reference"]


def convnext_front_reference(x, w, b, cond, gamma, beta, *, norm=True,
                             eps: float = 1e-5):
    """Plain-XLA reference. x: [B,H,W,C]; w: [7,7,C]; b, gamma, beta: [C];
    cond: [B,C] or None."""
    c = x.shape[-1]
    # flax-Conv promotion semantics: mixed input/param dtypes compute in the
    # promoted dtype (bf16 activations + fp32 params -> fp32)
    dt = jnp.promote_types(x.dtype, w.dtype)
    x, w = x.astype(dt), w.astype(dt)
    h = jax.lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + b
    if cond is not None:
        h = h + cond[:, None, None, :]
    if norm:
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return h


def _kernel(xp_ref, w_ref, b_ref, cond_ref, g_ref, bt_ref, o_ref,
            *, hgt: int, w_dim: int, norm: bool, eps: float):
    xp = xp_ref[0]  # [H+6, W+6, C]
    acc = None
    for dy in range(7):
        for dx in range(7):
            term = xp[dy : dy + hgt, dx : dx + w_dim, :] * w_ref[dy, dx, :]
            acc = term if acc is None else acc + term
    h = acc + b_ref[:] + cond_ref[0, 0]
    if norm:
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + bt_ref[:]
    o_ref[0] = h.astype(o_ref.dtype)


def _vmem_estimate(hgt, wid, c, itemsize):
    lanes = -(-c // 128) * 128
    inp = (hgt + 6) * (wid + 6) * lanes * itemsize
    out = hgt * wid * lanes * itemsize
    return 2 * (inp + out)  # double buffering


def pallas_supported(x) -> bool:
    bsz, hgt, wid, c = x.shape
    if c % 8 != 0:  # tiny channel counts (the 3-channel stem) stay on XLA
        return False
    return _vmem_estimate(hgt, wid, c, x.dtype.itemsize) < 100 * 1024 * 1024


def _pallas_forward(x, w, b, cond, gamma, beta, norm, eps, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hgt, wid, c = x.shape
    if cond is None:
        cond = jnp.zeros((bsz, c), x.dtype)
    cond3 = cond.reshape(bsz, 1, c)  # (1, 1, C) blocks satisfy tiling rules

    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))

    # whole-image blocks: full trailing dims are exempt from the 8/128 tiling
    # rules, and one (batch)-grid program per image keeps the pipeline simple
    out = pl.pallas_call(
        functools.partial(_kernel, hgt=hgt, w_dim=wid, norm=norm, eps=eps),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hgt + 6, wid + 6, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, 7, c), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hgt, wid, c), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hgt, wid, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w, b, cond3, gamma, beta)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _front(x, w, b, cond, gamma, beta, norm, eps, interpret):
    return _pallas_forward(x, w, b, cond, gamma, beta, norm, eps, interpret)


def _front_fwd(x, w, b, cond, gamma, beta, norm, eps, interpret):
    y = _pallas_forward(x, w, b, cond, gamma, beta, norm, eps, interpret)
    return y, (x, w, b, cond, gamma, beta)


def _front_bwd(norm, eps, interpret, res, g):
    x, w, b, cond, gamma, beta = res
    had_cond = cond is not None

    def f(x, w, b, cond, gamma, beta):
        return convnext_front_reference(x, w, b, cond, gamma, beta,
                                        norm=norm, eps=eps)

    if had_cond:
        _, vjp = jax.vjp(f, x, w, b, cond, gamma, beta)
        return vjp(g)
    _, vjp = jax.vjp(lambda x, w, b, gamma, beta: f(x, w, b, None, gamma, beta),
                     x, w, b, gamma, beta)
    dx, dw, db, dgamma, dbeta = vjp(g)
    return dx, dw, db, None, dgamma, dbeta


_front.defvjp(_front_fwd, _front_bwd)


def convnext_front(x, w, b, cond, gamma, beta, *, norm: bool = True,
                   eps: float = 1e-5, force: str | None = None):
    """Fused dw7x7 + bias + cond + LayerNorm; dispatch like the other kernels."""
    if force == "interpret":
        return _front(x, w, b, cond, gamma, beta, norm, eps, True)
    # Measured on v5e (flagship UNet, B=16 @128px): 33.9 ms/call fused vs
    # 27.6 ms on XLA -- the 49 unrolled VPU taps with 2x lane padding (C=64)
    # lose to XLA's conv lowering, so this kernel is opt-in for further
    # tuning (COLDDIFF_FORCE_PALLAS=1).
    use_pallas = (
        not os.environ.get("COLDDIFF_NO_PALLAS")
        and os.environ.get("COLDDIFF_FORCE_PALLAS")
        and jax.default_backend() == "tpu"
        and pallas_supported(x)
    )
    if force == "xla" or (force is None and not use_pallas):
        return convnext_front_reference(x, w, b, cond, gamma, beta, norm=norm,
                                        eps=eps)
    return _front(x, w, b, cond, gamma, beta, norm, eps, False)
