"""Fused GroupNorm(+swish) Pallas kernel for the DDPM ResNet UNet.

The ResNet UNet calls GroupNorm(32) + swish before every conv (Model2.py:
Normalize :32-33, nonlinearity :27-29).  Plain XLA computes the moments and
the normalize/affine/swish as separate HBM passes; this kernel does
moments + normalize + affine + swish in one VMEM pass per (batch, group).

Layout: x reshaped to [B, G, S] with S = H*W*channels_per_group; one grid
program per (b, g) row; gamma/beta enter pre-broadcast as [B?, G, S] slices of
the channel parameters -- we instead pass them as [G, S_c] tiles and broadcast
inside, where S_c = channels_per_group (parameters vary only over channels).
Backward: custom VJP in plain XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["group_norm_swish", "group_norm_swish_reference"]


def group_norm_swish_reference(x, gamma, beta, num_groups: int, eps: float = 1e-6,
                               swish: bool = True):
    """[B, H, W, C] GroupNorm + optional swish, plain XLA."""
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h * w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c) * gamma + beta
    return xn * jax.nn.sigmoid(xn) if swish else xn


def _kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float, swish: bool):
    x = x_ref[0]  # [S, Cg]  (S = H*W tokens, Cg = channels in this group)
    mean = jnp.mean(x)
    var = jnp.mean((x - mean) ** 2)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    y = xn * g_ref[0] + b_ref[0]
    if swish:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_forward(x, gamma, beta, num_groups, eps, swish, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    g = num_groups
    cg = c // g
    xg = x.reshape(b, h * w, g, cg).transpose(0, 2, 1, 3).reshape(b * g, h * w, cg)
    gam = gamma.reshape(g, 1, cg)
    bet = beta.reshape(g, 1, cg)

    xspec = pl.BlockSpec((1, h * w, cg), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, cg), lambda i: (i % g, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, swish=swish),
        grid=(b * g,),
        in_specs=[xspec, pspec, pspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(xg.shape, x.dtype),
        interpret=interpret,
    )(xg, gam, bet)
    return out.reshape(b, g, h * w, cg).transpose(0, 2, 1, 3).reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_swish(x, gamma, beta, num_groups, eps, swish, interpret):
    return _pallas_forward(x, gamma, beta, num_groups, eps, swish, interpret)


def _gn_fwd(x, gamma, beta, num_groups, eps, swish, interpret):
    y = _pallas_forward(x, gamma, beta, num_groups, eps, swish, interpret)
    return y, (x, gamma, beta)


def _gn_bwd(num_groups, eps, swish, interpret, res, g):
    x, gamma, beta = res
    # recompute-based backward through the plain-XLA reference
    def f(x, gamma, beta):
        return group_norm_swish_reference(x, gamma, beta, num_groups, eps, swish)

    _, vjp = jax.vjp(f, x, gamma, beta)
    return vjp(g)


_gn_swish.defvjp(_gn_fwd, _gn_bwd)


def group_norm_swish(x, gamma, beta, num_groups: int = 32, eps: float = 1e-6,
                     swish: bool = True, force: str | None = None):
    """Dispatch wrapper (see linear_attention.linear_attention)."""
    if force == "interpret":
        return _gn_swish(x, gamma, beta, num_groups, eps, swish, True)
    # opt-in only: with 32 groups the per-group channel count (lane dim) is
    # tiny and pads to 128 lanes in VMEM -- XLA's fused moments win here.
    use_pallas = (
        not os.environ.get("COLDDIFF_NO_PALLAS")
        and os.environ.get("COLDDIFF_FORCE_PALLAS")
        and jax.default_backend() == "tpu"
    )
    if force == "xla" or (force is None and not use_pallas):
        return group_norm_swish_reference(x, gamma, beta, num_groups, eps, swish)
    return _gn_swish(x, gamma, beta, num_groups, eps, swish, False)
