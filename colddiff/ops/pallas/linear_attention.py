"""Fused linear-attention Pallas kernel for the ConvNeXt UNet.

The reference's LinearAttention (deblurring_diffusion_pytorch.py:167-187)
does softmax(k) over tokens, context = k_soft^T v, out = q_scaled @ context.
In plain XLA the softmaxed k ([B, N, H, D]) round-trips through HBM between
the softmax and the contraction; this kernel keeps per-(batch, head) q/k/v
tiles resident in VMEM and fuses max/exp/normalize/two-matmuls in one pass.

Layout: q, k, v are [B*H, N, D] (D = head dim, 32 by default).  One grid
program per (batch*head); N*D tiles for the canonical configs
(N <= 16k tokens at 128px) fit VMEM comfortably.

Backward is a custom VJP in plain XLA (cheap einsums; see _linear_attention_bwd
for the softmax-through-context derivation).  Falls back to the pure-jnp path
off-TPU (or under COLDDIFF_NO_PALLAS=1); tests run the kernel in interpreter
mode to pin kernel == reference math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["linear_attention", "linear_attention_reference"]


def linear_attention_reference(q, k, v, scale: float):
    """Plain-XLA path: softmax(k) over tokens -> context -> out.

    q, k, v: [G, N, D] (G = batch*heads).  Matches torch einsum semantics of
    the reference exactly.
    """
    ks = jax.nn.softmax(k, axis=1)
    context = jnp.einsum("gnd,gne->gde", ks, v)
    return jnp.einsum("gde,gnd->gne", context, q * scale)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # transposed layout [D, N]: tokens ride the 128-lane axis (D=32 as the
    # lane dim would pad 4x and overflow VMEM at N=16k)
    k = k_ref[0]  # [D, N]
    v = v_ref[0]
    q = q_ref[0]
    # per-channel softmax over tokens (last axis), fused in VMEM
    m = jnp.max(k, axis=1, keepdims=True)
    e = jnp.exp(k - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    ks = e / s
    # context[d, e] = sum_n ks[d, n] v[e, n]
    context = jax.lax.dot_general(
        ks, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [D, E]
    # out[e, n] = sum_d context[d, e] q_scaled[d, n]
    out = jax.lax.dot_general(
        context, q * scale, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_forward(q, k, v, scale: float, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, n, d = q.shape
    qt, kt, vt = (x.transpose(0, 2, 1) for x in (q, k, v))  # [G, D, N]
    spec = pl.BlockSpec((1, d, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g, d, n), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _linear_attention(q, k, v, scale, interpret):
    return _pallas_forward(q, k, v, scale, interpret)


def _linear_attention_fwd(q, k, v, scale, interpret):
    return _pallas_forward(q, k, v, scale, interpret), (q, k, v)


def _linear_attention_bwd(scale, interpret, res, g):
    q, k, v = res
    ks = jax.nn.softmax(k, axis=1)
    context = jnp.einsum("gnd,gne->gde", ks, v)
    dq = scale * jnp.einsum("gne,gde->gnd", g, context)
    dcontext = jnp.einsum("gnd,gne->gde", q * scale, g)
    dv = jnp.einsum("gnd,gde->gne", ks, dcontext)
    dks = jnp.einsum("gne,gde->gnd", v, dcontext)
    # softmax backward over the token axis, per channel
    dk = ks * (dks - jnp.sum(ks * dks, axis=1, keepdims=True))
    return dq, dk, dv


_linear_attention.defvjp(_linear_attention_fwd, _linear_attention_bwd)


def _use_pallas() -> bool:
    # Measured on TPU v5e (flagship UNet, B=16 @128px): the XLA path is ~4%
    # faster end-to-end than this kernel (the [G,N,D]<->[G,D,N] transposes
    # eat the fusion win), so XLA is the default and the kernel is opt-in
    # via COLDDIFF_FORCE_PALLAS=1 for further tuning.
    if os.environ.get("COLDDIFF_NO_PALLAS"):
        return False
    if not os.environ.get("COLDDIFF_FORCE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def linear_attention(q, k, v, scale: float, force: str | None = None):
    """Dispatch: XLA by default (measured faster), Pallas kernel opt-in,
    interpret under force='interpret'.

    q, k, v: [G, N, D].
    """
    if force == "interpret":
        return _linear_attention(q, k, v, scale, True)
    if force == "xla" or (force is None and not _use_pallas()):
        return linear_attention_reference(q, k, v, scale)
    return _linear_attention(q, k, v, scale, False)
