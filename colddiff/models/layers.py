"""Shared Flax layers for both UNet families (NHWC, TPU-native layout).

Functional parity targets (architecture, not weights):
  ConvNeXt family: deblurring_diffusion_pytorch.py:83-187 and
  snowification/diffusion/model/unet_convnext.py.
  ResNet family:   deblurring-diffusion-pytorch/.../Model2.py:6-188.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "SinusoidalPosEmb",
    "ChannelLayerNorm",
    "ConvNextBlock",
    "LinearAttention",
    "linear_attention",
    "linear_attention_blockdiag",
    "linear_attention_folded",
    "SoftmaxAttention",
    "Downsample",
    "Upsample",
    "gelu",
    "swish",
]


def gelu(x):
    """GELU: exact erf form in fp32+, tanh form for sub-fp32 activations.

    torch nn.GELU default is the exact erf form (jax default is tanh approx),
    so fp32/fp64 compute keeps erf bit-for-bit for the torch-parity goldens.
    For bf16 activations the tanh form is used: |erf_gelu - tanh_gelu| <=
    4.8e-4 absolute everywhere (1.8e-4 relative at its x~2.7 peak), below the
    bf16 quantization step for any activation of magnitude >= 0.12 and
    subdominant to the bf16 input rounding the matmuls already absorb -- while
    erf costs +2.6 ms/call on the flagship UNet's VPU-bound bf16 forward
    (tanh +0.15 ms over relu; measured on v5e, docs/PERF.md)."""
    exact = jnp.issubdtype(x.dtype, jnp.floating) and jnp.finfo(x.dtype).bits >= 32
    return jax.nn.gelu(x, approximate=not exact)


def swish(x):
    return x * jax.nn.sigmoid(x)


class SinusoidalPosEmb(nn.Module):
    """Transformer sinusoidal timestep embedding (deblurring...py:91-103)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
        ang = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _stat_dtype(x):
    """Statistics (mean/var/softmax) run in at-least-fp32: bf16 accumulation
    over 16k tokens / wide channels is where half precision actually loses
    bits; the matmuls' MXU accumulators are fp32 regardless of input dtype."""
    return jnp.promote_types(x.dtype, jnp.float32)


class ChannelLayerNorm(nn.Module):
    """Per-pixel channel LayerNorm with biased variance (deblurring...py:111-121)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.param("scale", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(_stat_dtype(x))
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return xn * g + b


def group_norm_swish(x, gamma, beta, num_groups: int, eps: float = 1e-6,
                     swish: bool = True):
    """[B, H, W, C] GroupNorm + optional swish (Model2.py Normalize :32-33,
    nonlinearity :27-29).  Plain XLA: a round-1 Pallas version measured
    *slower* than XLA's fusion of exactly this code and was deleted
    (docs/ROADMAP.md round-2 notes)."""
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h * w, g, c // g).astype(_stat_dtype(x))
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    xn = xn.reshape(b, h, w, c) * gamma + beta
    return xn * jax.nn.sigmoid(xn) if swish else xn


class FusedGroupNormSwish(nn.Module):
    """GroupNorm(32, eps 1e-6) optionally fused with swish (XLA-fused)."""

    num_groups: int = 32
    eps: float = 1e-6
    swish: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_swish(x, gamma, beta, self.num_groups, self.eps,
                                self.swish)


class _DWConvParams(nn.Module):
    """Parameter container with nn.Conv-compatible tree (ds_conv/kernel,bias)."""

    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 1, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """Parameter container matching ChannelLayerNorm (norm/scale,bias)."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return g, b


class ConvNextBlock(nn.Module):
    """ConvNeXt block: depthwise 7x7 + (norm -> 3x3 -> GELU -> 3x3) + residual.

    Parity: deblurring_diffusion_pytorch.py:135-165.  The block front
    (dw conv + time bias + LayerNorm) runs as one fused Pallas pass on TPU
    (colddiff/ops/pallas/convnext_front.py); the parameter tree is identical
    either way, so checkpoints are interchangeable.
    """

    dim_out: int
    mult: int = 2
    norm: bool = True
    time_emb: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..ops.pallas.convnext_front import convnext_front

        dim = x.shape[-1]
        cond = None
        if self.time_emb and t is not None:
            cond = nn.Dense(dim, name="mlp_dense")(gelu(t))
        dw_k, dw_b = _DWConvParams(dim, name="ds_conv")()
        if self.norm:
            g, b = _LNParams(dim, name="norm")()
        else:
            g = b = jnp.ones((dim,), x.dtype)  # unused when norm=False
        h = convnext_front(
            x, dw_k[:, :, 0, :], dw_b, cond, g, b, norm=self.norm
        )
        h = nn.Conv(self.dim_out * self.mult, (3, 3), padding=1, name="net_conv1")(h)
        h = gelu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, name="net_conv2")(h)
        if dim != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        return h + x


def linear_attention(q, k, v, scale: float):
    """softmax(k) over tokens -> context = k v^T -> out = context^T q
    (deblurring_diffusion_pytorch.py:180-186 torch einsum semantics).
    q, k, v: [G, N, D] (G = batch*heads).  Naive per-head reference kept for
    tests; the module below uses the lane-aligned block-diagonal form."""
    ks = jax.nn.softmax(k, axis=1)
    context = jnp.einsum("gnd,gne->gde", ks, v)
    return jnp.einsum("gde,gnd->gne", context, q * scale)


def linear_attention_blockdiag(q, k, v, heads: int, scale: float):
    """Same math as :func:`linear_attention`, but heads are never split.

    q, k, v: [B, N, heads*D] in head-major channel order (h*D + d).  The
    token softmax is per-channel, so it needs no head split; the per-head
    context matrices are exactly the diagonal blocks of the full [C, C]
    contraction, recovered with a static block mask.  Everything stays at
    the native 128-lane width (C = 4*32 = 128 in this family) with zero
    transposes -- measured 2.8x faster than the transposed per-head form at
    the flagship level-0 shape (scripts/bench_attn.py: 1827 vs 5118 us,
    B=16 @128px fp32).  FLOP overhead vs per-head is `heads`x on the two
    context matmuls, which are N*C*C -- negligible next to the data movement
    the transposes cost."""
    c = q.shape[-1]
    d = c // heads
    i = jnp.arange(c)
    mask = ((i[:, None] // d) == (i[None, :] // d)).astype(q.dtype)
    ks = jax.nn.softmax(k, axis=1)
    context = jnp.einsum("bnc,bne->bce", ks, v) * mask
    return jnp.einsum("bce,bnc->bne", context, q * scale)


def linear_attention_folded(xt, wqkv, wout, bout, heads: int, scale: float):
    """Linear attention with the q-side algebra folded into the weights.

    Same math as :func:`linear_attention_blockdiag` followed by the 1x1
    out-projection, reassociated: q enters the output linearly
    (out = (q*scale) @ ctx @ Wout), so instead of materializing q [B,N,hid]
    and out [B,N,hid], fold W1_b = scale*Wq @ ctx_b per batch and apply it
    as one matmul over tokens.  Only k and v are ever projected (2/3 of the
    qkv matmul); when c <= hidden, Wout folds in too and the whole q-side is
    a single [B,N,c] @ [c,cout] matmul.

    xt: [B, N, c]; wqkv: [c, 3*hidden]; wout: [hidden, cout]; bout: [cout].
    """
    c = xt.shape[-1]
    hidden = wqkv.shape[-1] // 3
    d = hidden // heads
    i = jnp.arange(hidden)
    mask = ((i[:, None] // d) == (i[None, :] // d)).astype(xt.dtype)
    # XLA fuses this folded graph to ~the bandwidth floor (471 us at the
    # flagship level-0 shape, 11x the naive per-head form); a streaming
    # Pallas online-softmax context kernel measured SLOWER (866 us) and was
    # deleted per the no-losing-kernels policy (scripts/bench_attn.py).
    kv = jnp.einsum("bnc,ck->bnk", xt, wqkv[:, hidden:])
    # token softmax in fp32: a bf16 exp-sum over N=16k tokens loses ~7 bits
    ks = jax.nn.softmax(kv[..., :hidden].astype(_stat_dtype(kv)),
                        axis=1).astype(xt.dtype)
    ctx = jnp.einsum("bnd,bne->bde", ks, kv[..., hidden:]) * mask
    w1 = jnp.einsum("cd,bde->bce", wqkv[:, :hidden] * scale, ctx)
    if c <= hidden:
        return jnp.einsum("bnc,bcf->bnf", xt, w1 @ wout) + bout
    return jnp.einsum("bne,ef->bnf", jnp.einsum("bnc,bce->bne", xt, w1), wout) + bout


class _Conv1x1Params(nn.Module):
    """Parameter container with nn.Conv-compatible tree (kernel[1,1,ci,co])."""

    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, self.cout)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.cout,))
            if self.use_bias else None
        )
        return k, b


class LinearAttention(nn.Module):
    """Linear attention over H*W tokens (deblurring_diffusion_pytorch.py:167-187).

    softmax(k) over tokens -> context = k v^T -> out = context^T q,
    O(N d^2) instead of O(N^2 d).  Runs in the folded no-transpose form
    (:func:`linear_attention_folded`): heads are never split (token softmax
    is per-channel; per-head contexts are the diagonal blocks of one [hid,
    hid] contraction) and the q/out projections are folded into a per-batch
    weight.  The parameter tree is identical to the naive per-head form, so
    checkpoints are unaffected.
    """

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hgt, wid, c = x.shape
        n = hgt * wid
        hidden = self.heads * self.dim_head
        wqkv, _ = _Conv1x1Params(c, hidden * 3, use_bias=False, name="to_qkv")()
        wout, bout = _Conv1x1Params(hidden, c, name="to_out")()
        out = linear_attention_folded(
            x.reshape(b, n, c), wqkv[0, 0], wout[0, 0], bout,
            self.heads, self.dim_head**-0.5,
        )
        return out.reshape(b, hgt, wid, c)


class SoftmaxAttention(nn.Module):
    """Full softmax self-attention at low resolution (Model2.py:136-188)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hgt, wid, c = x.shape
        h = FusedGroupNormSwish(swish=False, name="norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hgt * wid, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hgt * wid, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hgt * wid, c)
        w = jnp.einsum("bic,bjc->bij", q, k).astype(_stat_dtype(q)) * (c**-0.5)
        w = jax.nn.softmax(w, axis=2).astype(q.dtype)
        out = jnp.einsum("bij,bjc->bic", w, v).reshape(b, hgt, wid, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


def Downsample(dim: int, name: str = None) -> nn.Module:
    """Stride-2 4x4 conv (deblurring...py:105-109)."""
    return nn.Conv(dim, (4, 4), strides=(2, 2), padding=1, name=name)


def Upsample(dim: int, name: str = None) -> nn.Module:
    """Stride-2 4x4 transposed conv (deblurring...py:105-106)."""
    return nn.ConvTranspose(dim, (4, 4), strides=(2, 2), padding="SAME", name=name)
