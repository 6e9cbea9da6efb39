"""Streaming linear-attention context kernel (NEGATIVE RESULT -- not wired).

The folded LinearAttention (colddiff/models/layers.py,
deblurring_diffusion_pytorch.py:167-187 semantics) reduces the whole block to

  ctx[d,e]  = sum_n softmax_n(k)[n,d] * v[n,e]      (k, v = x @ Wk, x @ Wv)
  y         = x @ (scale * Wq @ (mask*ctx) @ Wout) + bout

This kernel computes ctx in ONE streaming pass over x with flash-attention-
style online softmax: per token tile it projects k,v in VMEM and maintains
running (max, denom, ctx) accumulators, rescaling by exp(m_old - m_new) when
the running per-channel max moves.  The context is accumulated TRANSPOSED
(ctxT[e,d], softmax channel d on the lane axis) so the rescale and the
denominator division are lane-wise broadcasts -- no vector transposes.

Measured on v5e at the flagship level-0 attention block (B=16 @128px c64,
fp32, scripts/bench_attn.py): this kernel 866 us vs XLA's own fusion of the
folded graph at 471 us -- XLA streams the kv projection + softmax + context
contraction below what the hand kernel achieves at these shapes, so the
kernel is kept only as a tested reference (interpreter parity + VJP in git
history) and the production path is the plain-XLA folded form.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = [
    "attn_context",
    "attn_context_reference",
    "pallas_attn_supported",
]

_HID = 128  # heads * dim_head in both UNet families (4 * 32)


def attn_context_reference(xt, wkv):
    """Plain-XLA reference: returns (ctxT [B,HID,HID], denom [B,1,HID]).

    ctxT[b, e, d] = sum_n exp(k[n,d] - max_n k[:,d]) * v[n,e];
    denom[b,0,d] = sum_n exp(k[n,d] - max_n k[:,d]).
    """
    kv = jnp.einsum("bnc,ck->bnk", xt.astype(jnp.float32),
                    wkv.astype(jnp.float32))
    k, v = kv[..., :_HID], kv[..., _HID:]
    m = jnp.max(k, axis=1, keepdims=True)
    e = jnp.exp(k - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    ctx_t = jnp.einsum("bne,bnd->bed", v, e)
    return ctx_t, denom


def _kernel(x_ref, wkv_ref, ctx_ref, den_ref, m_s, d_s, ctx_s):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        d_s[...] = jnp.zeros_like(d_s)
        ctx_s[...] = jnp.zeros_like(ctx_s)

    x = x_ref[0].astype(jnp.float32)                      # [TN, c]
    w = wkv_ref[...].astype(jnp.float32)                  # [c, 2*HID]
    kv = jnp.dot(x, w, preferred_element_type=jnp.float32)
    k = kv[:, :_HID]                                      # [TN, HID] lanes=d
    v = kv[:, _HID:]                                      # [TN, HID] lanes=e
    m_old = m_s[...]                                      # [1, HID]
    m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
    corr = jnp.exp(m_old - m_new)                         # [1, HID] lanes=d
    e = jnp.exp(k - m_new)                                # [TN, HID]
    d_s[...] = d_s[...] * corr + jnp.sum(e, axis=0, keepdims=True)
    # ctxT[e_i, d_j] += sum_n v[n, e_i] * e[n, d_j]: contract sublanes
    ctx_s[...] = ctx_s[...] * corr + jax.lax.dot_general(
        v, e, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_s[...] = m_new

    @pl.when(i == nt - 1)
    def _flush():
        ctx_ref[0] = ctx_s[...]
        den_ref[0] = d_s[...]


def _pick_tile(n: int) -> int:
    for tn in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % tn == 0:
            return tn
    return n


def attn_context_pallas(xt, wkv, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n, c = xt.shape
    tn = _pick_tile(n)
    grid = (bsz, n // tn)
    ctx_t, denom = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * _HID), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _HID, _HID), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _HID), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, _HID, _HID), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, _HID), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _HID), jnp.float32),
            pltpu.VMEM((1, _HID), jnp.float32),
            pltpu.VMEM((_HID, _HID), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt, wkv)
    return ctx_t, denom


def pallas_attn_supported(xt) -> bool:
    """fp32 path, lane-aligned channels, whole-N tiling, VMEM-bounded."""
    if os.environ.get("COLDDIFF_NO_PALLAS"):
        return False
    bsz, n, c = xt.shape
    if xt.dtype != jnp.float32:
        return False
    if c % 8 != 0 or c > 512:
        return False
    if n % 8 != 0 or n < 64:
        return False
    tn = _pick_tile(n)
    # x tile + kv/e/v temporaries, fp32, x2 buffering headroom
    vmem = 2 * tn * max(c, 128) * 4 + 3 * tn * 2 * _HID * 4
    return vmem < 48 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ctx(xt, wkv, interpret):
    return attn_context_pallas(xt, wkv, interpret=interpret)


def _fwd(xt, wkv, interpret):
    return attn_context_pallas(xt, wkv, interpret=interpret), (xt, wkv)


def _bwd(interpret, res, g):
    xt, wkv = res
    _, vjp = jax.vjp(attn_context_reference, xt, wkv)
    return vjp(g)


_ctx.defvjp(_fwd, _bwd)


def attn_context(xt, wkv, force: str | None = None):
    """(ctxT, denom) as in :func:`attn_context_reference`.

    Default: the streaming Pallas kernel on TPU for supported fp32 shapes,
    plain XLA otherwise.  ``force``: "pallas" | "xla" | "interpret";
    COLDDIFF_NO_PALLAS=1 disables the kernel globally.
    """
    if force == "interpret":
        return _ctx(xt, wkv, True)
    use_pallas = _on_tpu() and pallas_attn_supported(xt)
    if force == "xla" or (force is None and not use_pallas):
        return attn_context_reference(xt, wkv)
    return _ctx(xt, wkv, False)
