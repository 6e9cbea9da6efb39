"""A/B/C bench of LinearAttention formulations at the level-0 shape.

Candidates (same math, same params; parity asserted before timing):
  A current : split to [B*H, N, D] with explicit transposes (round-1 layers.py)
  B bnhd    : transpose-free einsums on [B, N, H, D]
  C blockdiag: never split heads -- softmax over tokens is per-channel, and
     with H*D == 128 the per-head context is the block-diagonal of one full
     [C, C] contraction; mask it and contract back.  Everything stays
     [B, N, 128] (native lane width), zero transposes/reshapes.
  D folded  : C plus the q-side algebra folded into the weights -- q enters
     the output linearly, so the q projection, context application, and out
     projection collapse into one per-batch [c, c] matmul (production form).

Measured at (16,128,128,64) fp32: A 5225, B 4595, C 1677, D 471 us.
A streaming Pallas online-softmax context kernel (one pass over x, flash-
style running max/denom/ctx accumulators, ctx stored transposed so rescales
are lane-wise) measured 866 us against D's 471 and was deleted -- XLA fuses
the folded graph below what the hand kernel achieved (git history
`colddiff/ops/pallas/linear_attn.py` has the kernel).

In-program looped timing (single dispatches cost ~26 ms through the axon
tunnel -- CLAUDE.md perf notes).

Run: python scripts/bench_attn.py [fp32|bf16]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B, IMG, C = 16, 128, 64
HEADS, DH = 4, 32
HID = HEADS * DH
K = 16
RUNS = 3
SCALE = DH ** -0.5


def conv1x1(x, w):
    return jnp.einsum("bhwc,cd->bhwd", x, w)


def attn_current(x, wqkv, wout, bout):
    from colddiff.models.layers import linear_attention

    b, hgt, wid, _ = x.shape
    n = hgt * wid
    qkv = conv1x1(x, wqkv).reshape(b, n, 3, HEADS, DH)
    q, k, v = (
        qkv[:, :, i].transpose(0, 2, 1, 3).reshape(b * HEADS, n, DH)
        for i in range(3)
    )
    out = linear_attention(q, k, v, SCALE)
    out = out.reshape(b, HEADS, n, DH).transpose(0, 2, 1, 3).reshape(b, hgt, wid, HID)
    return conv1x1(out, wout) + bout


def attn_bnhd(x, wqkv, wout, bout):
    b, hgt, wid, _ = x.shape
    n = hgt * wid
    qkv = conv1x1(x, wqkv).reshape(b, n, 3, HEADS, DH)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ks = jax.nn.softmax(k, axis=1)
    ctx = jnp.einsum("bnhd,bnhe->bhde", ks, v)
    out = jnp.einsum("bhde,bnhd->bnhe", ctx, q * SCALE)
    return conv1x1(out.reshape(b, hgt, wid, HID), wout) + bout


def _head_mask(dtype):
    i = np.arange(HID)
    m = (i[:, None] // DH) == (i[None, :] // DH)
    return jnp.asarray(m, dtype)


def attn_blockdiag(x, wqkv, wout, bout):
    b, hgt, wid, _ = x.shape
    n = hgt * wid
    qkv = conv1x1(x, wqkv).reshape(b, n, 3 * HID)
    q = qkv[..., :HID]
    k = qkv[..., HID : 2 * HID]
    v = qkv[..., 2 * HID :]
    ks = jax.nn.softmax(k, axis=1)  # per-channel over tokens == per-head
    ctx = jnp.einsum("bnc,bne->bce", ks, v) * _head_mask(x.dtype)
    out = jnp.einsum("bce,bnc->bne", ctx, q * SCALE)
    return conv1x1(out.reshape(b, hgt, wid, HID), wout) + bout


def attn_folded(x, wqkv, wout, bout):
    """q-side algebra folded: out = x @ (scale * Wq @ ctx @ Wout) + bout.

    softmax/context only need k and v (2/3 of the qkv matmul); q enters
    linearly, so its projection and the out-projection collapse into one
    per-batch [C, C] weight applied as a single matmul over tokens."""
    b, hgt, wid, c = x.shape
    n = hgt * wid
    xt = x.reshape(b, n, c)
    wq = wqkv[:, :HID]
    kv = jnp.einsum("bnc,ck->bnk", xt, wqkv[:, HID:])
    k = kv[..., :HID]
    v = kv[..., HID:]
    ks = jax.nn.softmax(k, axis=1)
    ctx = jnp.einsum("bnd,bne->bde", ks, v) * _head_mask(x.dtype)
    wfold = jnp.einsum("cd,bde,ef->bcf", wq * SCALE, ctx, wout)
    out = jnp.einsum("bnc,bcf->bnf", xt, wfold)
    return out.reshape(b, hgt, wid, wout.shape[-1]) + bout


def force(o):
    return float(jnp.sum(o))


def timeit(fn, args):
    def looped(kk):
        @jax.jit
        def run(x, *w):
            return jax.lax.fori_loop(0, kk, lambda i, y: fn(y, *w) + y * 0, x)

        return run

    f1, fk = looped(1), looped(K)
    force(f1(*args))
    force(fk(*args))
    t0 = time.time()
    for _ in range(RUNS):
        force(fk(*args))
    tk = (time.time() - t0) / RUNS
    t0 = time.time()
    for _ in range(RUNS):
        force(f1(*args))
    t1 = (time.time() - t0) / RUNS
    return (tk - t1) / (K - 1)


def main():
    tag = (sys.argv[1:] or ["fp32"])[0]
    dt = jnp.bfloat16 if tag == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    # output must be shape-compatible with input for the loop: use C==HID? No:
    # loop adds y*0 trick won't fix shape. Use wout -> C so output is [.., C].
    x = jnp.asarray(rng.standard_normal((B, IMG, IMG, C)), dt)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * HID)) * 0.05, dt)
    wout = jnp.asarray(rng.standard_normal((HID, C)) * 0.05, dt)
    bout = jnp.asarray(rng.standard_normal((C,)) * 0.01, dt)
    args = (x, wqkv, wout, bout)

    variants = [
        ("bnhd", attn_bnhd),
        ("blockdiag", attn_blockdiag),
        ("folded", attn_folded),
    ]

    # parity first
    ya = np.asarray(attn_current(*args), np.float32)
    for name, fn in variants:
        yb = np.asarray(fn(*args), np.float32)
        err = np.abs(ya - yb).max()
        print(f"parity {name}: max|diff| = {err:.2e}", flush=True)
        # fp32 tolerance is TPU-default-precision matmul drift (bf16 passes);
        # exact-math parity is pinned on CPU in tests/test_pallas.py
        assert err < (1e-2 if tag == "bf16" else 5e-4), name

    for name, fn in [("current  ", attn_current)] + [
        (f"{n:9s}", f) for n, f in variants
    ]:
        t = timeit(fn, args)
        print(f"{tag} {name}: {t*1e6:8.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
