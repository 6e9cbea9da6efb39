"""Fused ConvNeXt block front: depthwise 7x7 conv + time bias + LayerNorm.

Profiling the flagship UNet on v5e shows the block front is the bandwidth/VPU
bottleneck at level 0 (C=64 @128px), where XLA's fp32 depthwise conv both
pads the 64-channel lane axis 2x AND lowers through bf16 passes (measured
err 1.3e-2 vs true fp32).  This kernel computes

  out = LN(dwconv7x7(x) + bias_dw + cond) * gamma + beta     (ConvNextBlock,
  deblurring_diffusion_pytorch.py:135-165)

in one VMEM pass per image with a lane-packed layout and true fp32 taps.

Measured on v5e (scripts/bench_front.py, in-program looped timing, fp32):

  shape                XLA(default)  XLA(fp32)  this kernel
  (16,128,128, 64)        1512 us     1676 us     1339 us   (1.13x / 1.25x)
  (32,128,128, 64)        3613 us     3523 us       --
  (64,128,128, 64)        9754 us        --        7396 us*  (1.32x)
  (16, 64, 64,128)         183 us                  (XLA wins; no lane pad)
  * pre-subroll variant; subroll is faster still.

Design:
  - input is zero-padded once in XLA and *reshaped free of charge* to
    [B, H+8, (W+6)*C] -- NHWC rows pack W and C into the lane axis, so a
    C=64 image uses every lane (XLA's NHWC conv pads C=64 -> 128 lanes);
  - a tap (dy, dx) is a window at sublane offset dy, lane offset dx*C.
    Mosaic only slices lanes at multiples of 128 and *crashes* on dynamic
    sublane offsets, so: lane-misaligned windows come from ONE pltpu.roll of
    the dy-row per misalignment residue (wrap-around corrupts only the final
    r lanes, beyond every in-range window), and dy itself is handled by
    sublane-rolling an aligned (Ht+8)-row slab (wrap-free for i < Ht);
  - H is tiled by a static Python loop (Ht=32), bounding live temporaries;
  - per-pixel channel LayerNorm stats: for C % 128 == 0 a trivial reshape;
    for C < 128 masked full-lane reductions on [Ht, W*C/128, 128] rows;
  - taps accumulate in fp32 regardless of input dtype (more accurate than
    XLA's default-precision conv);
  - backward is a recompute custom VJP in plain XLA.

Dispatch: ON by default on TPU for supported shapes (128 % C == 0 -- level 0
of both UNet families; C >= 128 stays on XLA, which is already near the
bandwidth floor there: 183 us at (16,64,64,128) vs 519+ us for kernels) for
BOTH fp32 and bf16 compute.  In bf16 the kernel reads half the bytes while
keeping true fp32 taps: 901 us vs XLA's 1369 us at the level-0 shape and
1.6x more accurate.  (Round 2 briefly gated bf16 off from a -4% end-to-end
measurement; that was an artifact -- the fp32 time embedding silently
promoted the whole "bf16" model to fp32 compute.  With the leak fixed the
kernel wins in both dtypes.)  COLDDIFF_NO_PALLAS=1 disables.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["convnext_front", "convnext_front_reference", "pallas_supported"]


def convnext_front_reference(x, w, b, cond, gamma, beta, *, norm=True,
                             eps: float = 1e-5, precision=None):
    """Plain-XLA reference. x: [B,H,W,C]; w: [7,7,C]; b, gamma, beta: [C];
    cond: [B,C] or None.  ``precision`` feeds the conv (TPU default lowers
    fp32 convs through bf16 passes; 'highest' forces true fp32)."""
    c = x.shape[-1]
    # flax-Conv promotion semantics: mixed input/param dtypes compute in the
    # promoted dtype (bf16 activations + fp32 params -> fp32)
    dt = jnp.promote_types(x.dtype, w.dtype)
    x, w = x.astype(dt), w.astype(dt)
    h = jax.lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=precision,
    ) + b
    if cond is not None:
        h = h + cond[:, None, None, :]
    if norm:
        # stats in at-least-fp32 (matches ChannelLayerNorm and the Pallas
        # kernel, whose taps and stats are always fp32)
        hf = h.astype(jnp.promote_types(h.dtype, jnp.float32))
        mean = jnp.mean(hf, axis=-1, keepdims=True)
        var = jnp.var(hf, axis=-1, keepdims=True)
        h = ((hf - mean) * jax.lax.rsqrt(var + eps)).astype(h.dtype) * gamma + beta
    return h


def _packed_norm(h, hgt_t, w_dim, c, eps):
    """Per-pixel channel LayerNorm on a lane-packed [Ht, W*C] row block.

    For C a multiple of 128 the reshape [Ht, W, C] keeps the native lane
    width and stats are plain lane reductions.  For C < 128 (level 0's C=64)
    that reshape needs a sub-lane relayout Mosaic rejects, so instead rows
    reshape to [Ht, W*C/128, 128] (trivial) and per-pixel sums come from
    masked full-lane reductions, one mask per pixel sharing the 128-lane row.
    """
    wc = w_dim * c
    if c % 128 == 0 or wc % 128 != 0:
        # native-lane reshape (C | 128), or interpreter-only small shapes
        # (wc < 128 never reaches the compiled kernel: pallas_supported
        # requires 128 | W*C)
        hr = h.reshape(hgt_t, w_dim, c)
        mean = jnp.mean(hr, axis=-1, keepdims=True)
        cent = hr - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        return (cent * jax.lax.rsqrt(var + eps)).reshape(hgt_t, wc)
    assert 128 % c == 0, f"packed norm needs C | 128, got {c}"
    group = 128 // c
    nr = wc // 128
    hr = h.reshape(hgt_t, nr, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (hgt_t, nr, 128), 2)
    zero = jnp.zeros_like(hr)
    mean = zero
    for g in range(group):
        m = (lane >= g * c) & (lane < (g + 1) * c)
        s = jnp.sum(jnp.where(m, hr, 0.0), axis=-1, keepdims=True)
        mean = mean + jnp.where(m, s, 0.0)
    mean = mean * (1.0 / c)
    cent = hr - mean
    var = zero
    for g in range(group):
        m = (lane >= g * c) & (lane < (g + 1) * c)
        s = jnp.sum(jnp.where(m, cent * cent, 0.0), axis=-1, keepdims=True)
        var = var + jnp.where(m, s, 0.0)
    var = var * (1.0 / c)
    return (cent * jax.lax.rsqrt(var + eps)).reshape(hgt_t, wc)


def _kernel_packed(xp_ref, wp_ref, condp_ref, gp_ref, bp_ref, o_ref,
                   *, hgt: int, hgt_t: int, w_dim: int, c: int, norm: bool,
                   eps: float):
    """See module docstring for the layout/rolling design."""
    from jax.experimental.pallas import tpu as pltpu

    wc = w_dim * c
    lanes = xp_ref.shape[-1]
    residues = sorted({(dx * c) % 128 for dx in range(7)} - {0})
    for base in range(0, hgt, hgt_t):
        # aligned (Ht+8)-row slab; each dy-row view is a sublane roll of it
        # (wrap-free for output row i < Ht since i+dy <= Ht+5 < Ht+8)
        slab = xp_ref[0, base : base + hgt_t + 8, :].astype(jnp.float32)
        acc = None
        for dy in range(7):
            row = pltpu.roll(slab, hgt_t + 8 - dy, 0)[:hgt_t, :]
            # left-roll by r == np.roll by (lanes - r); the wrap-around only
            # corrupts the final r lanes, beyond every in-range window
            rolled = {0: row}
            for r in residues:
                rolled[r] = pltpu.roll(row, lanes - r, 1)
            for dx in range(7):
                off = dx * c
                r = off % 128
                win = rolled[r][:, off - r : off - r + wc]
                term = win * wp_ref[dy * 7 + dx, :]
                acc = term if acc is None else acc + term
        h = acc + condp_ref[0, 0].astype(jnp.float32)
        if norm:
            h = _packed_norm(h, hgt_t, w_dim, c, eps)
            h = h * gp_ref[0] + bp_ref[0]
        o_ref[0, base : base + hgt_t, :] = h.astype(o_ref.dtype)


def _pallas_forward_packed(x, w, b, cond, gamma, beta, norm, eps,
                           interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hgt, wid, c = x.shape
    if cond is None:
        cond = jnp.zeros((bsz, c), x.dtype)
    # match flax-Conv promotion: bf16 activations + fp32 params -> fp32 out
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    wc = wid * c
    wc6 = (wid + 6) * c
    # pack: [B, H+8, W+6, C] -> [B, H+8, (W+6)*C] (free reshape in NHWC);
    # two extra zero rows at the bottom keep the sublane-roll slabs in range
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 3), (0, 0)))
    xp = xp.reshape(bsz, hgt + 8, wc6)
    # weights tiled across W so each tap is one broadcast FMA: [49, W*C]
    wp = jnp.tile(w.reshape(49, 1, c), (1, wid, 1)).reshape(49, wc)
    wp = wp.astype(jnp.float32)
    # dw bias + conditioning folded into one packed per-image row: [B, 1, W*C]
    condp = jnp.tile((cond + b)[:, None, :], (1, wid, 1)).reshape(bsz, 1, wc)
    gp = jnp.tile(gamma[None, :], (wid, 1)).reshape(1, wc).astype(jnp.float32)
    bp = jnp.tile(beta[None, :], (wid, 1)).reshape(1, wc).astype(jnp.float32)

    # static H-tiling inside one per-image program bounds live temporaries
    hgt_t = hgt if hgt <= 32 else next(
        t for t in (32, 16, 8, 4, 2, 1) if hgt % t == 0)

    out = pl.pallas_call(
        functools.partial(_kernel_packed, hgt=hgt, hgt_t=hgt_t, w_dim=wid,
                          c=c, norm=norm, eps=eps),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hgt + 8, wc6), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, wc), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wc), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hgt, wc), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hgt, wc), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, wp, condp, gp, bp)
    return out.reshape(bsz, hgt, wid, c)


def pallas_supported(x) -> bool:
    """Supported shapes: C | 128 with 128-aligned packed rows, VMEM-bounded.

    C >= 128 intentionally returns False -- measured XLA is already near the
    bandwidth floor there (no lane padding), see module docstring.
    """
    bsz, hgt, wid, c = x.shape
    if c < 8 or c >= 128 or 128 % c != 0:
        return False
    if (wid * c) % 128 != 0 or ((wid + 6) * c) % 128 != 0:
        return False
    item = max(x.dtype.itemsize, 4)
    vmem = 2 * (hgt + 8) * (wid + 6) * c * x.dtype.itemsize  # in, 2 buffers
    vmem += 2 * hgt * wid * c * x.dtype.itemsize             # out, 2 buffers
    vmem += 4 * min(hgt, 32) * (wid + 6) * c * item          # slab/rolls/acc
    # v5e VMEM comfortably fits the flagship level-0 tiles (~22 MB measured
    # compiling); 48 MB keeps >=512px C=64 images off the kernel
    return vmem < 48 * 1024 * 1024


def _batch_only_sharding(sharding, ndim: int):
    """Project a NamedSharding down to its batch (dim-0) component."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = sharding.spec
    b = spec[0] if len(spec) > 0 else None
    return NamedSharding(sharding.mesh, P(*((b,) + (None,) * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def _partitioned_forward(norm: bool, eps: float, interpret: bool):
    """SPMD-partitionable wrapper around the packed forward.

    The kernel grids over images, so under a batch-sharded jit each device
    can run its local shard with the weights replicated.  Without this rule
    the SPMD partitioner treats the Mosaic custom call as unpartitionable and
    gathers the full batch onto every chip at each block front (correct but
    defeats data parallelism).  The shardy ``sharding_rule`` shares the batch
    and image-row factors between x and the output; the ``partition``
    callback serves the GSPMD path.

    Spatially-sharded inputs (``image_sharding``'s P('data', 'space') on
    NHWC rows) are handled natively: the only cross-row dependency is the
    7x7 depthwise conv's 3-row halo, so the partition callback emits a
    collective-permute halo exchange (edge shards receive ppermute's zeros
    == the conv's own zero padding) around the plain-XLA front on the local
    block -- NO all-gather of the row axis, and no env var needed for
    pure-SP runs (round-3 review item 9).  Multi-device correctness for
    both paths is pinned on the virtual CPU mesh in tests/test_pallas.py /
    tests/test_parallel.py (interpret mode runs through this same wrapper).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fwd(x, w, b, cond, gamma, beta):
        return _pallas_forward_packed(x, w, b, cond, gamma, beta, norm, eps,
                                      interpret)

    cp = custom_partitioning(fwd)

    def partition(mesh, arg_shapes, result_shape):
        x_sh = arg_shapes[0].sharding
        spec = x_sh.spec
        h_axis = spec[1] if len(spec) > 1 else None
        if isinstance(h_axis, tuple):
            h_axis = h_axis[0] if len(h_axis) == 1 else None
        rep = NamedSharding(x_sh.mesh, P())
        if h_axis is None:
            xs = _batch_only_sharding(x_sh, 4)
            args = (xs, rep, rep, _batch_only_sharding(x_sh, 2), rep, rep)
            return mesh, fwd, xs, args

        # image rows sharded: halo-exchange the 3 boundary rows each way,
        # run the XLA front on the halo-extended local block, drop the halo
        # rows.  ppermute leaves non-destinations zero, which IS the conv's
        # zero padding at the global top/bottom edges.
        n = mesh.shape[h_axis]
        if arg_shapes[0].shape[1] // max(n, 1) < 3:
            # local shards thinner than the 3-row halo: gather instead
            xs = _batch_only_sharding(x_sh, 4)
            args = (xs, rep, rep, _batch_only_sharding(x_sh, 2), rep, rep)
            return mesh, fwd, xs, args
        b_axis = spec[0] if len(spec) > 0 else None
        xs = NamedSharding(x_sh.mesh, P(b_axis, h_axis))
        cond_sh = _batch_only_sharding(x_sh, 2)

        def halo_fwd(x, w, b, cond, gamma, beta):
            top = jax.lax.ppermute(
                x[:, -3:], h_axis, [(i, i + 1) for i in range(n - 1)])
            bot = jax.lax.ppermute(
                x[:, :3], h_axis, [(i + 1, i) for i in range(n - 1)])
            xp = jnp.concatenate([top, x, bot], axis=1)
            y = convnext_front_reference(xp, w, b, cond, gamma, beta,
                                         norm=norm, eps=eps)
            return y[:, 3:-3]

        args = (xs, rep, rep, cond_sh, rep, rep)
        return mesh, halo_fwd, xs, args

    def infer(mesh, arg_shapes, result_shape):
        sh = arg_shapes[0].sharding
        spec = sh.spec
        b = spec[0] if len(spec) > 0 else None
        h = spec[1] if len(spec) > 1 else None
        return NamedSharding(sh.mesh, P(b, h))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h w c, kh kw kc, dc, b cc, gc, bc -> b h w c",
        need_replication_factors=(
            "w", "c", "kh", "kw", "kc", "dc", "cc", "gc", "bc"
        ),
    )
    return cp


def _run_forward(x, w, b, cond, gamma, beta, norm, eps, interpret):
    if cond is None:
        cond = jnp.zeros((x.shape[0], x.shape[-1]), x.dtype)
    return _partitioned_forward(norm, eps, interpret)(x, w, b, cond, gamma,
                                                      beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _front(x, w, b, cond, gamma, beta, norm, eps, interpret):
    return _run_forward(x, w, b, cond, gamma, beta, norm, eps, interpret)


def _front_fwd(x, w, b, cond, gamma, beta, norm, eps, interpret):
    y = _run_forward(x, w, b, cond, gamma, beta, norm, eps, interpret)
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
    """Fused dw7x7 + bias + cond + LayerNorm.

    Default: the lane-packed Pallas kernel on TPU for supported shapes
    (C | 128 -- level 0 of the flagship UNet, where it is 1.25x XLA-fp32 at
    B=16 and 1.3x at B=64, measurements in the module docstring), plain XLA
    otherwise.  ``force``: "pallas" | "xla" | "interpret" override;
    COLDDIFF_NO_PALLAS=1 disables the kernel globally.
    """
    if force == "interpret":
        return _front(x, w, b, cond, gamma, beta, norm, eps, True)
    use_pallas = (
        not os.environ.get("COLDDIFF_NO_PALLAS")
        and jax.default_backend() == "tpu"
        and pallas_supported(x)
        # fp32 AND bf16 compute: fp32 taps beat XLA's fp32 conv (which
        # detours through bf16 passes, 1.4e-2 error), and in bf16 the
        # kernel reads half the bytes with the same fp32 taps -- measured
        # 901 vs 1369 us at the level-0 shape AND 1.6x more accurate
        # (round 2 had gated bf16 off from a -4% end-to-end measurement,
        # but that model silently ran fp32 compute everywhere: the fp32
        # time embedding promoted the whole graph; see models/layers.py)
        and jnp.promote_types(x.dtype, w.dtype)
        in (jnp.float32, jnp.bfloat16)
    )
    if force == "xla" or (force is None and not use_pallas):
        return convnext_front_reference(x, w, b, cond, gamma, beta, norm=norm,
                                        eps=eps)
    return _front(x, w, b, cond, gamma, beta, norm, eps, False)
