"""Fully fused ConvNeXt block: front + conv3x3 + GELU + conv3x3 + residual.

Extends the lane-packed fused front (convnext_front.py) through the whole
ConvNextBlock (deblurring_diffusion_pytorch.py:135-165):

  out = conv3x3_{128->64}( GELU( conv3x3_{64->128}( LN(dw7x7(x)+bias+cond) )
        + b1 ) ) + b2 + x

in ONE VMEM round-trip per image instead of four HBM passes (front out,
conv1 out, conv2 out, residual read) -- the bf16 forward is bandwidth-bound
(docs/PERF.md), so the saved ~200 MB/block of intermediate traffic is the
only lever left at level 0.

Layout/algorithm (C=64, hidden=128, per-image program, H tiled by 32 rows):

  Stage A (front): identical machinery to convnext_front -- lane-packed rows
  [rows, (W+4)*64], sublane-rolled dy slabs, lane-rolled dx residues, fp32
  taps, masked-lane LayerNorm -- but computed on a (W+4)x(Ht+4) extended
  region (the two downstream 3x3 convs each eat one halo ring).

  Stage B (conv1, 64->128): a 3x3 conv as 6 MXU matmuls per dy via the
  PAIRED-TAP trick: a 128-lane group of the packed f row holds two adjacent
  pixels' 64 channels, which are exactly the kx=0,1 taps of one output
  pixel -- so [*, 128] x [128, 128] contracts two taps at once at full MXU
  width (the naive 64-channel contraction wastes half the array).  Two
  lane-phase views (aligned + rolled-by-64) cover even/odd output pixels;
  the kx=2 singleton rides a zero-padded weight block.  1.33x FLOP overhead
  vs ideal, instead of 2x for 64-padded contractions.

  Stage C (GELU): on the conv1 accumulator while still in VMEM, in the
  model's dtype-dispatched form (tanh for bf16, erf for fp32+ --
  models/layers.py::gelu).

  Stage D (conv2, 128->64): mirror of stage B on the output side -- one
  matmul produces the interleaved [out-pixel 2G | 2G+1] 64-channel halves
  of a 128-lane output group, again full MXU width.  The result lands
  directly in the packed [Ht, W*64] output layout.

  Stage E: + bias2 + residual (a lane-rolled window of the already-resident
  input slab), one cast, one store.

Weights are pre-arranged on the XLA side into [6,128,128] / [12,128,128]
block forms (see _prep_w1/_prep_w2); all matmuls accumulate fp32
(preferred_element_type) from compute-dtype inputs, taps stay true fp32.

Backward is a recompute custom VJP through the plain-XLA reference chain;
under differentiation the VJP *forward* also takes the production
front+XLA path (training measured slower with the kernel, 115.5 vs
111.2 ms/opt-step, because the recompute re-run outweighs the forward
fusion), so the kernel fires only on primal-only calls -- the T-step
samplers, which are the headline cost.
SPMD: custom_partitioning with batch sharding; a sharded image-row axis
halo-exchanges 5 boundary rows (3 dw + 1 + 1) around the XLA reference on
the local block, like the front's rule.

Dispatch is bf16-only by design: fp32 matmuls multi-pass on the MXU (4x
slower), which the per-tap 1.33x FLOP overhead cannot survive -- fp32 keeps
the fused front + XLA convs.  B<=16 only: XLA's scheduling catches up with
batch (B=64 measured 9425 vs 6630 us) while the per-image grid does not;
the pipeline chunks big batches to B=16 programs anyway.  v5e
measurements: scripts/bench_block.py and the scoreboard in docs/PERF.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .convnext_front import _packed_norm, convnext_front_reference

__all__ = ["convnext_block", "convnext_block_tail",
           "convnext_block_reference", "block_fusion_supported"]


def _gelu(x):
    """models/layers.py::gelu without the circular import: exact erf form
    for fp32+, tanh form for sub-fp32 (identical dispatch rule)."""
    exact = (jnp.issubdtype(x.dtype, jnp.floating)
             and jnp.finfo(x.dtype).bits >= 32)
    return jax.nn.gelu(x, approximate=not exact)


def convnext_block_reference(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                             *, norm=True, eps: float = 1e-5):
    """Plain-XLA reference chain (flax-Conv semantics: conv accumulates
    fp32 internally, bias added in the promoted in/out dtype)."""
    h = convnext_front_reference(x, dw_w, dw_b, cond, gamma, beta,
                                 norm=norm, eps=eps)
    dt = jnp.promote_types(h.dtype, w1.dtype)

    def conv3(v, w, b):
        y = jax.lax.conv_general_dilated(
            v.astype(dt), w.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(dt)

    h = conv3(h, w1, b1)
    h = _gelu(h)
    h = conv3(h, w2, b2)
    return h + x.astype(dt)


def _prep_w1(w1, dt):
    """[3,3,64,128] HWIO -> [6,128,128]: per dy, a paired-tap block
    (rows 0:64 = kx0, 64:128 = kx1) and a zero-top singleton (64:128 = kx2)."""
    z = jnp.zeros((64, 128), w1.dtype)
    blocks = []
    for dy in range(3):
        blocks.append(jnp.concatenate([w1[dy, 0], w1[dy, 1]], axis=0))
        blocks.append(jnp.concatenate([z, w1[dy, 2]], axis=0))
    return jnp.stack(blocks).astype(dt)


def _prep_w2(w2, dt):
    """[3,3,128,64] HWIO -> [12,128,128]: per dy, four [128,128] blocks whose
    column halves are the contributions of o1 tap m = 2G+k to output pixels
    2G (cols 0:64, kx = m-2G) and 2G+1 (cols 64:128, kx = m-2G-1)."""
    z = jnp.zeros((128, 64), w2.dtype)
    blocks = []
    for dy in range(3):
        blocks.append(jnp.concatenate([w2[dy, 0], z], axis=1))          # m=2G
        blocks.append(jnp.concatenate([w2[dy, 1], w2[dy, 0]], axis=1))  # 2G+1
        blocks.append(jnp.concatenate([w2[dy, 2], w2[dy, 1]], axis=1))  # 2G+2
        blocks.append(jnp.concatenate([z, w2[dy, 2]], axis=1))          # 2G+3
    return jnp.stack(blocks).astype(dt)


def _kernel_block(xp_ref, wp_ref, condp_ref, gp_ref, bp_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, o_ref, *, hgt: int, hgt_t: int, w_dim: int,
                  norm: bool, eps: float, mm_dtype):
    from jax.experimental.pallas import tpu as pltpu

    c = 64
    w4 = w_dim + 4
    wc4 = w4 * c
    nf = w4 // 2                       # 128-lane pixel-pair groups per f row
    lanes = xp_ref.shape[-1]
    slab_rows = hgt_t + 16
    mm = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w1b = w1_ref[...].astype(mm_dtype)
    w2b = w2_ref[...].astype(mm_dtype)

    for base in range(0, hgt, hgt_t):
        slab_raw = xp_ref[0, base : base + slab_rows, :]
        slab = slab_raw.astype(jnp.float32)

        # ---- stage A: dw7x7 + cond + LN on the (Ht+4)x(W+4) halo region
        acc = None
        for ky in range(7):
            row = pltpu.roll(slab, slab_rows - ky, 0)[: hgt_t + 4, :]
            rolled = {0: row, 64: pltpu.roll(row, lanes - 64, 1)}
            for kx in range(7):
                off = kx * c
                r = off % 128
                win = rolled[r][:, off - r : off - r + wc4]
                term = win * wp_ref[ky * 7 + kx, :]
                acc = term if acc is None else acc + term
        f = acc + condp_ref[0, 0].astype(jnp.float32)
        if norm:
            f = _packed_norm(f, hgt_t + 4, w4, c, eps)
            f = f * gp_ref[0] + bp_ref[0]

        # zero the out-of-image halo ring: conv1's input is zero-PADDED in
        # the reference, not the (bias/LN-shifted, nonzero) front values the
        # extended region computes there.  Columns 0,1 / w4-2,w4-1 are always
        # outside the image; rows only at the first/last slab.
        lane = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
        keep = (lane >= 2 * c) & (lane < (w4 - 2) * c)
        if base == 0 or base + hgt_t == hgt:
            frow = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
            if base == 0:
                keep &= frow >= 2
            if base + hgt_t == hgt:
                keep &= frow < hgt_t + 2
        f = jnp.where(keep, f, 0.0)

        # ---- stage B: conv1 (64->128) as paired-tap matmuls
        # (lane rolls happen on the fp32 f: Mosaic's dynamic_rotate only
        # supports 32-bit data -- bf16 rolls fail to compile)
        zg = jnp.zeros((1, 128), mm_dtype)
        fa = jnp.concatenate(
            [f.astype(mm_dtype).reshape((hgt_t + 4) * nf, 128), zg], axis=0)
        fb = jnp.concatenate(
            [pltpu.roll(f, wc4 - 64, 1).astype(mm_dtype).reshape(
                (hgt_t + 4) * nf, 128), zg],
            axis=0)
        r1 = (hgt_t + 2) * nf
        o1e = o1o = None
        for dy in range(3):
            s = dy * nf
            e_term = (mm(fa[s : s + r1], w1b[2 * dy])
                      + mm(fb[s : s + r1], w1b[2 * dy + 1]))
            o_term = (mm(fb[s : s + r1], w1b[2 * dy])
                      + mm(fa[s + 1 : s + 1 + r1], w1b[2 * dy + 1]))
            o1e = e_term if o1e is None else o1e + e_term
            o1o = o_term if o1o is None else o1o + o_term

        # ---- stage C: bias + GELU in the compute dtype (flax-Conv parity)
        b1v = b1_ref[0].astype(mm_dtype)
        g1e = _gelu(o1e.astype(mm_dtype) + b1v)
        g1o = _gelu(o1o.astype(mm_dtype) + b1v)

        # zero the out-of-image o1 ring: conv2's input is zero-padded in the
        # reference, and GELU(0 + b1) != 0 there.  o1e group 0 sits at
        # absolute column -1, o1o group nf-2 at column W; the row ring only
        # exists at the first/last slab (o1 row i is image row base+i-1).
        ridx = jax.lax.broadcasted_iota(jnp.int32, g1e.shape, 0)
        g1e = jnp.where(ridx % nf == 0, jnp.zeros_like(g1e), g1e)
        g1o = jnp.where(ridx % nf == nf - 2, jnp.zeros_like(g1o), g1o)
        if base == 0:
            g1e = jnp.where(ridx < nf, jnp.zeros_like(g1e), g1e)
            g1o = jnp.where(ridx < nf, jnp.zeros_like(g1o), g1o)
        if base + hgt_t == hgt:
            last = (ridx >= (hgt_t + 1) * nf) & (ridx < (hgt_t + 2) * nf)
            g1e = jnp.where(last, jnp.zeros_like(g1e), g1e)
            g1o = jnp.where(last, jnp.zeros_like(g1o), g1o)
        g1e = jnp.concatenate([g1e, zg], axis=0)
        g1o = jnp.concatenate([g1o, zg], axis=0)

        # ---- stage D: conv2 (128->64) back into packed pixel-pair groups
        r2 = hgt_t * nf
        acc2 = None
        for dy in range(3):
            s = dy * nf
            t = (mm(g1e[s : s + r2], w2b[4 * dy])
                 + mm(g1o[s : s + r2], w2b[4 * dy + 1])
                 + mm(g1e[s + 1 : s + 1 + r2], w2b[4 * dy + 2])
                 + mm(g1o[s + 1 : s + 1 + r2], w2b[4 * dy + 3]))
            acc2 = t if acc2 is None else acc2 + t
        out = acc2.reshape(hgt_t, nf, 128)[:, : w_dim // 2, :]
        out = out.reshape(hgt_t, w_dim * c).astype(o_ref.dtype)

        # ---- stage E: + bias2 + residual (window of the resident slab;
        # rolled in fp32 -- see the stage-B roll note -- the fp32 round-trip
        # of the raw input values is lossless)
        res = pltpu.roll(slab[5 : 5 + hgt_t, :], lanes - 64, 1)
        res = res[:, 4 * c : 4 * c + w_dim * c].astype(o_ref.dtype)
        o_ref[0, base : base + hgt_t, :] = out + b2_ref[0] + res


def _pallas_block_packed(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                         norm, eps, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hgt, wid, c = x.shape
    assert c == 64 and w1.shape[-1] == 128 and w2.shape[-1] == 64
    if cond is None:
        cond = jnp.zeros((bsz, c), x.dtype)
    out_dtype = jnp.promote_types(x.dtype, w1.dtype)
    mm_dtype = out_dtype
    w4 = wid + 4
    wc4 = w4 * c
    wcp = (wid + 10) * c

    # pad 5 (3 dw + 1 + 1) each side; extra bottom rows keep the dy sublane
    # rolls wrap-free and the slab row count a multiple of 8
    xp = jnp.pad(x, ((0, 0), (5, 11), (5, 5), (0, 0)))
    xp = xp.reshape(bsz, hgt + 16, wcp)
    wp = jnp.tile(dw_w.reshape(49, 1, c), (1, w4, 1)).reshape(49, wc4)
    wp = wp.astype(jnp.float32)
    condp = jnp.tile((cond + dw_b)[:, None, :], (1, w4, 1)).reshape(bsz, 1, wc4)
    gp = jnp.tile(gamma[None, :], (w4, 1)).reshape(1, wc4).astype(jnp.float32)
    bp = jnp.tile(beta[None, :], (w4, 1)).reshape(1, wc4).astype(jnp.float32)
    w1p = _prep_w1(w1, w1.dtype)
    w2p = _prep_w2(w2, w2.dtype)
    b1p = b1.reshape(1, 128)
    b2p = jnp.tile(b2[None, :], (wid, 1)).reshape(1, wid * c).astype(out_dtype)

    hgt_t = hgt if hgt <= 32 else next(
        t for t in (32, 16, 8, 4, 2, 1) if hgt % t == 0)

    out = pl.pallas_call(
        functools.partial(_kernel_block, hgt=hgt, hgt_t=hgt_t, w_dim=wid,
                          norm=norm, eps=eps, mm_dtype=mm_dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hgt + 16, wcp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, wc4), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wc4), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc4), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc4), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 128, 128), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, 128, 128), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wid * c), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hgt, wid * c), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hgt, wid * c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, wp, condp, gp, bp, w1p, b1p, w2p, b2p)
    return out.reshape(bsz, hgt, wid, c)


def block_fusion_supported(x, hidden: int, c_out: int) -> bool:
    """The paired-tap machinery is specific to C=64 in / 128 hidden / 64 out
    (level 0 of the flagship UNet) with even W; bf16 compute only -- fp32
    matmuls multi-pass on the MXU and measured slower than XLA's convs."""
    bsz, hgt, wid, c = x.shape
    if c != 64 or hidden != 128 or c_out != 64:
        return False
    if x.dtype != jnp.bfloat16:
        return False
    # measured v5e @128px (scripts/bench_block.py): B=16 fused 2114 us vs
    # 2160 XLA / 2319 front+XLA, but B=64 fused 9425 vs 6630 XLA -- XLA's
    # scheduling improves with batch while the per-image grid does not.  The
    # pipeline chunks big batches to B=16 programs (apply_in_chunks), so the
    # kernel only ever needs to win there.  NOTE: under pjit this sees the
    # GLOBAL batch, so spmd runs with >16 global rows fall back to XLA even
    # when local shards are 16; acceptable -- the fallback is 2% off.
    if bsz > 16:
        return False
    if wid % 2 != 0 or wid < 8 or hgt < 8:
        return False
    hgt_t = hgt if hgt <= 32 else next(
        (t for t in (32, 16, 8, 4, 2, 1) if hgt % t == 0), None)
    if hgt_t is None:
        return False
    # VMEM: in/out double buffers + fp32 f + o1 pair + gelu copies + weights
    item = x.dtype.itemsize
    vmem = 2 * (hgt + 16) * (wid + 10) * 64 * item
    vmem += 2 * hgt * wid * 64 * item
    vmem += (hgt_t + 20) * (wid + 10) * 64 * (4 + item)        # slab fp32 + f
    vmem += 6 * (hgt_t + 2) * (wid + 4) * 64 * 4               # o1/gelu/acc2
    vmem += (49 + 3) * (wid + 4) * 64 * 4 + 18 * 128 * 128 * 4
    return vmem < 48 * 1024 * 1024


def _batch_only(sharding, ndim):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = sharding.spec
    b = spec[0] if len(spec) > 0 else None
    return NamedSharding(sharding.mesh, P(*((b,) + (None,) * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def _partitioned_block(norm: bool, eps: float, interpret: bool):
    """SPMD rule: batch-sharded runs go straight to the kernel on local
    shards; a sharded image-row axis halo-exchanges 5 boundary rows (the
    3-row dw halo + one per 3x3 conv) around the XLA reference on the local
    block -- ppermute zeros double as the convs' global edge padding (same
    scheme as convnext_front's rule)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fwd(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2):
        return _pallas_block_packed(x, dw_w, dw_b, cond, gamma, beta,
                                    w1, b1, w2, b2, norm, eps, interpret)

    cp = custom_partitioning(fwd)

    def partition(mesh, arg_shapes, result_shape):
        x_sh = arg_shapes[0].sharding
        spec = x_sh.spec
        h_axis = spec[1] if len(spec) > 1 else None
        if isinstance(h_axis, tuple):
            h_axis = h_axis[0] if len(h_axis) == 1 else None
        rep = NamedSharding(x_sh.mesh, P())
        if h_axis is None or arg_shapes[0].shape[1] // max(
                mesh.shape.get(h_axis, 1), 1) < 5:
            xs = _batch_only(x_sh, 4)
            args = (xs, rep, rep, _batch_only(x_sh, 2), rep, rep,
                    rep, rep, rep, rep)
            return mesh, fwd, xs, args

        n = mesh.shape[h_axis]
        h_global = arg_shapes[0].shape[1]
        b_axis = spec[0] if len(spec) > 0 else None
        xs = NamedSharding(x_sh.mesh, P(b_axis, h_axis))
        cond_sh = _batch_only(x_sh, 2)

        def halo_fwd(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2):
            from .convnext_front import convnext_front_reference

            top = jax.lax.ppermute(
                x[:, -5:], h_axis, [(i, i + 1) for i in range(n - 1)])
            bot = jax.lax.ppermute(
                x[:, :5], h_axis, [(i + 1, i) for i in range(n - 1)])
            xe = jnp.concatenate([top, x, bot], axis=1)
            # the chain must be staged, not convnext_block_reference on the
            # extended block: at the global image edge the reference
            # zero-PADS conv1/conv2's inputs, while the extended block holds
            # computed values there (front of ppermute zeros, GELU(b1) != 0)
            # -- the same out-of-image masking the kernel itself does.
            grow = (jax.lax.axis_index(h_axis) * x.shape[1] - 5
                    + jnp.arange(xe.shape[1]))
            keep = ((grow >= 0) & (grow < h_global))[None, :, None, None]
            f = convnext_front_reference(xe, dw_w, dw_b, cond, gamma, beta,
                                         norm=norm, eps=eps)
            f = jnp.where(keep, f, 0)
            dt = jnp.promote_types(f.dtype, w1.dtype)

            def conv3(v, w, b):
                y = jax.lax.conv_general_dilated(
                    v.astype(dt), w.astype(dt), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y + b.astype(dt)

            g1 = jnp.where(keep, _gelu(conv3(f, w1, b1)), 0)
            y = conv3(g1, w2, b2)
            return y[:, 5:-5] + x.astype(y.dtype)

        args = (xs, rep, rep, cond_sh, rep, rep, rep, rep, rep, rep)
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
        sharding_rule=("b h w c, kh kw kc, dc, b cc, gc, bc, "
                       "ah aw ac ao, oc, eh ew ec eo, fc -> b h w c"),
        need_replication_factors=(
            "w", "c", "kh", "kw", "kc", "dc", "cc", "gc", "bc",
            "ah", "aw", "ac", "ao", "oc", "eh", "ew", "ec", "eo", "fc",
        ),
    )
    return cp


def _run_block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2, norm, eps,
               interpret):
    if cond is None:
        cond = jnp.zeros((x.shape[0], x.shape[-1]), x.dtype)
    return _partitioned_block(norm, eps, interpret)(
        x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2, norm, eps,
           interpret):
    return _run_block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                      norm, eps, interpret)


def _block_fwd(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2, norm, eps,
               interpret):
    # Differentiated calls (training) take the production front+XLA path,
    # NOT the fused kernel: with the recompute VJP the kernel measured
    # slower end-to-end (115.5 vs 111.2 ms/opt-step, scripts/bench_train.py
    # bf16 flagship) -- the reference re-run in the backward outweighs the
    # forward fusion.  custom_vjp gives the split for free: jax only uses
    # this rule under differentiation; primal-only calls (the T-step
    # samplers, where the kernel measured 2114 vs 2319 us) keep the kernel.
    from .convnext_front import convnext_front

    if interpret:
        y = _run_block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                       norm, eps, interpret)
    else:
        h = convnext_front(x, dw_w, dw_b, cond, gamma, beta,
                           norm=norm, eps=eps)
        h = convnext_block_tail(h, w1, b1, w2, b2)
        y = h + x.astype(h.dtype)
    return y, (x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2)


def _block_bwd(norm, eps, interpret, res, g):
    x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2 = res
    had_cond = cond is not None

    def f(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2):
        return convnext_block_reference(x, dw_w, dw_b, cond, gamma, beta,
                                        w1, b1, w2, b2, norm=norm, eps=eps)

    if had_cond:
        _, vjp = jax.vjp(f, x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2)
        return vjp(g)
    _, vjp = jax.vjp(
        lambda x, dw_w, dw_b, gamma, beta, w1, b1, w2, b2: f(
            x, dw_w, dw_b, None, gamma, beta, w1, b1, w2, b2),
        x, dw_w, dw_b, gamma, beta, w1, b1, w2, b2)
    dx, ddw, ddb, dg, dbt, dw1, db1, dw2, db2 = vjp(g)
    return dx, ddw, ddb, None, dg, dbt, dw1, db1, dw2, db2


_block.defvjp(_block_fwd, _block_bwd)


def convnext_block_tail(h, w1, b1, w2, b2):
    """conv3x3 + GELU + conv3x3 with nn.Conv promotion semantics -- the
    unfused remainder of the block after :func:`convnext_front`."""
    dt = jnp.promote_types(h.dtype, w1.dtype)

    def conv3(v, w, b):
        y = jax.lax.conv_general_dilated(
            v.astype(dt), w.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(dt)

    return conv3(_gelu(conv3(h, w1, b1)), w2, b2)


def convnext_block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                   *, norm: bool = True, eps: float = 1e-5,
                   force: str | None = None):
    """Whole ConvNeXt block with identity residual (dim_in == dim_out).

    Dispatch: the fully fused kernel ON by default on TPU for bf16 level-0
    shapes (C=64 in, 128 hidden, 64 out); otherwise the Pallas-or-XLA front
    (its own dispatch) + XLA conv tail.  COLDDIFF_NO_PALLAS=1 or
    COLDDIFF_NO_BLOCK_FUSION=1 disables the fused kernel.
    ``force``: "pallas" | "xla" | "interpret".
    """
    if force == "interpret":
        return _block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                      norm, eps, True)
    use = (
        not os.environ.get("COLDDIFF_NO_PALLAS")
        and not os.environ.get("COLDDIFF_NO_BLOCK_FUSION")
        and jax.default_backend() == "tpu"
        and block_fusion_supported(x, w1.shape[-1], w2.shape[-1])
        and jnp.promote_types(x.dtype, w1.dtype) == jnp.bfloat16
    )
    if force == "pallas" or (force is None and use):
        return _block(x, dw_w, dw_b, cond, gamma, beta, w1, b1, w2, b2,
                      norm, eps, False)
    from .convnext_front import convnext_front

    h = convnext_front(x, dw_w, dw_b, cond, gamma, beta, norm=norm, eps=eps)
    h = convnext_block_tail(h, w1, b1, w2, b2)
    return h + x.astype(h.dtype)
