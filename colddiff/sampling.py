"""Reverse samplers as single fused ``lax.scan`` loops.

The two universal Cold Diffusion algorithms plus DDIM-style estimation
(SURVEY.md section 0), one scan body each instead of the reference's Python
while-loops with O(t) re-degradation per step:

  Algorithm 1 ('default'):       x_{t-1} = D(x0_hat, t-1)
      (deblurring_diffusion_pytorch.py:428-434)
  Algorithm 2 ('x0_step_down'):  x_{t-1} = x_t - D(x0_hat, t) + D(x0_hat, t-1)
      (deblurring_diffusion_pytorch.py:436-451; TACoS)
  'ddim' (Family B only):        Algorithm 2 with the endpoint x2 *estimated*
      from x_t via get_x2_bar_from_xt (denoising_diffusion_pytorch.py:377-381)

Because every operator's ``degrade`` is O(1) (gather + fused matmuls, see
colddiff/ops/linop.py), a full T-step sampling run is O(T) UNet calls and
O(T) small matmuls -- vs the reference's O(T^2) convolution chains.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .diffusion import ColdDiffusion, DenoiseFn

__all__ = ["SampleResult", "prepare_start", "sample", "all_sample",
           "sample_multi_step"]


class SampleResult(NamedTuple):
    xt: jnp.ndarray  # the (degraded) starting state x_T
    direct_recons: jnp.ndarray  # the model's first direct reconstruction
    img: jnp.ndarray  # the final reverse-sampled image
    x0_trajectory: Optional[jnp.ndarray] = None  # [steps, B, H, W, C]
    xt_trajectory: Optional[jnp.ndarray] = None  # [steps, B, H, W, C]


def prepare_start(
    diffusion: ColdDiffusion,
    img: jnp.ndarray,
    t: Optional[int] = None,
    *,
    x_end: Optional[jnp.ndarray] = None,
    op_rng=None,
) -> jnp.ndarray:
    """Degrade a clean batch to the sampling start x_t (reference sample()
    preamble, deblurring_diffusion_pytorch.py:399-415: t degradation steps,
    with the discrete channel-mean collapse handled inside the operator)."""
    steps = diffusion.num_timesteps if t is None else t
    n = jnp.full((img.shape[0],), steps, dtype=jnp.int32)
    return diffusion.op.degrade_sampling(img, n, x_end=x_end, og=img, rng=op_rng)


def _reverse_step(diffusion, denoise_fn, img, t_cur, x_end, op_rng, noise_rng,
                  x0_hat=None):
    """One reverse step at level t_cur (number of applied steps, >= 1)."""
    b = img.shape[0]
    op = diffusion.op
    step = jnp.full((b,), t_cur - 1, dtype=jnp.int32)  # model's t index
    if x0_hat is None:
        x0_hat = denoise_fn(img, step)
    n_t = jnp.full((b,), t_cur, dtype=jnp.int32)
    n_tm1 = n_t - 1

    routine = diffusion.sampling_routine
    train_routine = diffusion.train_routine

    if train_routine == "Step":
        # model directly predicts x_{t-1} (snowification diffusion.py:425-426)
        return x0_hat, x0_hat
    if train_routine == "Step_Gradient":
        # model predicts x_{t-1} - x_t (snowification diffusion.py:428-429)
        return img + x0_hat, x0_hat
    if train_routine == "Gradient_norm":
        # model predicts the degradation direction; step against it
        # (defading_diffusion_naive.py:451-456)
        return img - x0_hat, img - x0_hat

    if op.requires_x_end:
        if routine == "x0_step_down_spiral_2_rand":
            # redraw the constant-color endpoint every step
            # (defading_diffusion_naive.py:430-445)
            x2 = op.sample_x_end(noise_rng, x0_hat)
        elif routine == "ddim" or x_end is None:
            x2 = op.x_end_from_xt(x0_hat, img, n_t)
        else:
            # fixed endpoint (x0_step_down / x0_step_down_spiral_2_fix)
            x2 = x_end
        xt_bar = op.degrade(x0_hat, n_t, x_end=x2, og=x0_hat)
        xtm1_bar = op.degrade(x0_hat, n_tm1, x_end=x2, og=x0_hat)
        return img - xt_bar + xtm1_bar, x0_hat

    if routine == "default":
        # no rng: sampling reuses baked operator state (fade crops are
        # drawn once per run, defading_diffusion_gaussian.py:357-367)
        return op.degrade_sampling(x0_hat, n_tm1, og=x0_hat), x0_hat

    if routine == "x0_step_down":
        base = x0_hat
        if diffusion.recon_noise_std > 0.0:
            # snowification diffusion.py:222-225: perturb the reconstruction
            # before re-degrading (x_{t-1} branch excluded at clone time).
            base = x0_hat + diffusion.recon_noise_std * jax.random.normal(
                noise_rng, x0_hat.shape
            )
        xt_bar = op.degrade(base, n_t, og=x0_hat)
        xtm1_bar = op.degrade(base, n_tm1, og=x0_hat)
        return img - xt_bar + xtm1_bar, x0_hat

    raise NotImplementedError(routine)


def sample(
    diffusion: ColdDiffusion,
    denoise_fn: DenoiseFn,
    img: jnp.ndarray,
    t: Optional[int] = None,
    *,
    x_end: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    trajectory: bool = False,
    refresh_every: int = 1,
    traj_stride: int = 1,
) -> SampleResult:
    """Run the full reverse loop from state ``img`` at level ``t`` (static).

    ``img`` must already be degraded (use :func:`prepare_start` for the
    conditional eval path).  For Family-B generation, ``x_end`` is the fixed
    endpoint (the start noise / constant image) used by 'x0_step_down'; leave
    None (or routine 'ddim') to estimate it per step.

    ``refresh_every > 1`` is an opt-in acceleration beyond the reference:
    the x0 prediction is refreshed only every K steps and reused in between
    (cold-diffusion predictions drift slowly across adjacent levels), cutting
    UNet calls -- and sampling time -- by ~K at some quality cost.

    ``traj_stride`` (static, must divide ``steps``) thins the returned
    trajectories to every k-th frame: [steps/k, B, H, W, C] instead of the
    reference's full [T, ...] stacks, which at T=200/B=32/128px would pin
    ~5 GB of device output (reference behavior at stride 1).  Frame j of the
    thinned trajectory is frame j*k of the full one, so frame 0 (the
    degraded start / first direct recon, which the FID harness consumes)
    is always present.
    """
    steps = diffusion.num_timesteps if t is None else int(t)
    if rng is None:
        rng = jax.random.key(0)
    op_rngs = jax.random.split(jax.random.fold_in(rng, 1), steps)
    noise_rngs = jax.random.split(jax.random.fold_in(rng, 2), steps)

    cached = refresh_every > 1
    if trajectory and steps % traj_stride != 0:
        raise ValueError(
            f"traj_stride={traj_stride} must divide steps={steps}"
        )

    def body(carry, inputs):
        cur, direct, cache = (carry if cached else (*carry, None))
        k, op_rng, noise_rng = inputs
        t_cur = steps - k
        if cached:
            step_idx = jnp.full((cur.shape[0],), t_cur - 1, dtype=jnp.int32)
            x0_hat = jax.lax.cond(
                k % refresh_every == 0,
                lambda: denoise_fn(cur, step_idx),
                lambda: cache,
            )
        else:
            x0_hat = None
        new_img, x0_hat = _reverse_step(
            diffusion, denoise_fn, cur, t_cur, x_end, op_rng, noise_rng,
            x0_hat=x0_hat,
        )
        direct = jnp.where(k == 0, x0_hat, direct)
        ys = (x0_hat, cur) if trajectory else None
        new_carry = (new_img, direct, x0_hat) if cached else (new_img, direct)
        return new_carry, ys

    ks = jnp.arange(steps)
    init = (img, jnp.zeros_like(img))
    if cached:
        init = (*init, jnp.zeros_like(img))
    if trajectory and traj_stride > 1:
        # two-level scan: the inner scan advances traj_stride real steps and
        # the outer scan emits one (x0_hat, x_t) frame per chunk -- the
        # trajectory buffer XLA allocates is steps/traj_stride frames.
        n_chunks = steps // traj_stride
        xs = (
            ks.reshape(n_chunks, traj_stride),
            op_rngs.reshape(n_chunks, traj_stride, *op_rngs.shape[1:]),
            noise_rngs.reshape(n_chunks, traj_stride, *noise_rngs.shape[1:]),
        )

        def chunk_body(carry, chunk_inputs):
            first = jax.tree_util.tree_map(lambda a: a[0], chunk_inputs)
            cur0 = carry[0]
            mid, frame = body(carry, first)
            rest = jax.tree_util.tree_map(lambda a: a[1:], chunk_inputs)
            out, _ = jax.lax.scan(
                lambda c, i: (body(c, i)[0], None), mid, rest
            )
            return out, (frame[0], cur0)

        carry_out, ys = jax.lax.scan(chunk_body, init, xs)
    else:
        carry_out, ys = jax.lax.scan(body, init, (ks, op_rngs, noise_rngs))
    final, direct = carry_out[0], carry_out[1]
    if trajectory:
        x0_traj, xt_traj = ys
        return SampleResult(img, direct, final, x0_traj, xt_traj)
    return SampleResult(img, direct, final)


def sample_multi_step(
    diffusion: ColdDiffusion,
    denoise_fn: DenoiseFn,
    img: jnp.ndarray,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    *,
    x_end: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-sample partial reverse runs: sample i steps from t_start[i] down to
    t_end[i] (snowification diffusion.py:247-256 sample_multi_step).

    One masked scan of length max(T): samples whose level has reached their
    t_end keep their state.

    Train-routine semantics follow ``sample_one_step``'s composed update
    (snowification diffusion.py:239-245): ``Step`` models predict x_{t-1}
    directly (new = x0_hat), ``Step_Gradient`` models predict
    x_{t-1} - x_t (new = x_t + x0_hat).  Note the reference's own
    ``sample_multi_step`` unpacks ``_, img_new_partial = sample_one_step(...)``
    -- the *second* element, ``direct_recons`` -- so upstream discards the
    composed step and feeds the raw prediction back at every level (a
    tuple-order bug: under Final routines the x0_step_down/default update it
    just computed is thrown away; under Step the two coincide).  colddiff
    implements the intended composition.
    """
    steps = diffusion.num_timesteps
    if rng is None:
        rng = jax.random.key(0)
    op_rngs = jax.random.split(jax.random.fold_in(rng, 1), steps)
    noise_rngs = jax.random.split(jax.random.fold_in(rng, 2), steps)
    t_start = jnp.asarray(t_start)
    t_end = jnp.asarray(t_end)

    def body(carry, inputs):
        cur, level = carry
        k, op_rng, noise_rng = inputs
        del k
        active = level > t_end
        b = cur.shape[0]
        op = diffusion.op
        step = jnp.maximum(level - 1, 0).astype(jnp.int32)
        x0_hat = denoise_fn(cur, step)
        n_t = jnp.maximum(level, 1).astype(jnp.int32)
        if diffusion.train_routine == "Step":
            # model directly predicts x_{t-1} (snowification diffusion.py:239)
            new = x0_hat
        elif diffusion.train_routine == "Step_Gradient":
            # model predicts x_{t-1} - x_t (snowification diffusion.py:242-243)
            new = cur + x0_hat
        elif op.requires_x_end:
            x2 = x_end if x_end is not None else op.x_end_from_xt(x0_hat, cur, n_t)
            xt_bar = op.degrade(x0_hat, n_t, x_end=x2, og=x0_hat)
            xtm1_bar = op.degrade(x0_hat, n_t - 1, x_end=x2, og=x0_hat)
            new = cur - xt_bar + xtm1_bar
        elif diffusion.sampling_routine == "default":
            new = op.degrade_sampling(x0_hat, n_t - 1, og=x0_hat)
        else:
            xt_bar = op.degrade(x0_hat, n_t, og=x0_hat)
            xtm1_bar = op.degrade(x0_hat, n_t - 1, og=x0_hat)
            new = cur - xt_bar + xtm1_bar
        mask = active.reshape(-1, *([1] * (cur.ndim - 1)))
        cur = jnp.where(mask, new, cur)
        level = jnp.where(active, level - 1, level)
        return (cur, level), None

    ks = jnp.arange(steps)
    (out, _), _ = jax.lax.scan(
        body, (img, t_start), (ks, op_rngs, noise_rngs)
    )
    return out


def all_sample(
    diffusion: ColdDiffusion,
    denoise_fn: DenoiseFn,
    img: jnp.ndarray,
    t: Optional[int] = None,
    *,
    x_end: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    traj_stride: int = 1,
    refresh_every: int = 1,
) -> SampleResult:
    """Reverse loop that also returns the full [steps, B, H, W, C]
    reconstruction/state trajectories (reference all_sample,
    deblurring_diffusion_pytorch.py:609-689).  ``traj_stride > 1`` keeps
    every k-th frame to bound trajectory memory; ``refresh_every > 1`` is
    the opt-in prediction-caching acceleration (see :func:`sample`)."""
    return sample(diffusion, denoise_fn, img, t, x_end=x_end, rng=rng,
                  trajectory=True, traj_stride=traj_stride,
                  refresh_every=refresh_every)
