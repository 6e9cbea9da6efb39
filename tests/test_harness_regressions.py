"""Regression tests for eval-harness bugs found in review:

1. the jitted manifold-harness sampler must receive the *randomized*
   operator state (fade crops / random snow), not the harness's original op;
2. every figure/GMM/FID path must convert through the to_lab boundary
   (dataset rgb -> model lab on the way in, lab -> rgb on the way out).
"""

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.diffusion import ColdDiffusion
from colddiff.eval import EvalHarness
from colddiff.models import UnetConvNext
from colddiff.operators import get_operator
from colddiff.ops.image import lab2rgb, rgb2lab
from colddiff.sampling import all_sample, prepare_start


def _harness(tmp_path, op, **kw):
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))
    return EvalHarness(d, model, params, results_folder=str(tmp_path), **kw)


def test_manifold_batch_uses_randomized_op(tmp_path, rng):
    """fid_distance_decrease_from_manifold with a randomized operator (fade
    Random_Incremental bakes per-sample crop windows): the reverse loop must
    run with the SAME randomized op that degraded the batch."""
    op = get_operator("fade", image_size=16, timesteps=3,
                      fade_routine="Random_Incremental", kernel_std=0.2,
                      initial_mask=2)
    h = _harness(tmp_path, op)
    batch = rng.random((4, 16, 16, 3)).astype(np.float32) * 2 - 1
    key = jax.random.key(7)

    o, dg, s, dr = [], [], [], []
    h._manifold_batch(batch, key, o, dg, s, dr)

    # recompute with the op _degrade_start actually baked for this key
    start, x_end, rand_op = h._degrade_start(jnp.asarray(batch), key)
    assert not np.allclose(np.asarray(rand_op.offsets),
                           np.asarray(h.d.op.offsets if h.d.op.offsets
                                      is not None else 0))
    res = all_sample(h.d.replace(op=rand_op), h.denoise, start,
                     x_end=x_end, rng=key)
    np.testing.assert_allclose(s[0], np.asarray(res.img), atol=1e-5)
    np.testing.assert_allclose(dg[0], np.asarray(res.xt_trajectory[0]),
                               atol=1e-5)


def test_figure_paths_convert_to_lab(tmp_path, rng):
    """_run_all_sample (the engine of every named paper-figure method) must
    degrade in lab space and return rgb: its reported degraded start equals
    lab2rgb(degrade(rgb2lab(og)))."""
    op = get_operator("blur", image_size=16, timesteps=3,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0)
    h = _harness(tmp_path, op, to_lab=True)
    og = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32) * 2 - 1)

    res = h._run_all_sample(og, jax.random.key(0))
    want_start = lab2rgb(prepare_start(h.d, rgb2lab(og)))
    np.testing.assert_allclose(np.asarray(res.xt_trajectory[0]),
                               np.asarray(want_start), atol=1e-4)
    # outputs are finite rgb-space tensors (lab L-channel magnitudes ~[0,100]
    # would betray a missing conversion)
    assert float(jnp.max(jnp.abs(res.img))) < 10.0


def test_sample_and_save_for_fid_to_lab(tmp_path, rng):
    """Family-B FID dumps: noise runs through the lab-space model but the
    PNG dump path converts back (no crash, plausible rgb range)."""
    op = get_operator("noise", timesteps=3)
    h = _harness(tmp_path, op, to_lab=True)
    out = h.sample_and_save_for_fid(num=2, batch_size=2,
                                    rng=jax.random.key(0))
    assert (out / "0.png").exists() and (out / "1.png").exists()


def test_harness_bf16_and_refresh_knobs(tmp_path, rng):
    """EvalHarness(bf16=True) must actually run the model in bfloat16
    (fp32 and bf16 outputs differ beyond fp32 roundoff but stay close), and
    refresh_every must change the sampled output (fewer UNet refreshes)
    while the metric dict stamps both knobs."""
    op = get_operator("blur", image_size=16, timesteps=4,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0)
    batch = rng.random((4, 16, 16, 3)).astype(np.float32) * 2 - 1
    key = jax.random.key(3)

    h32 = _harness(tmp_path / "a", op)
    h16 = _harness(tmp_path / "b", op, bf16=True)
    leaf = jax.tree_util.tree_leaves(h16.params)[0]
    assert leaf.dtype == jnp.bfloat16
    r32 = h32._sample(h32.d, jnp.asarray(batch), None, key)
    r16 = h16._sample(h16.d, jnp.asarray(batch), None, key)
    assert r16.img.dtype == jnp.float32  # carry math stays fp32
    d = float(jnp.max(jnp.abs(r32.img - r16.img)))
    assert 1e-7 < d < 0.2, d

    hk = _harness(tmp_path / "c", op, refresh_every=2)
    rk = hk._sample(hk.d, jnp.asarray(batch), None, key)
    assert float(jnp.max(jnp.abs(np.asarray(rk.img) - np.asarray(r32.img)))) > 1e-7

    class _DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return batch[i]

    out = hk.fid_distance_decrease_from_manifold(_DS(), end=4, batch_size=4)
    assert out["refresh_every"] == 2 and out["bf16"] is False
