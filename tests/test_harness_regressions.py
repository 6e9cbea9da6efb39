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
