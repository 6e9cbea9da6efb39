"""Golden test: JAX InceptionV3 FID graph vs a plain-torch reimplementation.

The reference FID model (snowification/Fid/inception.py:16-129) is
torchvision's InceptionV3 with the mseitzer FID patches:
  - count_include_pad=False 3x3/s1/p1 average pools in InceptionA/C/E_1
    (inception.py:228-229, :256-257, :289-290),
  - max pool instead of avg pool in the final InceptionE_2 (:324),
  - pool3 output = AdaptiveAvgPool2d(1) after Mixed_7c (:118-124),
  - input bilinearly resized to 299 (align_corners=False) and scaled
    (0,1)->(-1,1) (:146-153); the harness feeds (x+1)/2 of [-1,1] images
    (deblurring_diffusion_pytorch.py:1619-1622), so the composition equals
    feeding [-1,1] straight into the conv stack after resize.

torchvision is not installed in this container, so the torch side is a
from-scratch functional implementation of that architecture (BasicConv2d =
Conv2d(bias=False) + BatchNorm2d(eps=0.001) + ReLU, and the standard
InceptionA/B/C/D/E channel plan), driven by a synthetic state dict with the
pt_inception-2015-12-05 key layout.  Both sides run in float64 so any wiring
mistake in the ~96-layer JAX graph fails loudly while float noise stays ~0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from colddiff.eval.fid import (
    fid_features_fn,
    inception_features_from_torch_checkpoint,
    inception_pool3_features,
)

# The conv-spec table, synthetic state dict, and the plain-torch
# functional forward (the golden side) live in the shared module so
# scripts/verify_fid_weights.py can replay this comparison against a
# real weights file.
from colddiff.eval.torch_inception_ref import (  # noqa: E402
    synth_state_dict,
    torch_pool3_features,
)


# --------------------------------------------------------------------- #


def test_inception_pool3_matches_torch_golden():
    sd = synth_state_dict()
    rng = np.random.default_rng(42)
    x = rng.uniform(-1.0, 1.0, (2, 64, 64, 3))  # NHWC in [-1, 1]

    want = (
        torch_pool3_features(
            sd, torch.as_tensor(np.transpose((x + 1.0) / 2.0, (0, 3, 1, 2)))
        )
        .numpy()
    )

    with jax.enable_x64(True):
        p = {}
        for k, v in sd.items():
            if k.endswith(".conv.weight"):
                v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            p[k] = jnp.asarray(v)
        got = np.asarray(inception_pool3_features(p, jnp.asarray(x)))

    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_checkpoint_loader_roundtrip(tmp_path):
    """torch.save -> inception_features_from_torch_checkpoint matches the
    torch golden in float32 at FID-relevant tolerance."""
    sd64 = synth_state_dict(seed=1)
    sd = {
        k: (v.astype(np.float32) if v.dtype == np.float64 else v)
        for k, v in sd64.items()
    }
    path = tmp_path / "pt_inception_synth.pth"
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, str(path))

    feats = inception_features_from_torch_checkpoint(str(path))
    assert feats.is_inception

    rng = np.random.default_rng(7)
    x = rng.uniform(-1.0, 1.0, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(feats(jnp.asarray(x)))
    want = (
        torch_pool3_features(
            sd, torch.as_tensor(np.transpose((x + 1.0) / 2.0, (0, 3, 1, 2)))
        )
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fid_features_fn_picks_up_weights(tmp_path, monkeypatch):
    sd = {
        k: torch.as_tensor(
            v.astype(np.float32) if v.dtype == np.float64 else v
        )
        for k, v in synth_state_dict(seed=2).items()
    }
    path = tmp_path / "weights.pth"
    torch.save(sd, str(path))
    monkeypatch.setenv("COLDDIFF_INCEPTION_WEIGHTS", str(path))
    feats = fid_features_fn()
    assert feats.is_inception
    monkeypatch.delenv("COLDDIFF_INCEPTION_WEIGHTS")
    monkeypatch.chdir(tmp_path)  # no fallback file in cwd
    feats = fid_features_fn()
    assert not feats.is_inception
