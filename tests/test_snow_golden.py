"""Bit-level snow golden: Snow.degrade vs a sequential numpy/torch
transcription of the reference's generate_snow_layer + forward chain
(snowification/diffusion/forward_process_impl.py:220-372).

The transcription below re-derives everything from the reference's own
formulas: the seeded Gaussian field, clipped_zoom, per-step thresholds,
torchgeometry's 1-D Gaussian motion-blur kernel applied with
F.conv2d(padding='same'), horizontal/vertical selection, the 180-degree
rotations, and the brightness-scaled additive forward.

RNG-source waiver (documented in colddiff/operators/snow.py): upstream
draws the single_snow per-timestep vertical-assignment permutations from
torch's *global, unseeded* generator (forward_process_impl.py:337-341), so
its own fixed-snow setup is not reproducible in single_snow mode.  Both
sides here draw those permutations from the same seeded numpy stream at
the same point in the draw order; everything else follows the reference
bit for bit.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

SEED = 123321


def _clipped_zoom(img, zoom_factor):
    # forward_process_impl.py:32-42
    from scipy.ndimage import zoom as scizoom

    h = img.shape[0]
    ch = int(np.ceil(h / zoom_factor))
    top = (h - ch) // 2
    img = scizoom(img[top:top + ch, top:top + ch],
                  (zoom_factor, zoom_factor, 1), order=1)
    trim_top = (img.shape[0] - h) // 2
    return img[trim_top:trim_top + h, trim_top:trim_top + h]


def _tgm_gaussian(window_size, sigma):
    # torchgeometry.image.gaussian (used via get_gaussian_kernel,
    # forward_process_impl.py:330)
    x = torch.arange(window_size).float()
    gauss = torch.exp(-((x - window_size // 2) ** 2) / float(2 * sigma ** 2))
    return gauss / gauss.sum()


def _level_constants(snow_level):
    # forward_process_impl.py:262-296, transcribed independently
    if snow_level == 1:
        return ((0.1, 0.3, 3, 0.5, 5, 4, 0.8), 0.7, 0.3, 0.5, 5.0, 0.95, 0.7)
    if snow_level == 2:
        return ((0.55, 0.3, 2.5, 0.85, 11, 12, 0.55),
                1.15, 0.7, 0.05, 12.0, 0.95, 0.55)
    if snow_level == 3:
        return ((0.55, 0.3, 2.5, 0.7, 11, 16, 0.4),
                1.15, 0.7, 0.05, 16.0, 0.95, 0.4)
    if snow_level == 4:
        return ((0.55, 0.3, 2.5, 0.55, 11, 20, 0.3),
                1.15, 0.55, 0.05, 20.0, 0.95, 0.3)
    raise ValueError(snow_level)


def reference_snow_layers(image_size, num_timesteps, snow_level, single_snow,
                          batch_size):
    """generate_snow_layer (forward_process_impl.py:252-355) -> (snow,
    snow_rot) lists of [L, 3, H, W] torch tensors."""
    c, th0, th1, mb0, mb1, br0, br1 = _level_constants(snow_level)
    rng = np.random.RandomState(SEED)

    thres = torch.linspace(th0, th1, num_timesteps).tolist()
    mb_sigma = torch.linspace(mb0, mb1, num_timesteps).tolist()
    br = torch.linspace(br0, br1, num_timesteps).tolist()

    if single_snow:
        sb_list = []
        for _ in range(batch_size):
            cs = rng.normal(size=(image_size, image_size), loc=c[0],
                            scale=c[1])[..., np.newaxis]
            sb_list.append(_clipped_zoom(cs, c[2]))
        base = np.concatenate(sb_list, axis=2)
    else:
        base = _clipped_zoom(
            rng.normal(size=(image_size, image_size), loc=c[0],
                       scale=c[1])[..., np.newaxis], c[2])
    vertical_snow = rng.uniform() > 0.5

    snow, snow_rot = [], []
    ks = int(c[4])
    for i in range(num_timesteps):
        layer = torch.Tensor(base).clone()
        layer[layer < thres[i]] = 0
        layer = torch.clip(layer, 0, 1)
        layer = layer.permute((2, 0, 1)).unsqueeze(1)  # [L, 1, H, W]
        kernel_param = _tgm_gaussian(ks, mb_sigma[i])
        motion_kernel = torch.zeros((ks, ks))
        motion_kernel[int(ks / 2)] = kernel_param
        horizontal_kernel = motion_kernel[None, None, :].repeat(3, 1, 1, 1)
        vertical_kernel = torch.rot90(motion_kernel, k=1, dims=[0, 1])
        vertical_kernel = vertical_kernel[None, None, :].repeat(3, 1, 1, 1)
        vsnow = F.conv2d(layer, vertical_kernel, padding="same", groups=1)
        hsnow = F.conv2d(layer, horizontal_kernel, padding="same", groups=1)
        if single_snow:
            # waiver: seeded numpy stream instead of unseeded torch.randperm
            perm = rng.permutation(layer.shape[0])
            vidx = torch.as_tensor(perm[: int(layer.shape[0] / 2)].copy())
            layer = hsnow
            layer[vidx] = vsnow[vidx]
        elif vertical_snow:
            layer = vsnow
        else:
            layer = hsnow
        snow.append(layer)
        snow_rot.append(torch.rot90(layer, k=2, dims=[2, 3]))
    return snow, snow_rot, br


def reference_forward(og, i, snow, snow_rot, br, fix_brightness):
    """Snow.forward (forward_process_impl.py:360-372), NCHW torch."""
    og_r = (og + 1.0) / 2.0
    gray = (0.299 * og_r[:, 0:1] + 0.587 * og_r[:, 1:2]
            + 0.114 * og_r[:, 2:3])  # kornia rgb_to_grayscale
    og_gray = gray * 1.5 + 0.5
    og_gray = torch.maximum(og_r, og_gray)
    scaled = br[i] * og_r + (1 - br[i]) * og_gray
    base = og_r if fix_brightness else scaled
    snowy = torch.clip(base + snow[i] + snow_rot[i], 0.0, 1.0)
    return snowy * 2.0 - 1.0


CASES = [
    dict(snow_level=1, single_snow=False, fix_brightness=False),
    dict(snow_level=2, single_snow=False, fix_brightness=False),
    dict(snow_level=3, single_snow=False, fix_brightness=True),
    dict(snow_level=4, single_snow=False, fix_brightness=False),
    dict(snow_level=2, single_snow=True, fix_brightness=False),
    dict(snow_level=1, single_snow=True, fix_brightness=True),
]


@pytest.mark.parametrize("case", CASES,
                         ids=lambda c: f"L{c['snow_level']}"
                                       f"{'-single' if c['single_snow'] else ''}"
                                       f"{'-fixbr' if c['fix_brightness'] else ''}")
def test_snow_degrade_matches_reference_transcription(case, rng):
    import jax.numpy as jnp

    from colddiff.operators.snow import Snow

    size, T, B = 16, 6, 4
    op = Snow.create(image_size=size, timesteps=T, batch_size=B, **case)

    snow, snow_rot, br = reference_snow_layers(
        size, T, case["snow_level"], case["single_snow"], B)

    og = rng.random((B, size, size, 3)).astype(np.float32) * 2 - 1
    og_t = torch.from_numpy(np.transpose(og, (0, 3, 1, 2)))
    for i in range(T):
        want = reference_forward(og_t, i, snow, snow_rot, br,
                                 case["fix_brightness"])
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        n = jnp.full((B,), i + 1, dtype=jnp.int32)  # degrade(x, t+1) == q_sample(x, t)
        got = np.asarray(op.degrade(jnp.asarray(og), n))
        np.testing.assert_allclose(got, want, atol=3e-5,
                                   err_msg=f"timestep {i}")


def test_snow_n_zero_is_identity(rng):
    import jax.numpy as jnp

    from colddiff.operators.snow import Snow

    op = Snow.create(image_size=8, timesteps=3, batch_size=2)
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32) * 2 - 1)
    out = op.degrade(x, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)
