"""Native C++ host-pipeline kernels == numpy reference paths."""

import numpy as np
import pytest

from colddiff.data import native


def numpy_crop_flip_normalize(img, y0, x0, size, flip):
    crop = img[y0 : y0 + size, x0 : x0 + size]
    if flip:
        crop = crop[:, ::-1]
    return crop.astype(np.float32) / 255.0 * 2.0 - 1.0


def numpy_pad4(img, y0, x0, flip):
    h, w, _ = img.shape
    p = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="constant")
    crop = p[y0 : y0 + h, x0 : x0 + w]
    if flip:
        crop = crop[:, ::-1]
    return crop.astype(np.float32) / 255.0 * 2.0 - 1.0


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of the native transform kernels failed"


@pytest.mark.parametrize("flip", [False, True])
def test_crop_flip_normalize_matches_numpy(rng, flip):
    img = (rng.random((40, 44, 3)) * 255).astype(np.uint8)
    got = native.crop_flip_normalize(img, 5, 7, 32, flip)
    want = numpy_crop_flip_normalize(img, 5, 7, 32, flip)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("y0,x0", [(0, 0), (4, 4), (8, 8), (3, 6)])
def test_pad4_crop_matches_numpy(rng, flip, y0, x0):
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    got = native.pad4_crop_flip_normalize(img, y0, x0, flip)
    want = numpy_pad4(img, y0, x0, flip)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_grayscale_channel():
    img = np.arange(28 * 28, dtype=np.uint8).reshape(28, 28, 1)
    got = native.crop_flip_normalize(img, 0, 0, 28, False)
    want = numpy_crop_flip_normalize(img, 0, 0, 28, False)
    np.testing.assert_allclose(got, want, atol=1e-6)
