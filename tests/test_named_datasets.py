"""Named-dataset loaders parse the standard torchvision on-disk layouts.

Parity target: snowification/diffusion/get_dataset.py:4-56 (CelebA/Flowers/
CIFAR10 via torchvision) and deblurring_diffusion_pytorch.py:1098-1108 (LSUN).
"""

import numpy as np
import pytest
from PIL import Image

from colddiff.data.get_dataset import (
    CelebADataset,
    Flowers102Dataset,
    LSUNChurchDataset,
    get_dataset,
)


def _write_img(path, size=(178, 218), value=128):
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.full((size[1], size[0], 3), value, np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def celeba_root(tmp_path):
    base = tmp_path / "celeba"
    names = [f"{i:06d}.jpg" for i in range(1, 7)]
    for n in names:
        _write_img(base / "img_align_celeba" / n)
    # splits: 0=train, 1=valid, 2=test (list_eval_partition.txt format)
    parts = [0, 0, 0, 1, 2, 2]
    (base / "list_eval_partition.txt").write_text(
        "".join(f"{n} {p}\n" for n, p in zip(names, parts)))
    return tmp_path


def test_celeba_split_and_shape(celeba_root):
    train = CelebADataset(celeba_root, split="train", image_size=128)
    test = CelebADataset(celeba_root, split="test", image_size=128)
    assert len(train) == 3 and len(test) == 2
    x = train[0]
    assert x.shape == (128, 128, 3) and x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0


def test_celeba_64px_crop128_then_resize(celeba_root):
    # image_size 64 goes through CenterCrop(128) -> Resize(64)
    # (get_dataset.py:7-12)
    ds = CelebADataset(celeba_root, split="train", image_size=64)
    assert ds[0].shape == (64, 64, 3)


def test_celeba_missing_layout(tmp_path):
    with pytest.raises(FileNotFoundError):
        CelebADataset(tmp_path, split="train")


def test_flowers_setid_split(tmp_path):
    from scipy.io import savemat

    base = tmp_path / "flowers-102"
    for i in range(1, 9):
        _write_img(base / "jpg" / f"image_{i:05d}.jpg", size=(100, 80))
    savemat(str(base / "setid.mat"),
            {"trnid": np.array([[1, 2, 3]]), "valid": np.array([[4, 5]]),
             "tstid": np.array([[6, 7, 8]])})
    train = Flowers102Dataset(tmp_path, split="train", image_size=32)
    test = Flowers102Dataset(tmp_path, split="test", image_size=32)
    assert len(train) == 3 and len(test) == 3
    assert train[0].shape == (32, 32, 3)  # resize=True then CenterCrop


def test_lsun_exported_folder(tmp_path):
    for i in range(4):
        _write_img(tmp_path / "church_outdoor_train" / f"{i}.png",
                   size=(256, 256))
    ds = LSUNChurchDataset(tmp_path, split="train", image_size=128)
    assert len(ds) == 4 and ds[0].shape == (128, 128, 3)
    with pytest.raises(FileNotFoundError):
        LSUNChurchDataset(tmp_path, split="val")


def test_get_dataset_reference_names(celeba_root):
    ds = get_dataset("CelebA_train", celeba_root, 128)
    assert len(ds) == 3
    with pytest.raises(ValueError):
        get_dataset("imagenet_train", celeba_root, 128)


def test_center_crop_pads_small_images(tmp_path):
    _write_img(tmp_path / "celeba" / "img_align_celeba" / "000001.jpg",
               size=(60, 60))
    ds = CelebADataset(tmp_path, split="all", image_size=128)
    x = ds[0]
    assert x.shape == (128, 128, 3)
    assert x[0, 0, 0] == -1.0  # zero-padded corner -> -1 after rescale
