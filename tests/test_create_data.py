"""create_data one-off tool: synthetic raw MNIST/CIFAR/image-folder inputs
produce the per-class / per-split PNG trees the entry scripts expect
(reference root create_data.py:26-110)."""

import pickle

import numpy as np
import pytest
from PIL import Image

from colddiff.data.create_data import dump_cifar10, dump_mnist, split_celeba


def _write_idx_images(path, imgs):
    n = imgs.shape[0]
    header = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") \
        + (28).to_bytes(4, "big") + (28).to_bytes(4, "big")
    path.write_bytes(header + imgs.tobytes())


def _write_idx_labels(path, labels):
    header = (2049).to_bytes(4, "big") + len(labels).to_bytes(4, "big")
    path.write_bytes(header + bytes(int(v) for v in labels))


def test_dump_mnist(tmp_path):
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir()
    tr = rng.integers(0, 255, (6, 28, 28), dtype=np.uint8)
    te = rng.integers(0, 255, (3, 28, 28), dtype=np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", tr)
    _write_idx_labels(raw / "train-labels-idx1-ubyte", [0, 1, 2, 0, 1, 2])
    _write_idx_images(raw / "t10k-images-idx3-ubyte", te)
    _write_idx_labels(raw / "t10k-labels-idx1-ubyte", [5, 6, 7])

    out = tmp_path / "root_mnist"
    dump_mnist(str(raw), str(out))
    # train split is per-class, test split is flat (create_data.py:38-62)
    assert sorted(p.name for p in (out / "train").iterdir()) == ["0", "1", "2"]
    assert len(list((out / "train").glob("*/*.png"))) == 6
    assert len(list((out / "test").glob("*.png"))) == 3
    # pixel round trip
    arr = np.asarray(Image.open(next((out / "test").glob("0.png"))))
    np.testing.assert_array_equal(arr, te[0])


def test_dump_cifar10(tmp_path):
    rng = np.random.default_rng(1)
    raw = tmp_path / "raw"
    raw.mkdir()
    for i in range(1, 6):
        batch = {b"data": rng.integers(0, 255, (2, 3072), dtype=np.uint8),
                 b"labels": [i % 10, (i + 1) % 10]}
        (raw / f"data_batch_{i}").write_bytes(pickle.dumps(batch))
    (raw / "test_batch").write_bytes(pickle.dumps(
        {b"data": rng.integers(0, 255, (4, 3072), dtype=np.uint8),
         b"labels": [0, 1, 2, 3]}))

    out = tmp_path / "root_cifar10"
    dump_cifar10(str(raw), str(out))
    assert len(list((out / "train").glob("*/*.png"))) == 10
    assert len(list((out / "test").glob("*.png"))) == 4


def test_split_celeba(tmp_path):
    raw = tmp_path / "celeba"
    raw.mkdir()
    rng = np.random.default_rng(2)
    for i in range(10):
        arr = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        Image.fromarray(arr).save(raw / f"{i:03d}.png")
    out = tmp_path / "root_celebA"
    split_celeba(str(raw), str(out))
    # 90/10 split (create_data.py:84-96)
    assert len(list((out / "train").glob("*.png"))) == 9
    assert len(list((out / "test").glob("*.png"))) == 1
