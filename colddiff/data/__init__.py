from .datasets import (  # noqa: F401
    ArrayDataset,
    DataLoader,
    ImageFolderDataset,
    SyntheticDataset,
    load_cifar10_batches,
    load_mnist_idx,
)
