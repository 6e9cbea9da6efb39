from .datasets import (  # noqa: F401
    ArrayDataset,
    DataLoader,
    ImageFolderDataset,
    SyntheticDataset,
    load_cifar10_batches,
    load_mnist_idx,
)
from .get_dataset import (  # noqa: F401
    CelebADataset,
    Flowers102Dataset,
    LSUNChurchDataset,
    get_dataset,
)
