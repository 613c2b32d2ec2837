from pggan_tpu.data.datasets import (
    DepthDataset,
    FolderDataset,
    DefaultImageFolderDataset,
    SoundImageDataset,
    H5Dataset,
    OldH5Dataset,
    SyntheticDataset,
)
from pggan_tpu.data.loader import DataIterator, InfiniteRandomSampler

__all__ = [
    "DepthDataset",
    "FolderDataset",
    "DefaultImageFolderDataset",
    "SoundImageDataset",
    "H5Dataset",
    "OldH5Dataset",
    "SyntheticDataset",
    "DataIterator",
    "InfiniteRandomSampler",
]
