"""Data layer: the TPU-native counterpart of the reference's
dataloader/data.py + dataloader/dataset.py + lists/*.list
(SURVEY.md §2 #9-#11)."""

from ganet_tpu.data.pfm import read_pfm, write_pfm
from ganet_tpu.data.kitti_io import read_disparity_png, write_disparity_png
from ganet_tpu.data.dataset import (
    StereoDataset,
    SyntheticStereoDataset,
    get_test_set,
    get_training_set,
)
from ganet_tpu.data.pipeline import BatchIterator

__all__ = [
    "read_pfm",
    "write_pfm",
    "read_disparity_png",
    "write_disparity_png",
    "StereoDataset",
    "SyntheticStereoDataset",
    "get_training_set",
    "get_test_set",
    "BatchIterator",
]
