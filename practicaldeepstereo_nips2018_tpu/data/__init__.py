"""Data pipeline: datasets, IO, transforms, prefetching loader."""

from practicaldeepstereo_nips2018_tpu.data.dataset import Dataset
from practicaldeepstereo_nips2018_tpu.data.flyingthings3d import (
    FlyingThings3D,
    precompute_disparity_statistics,
)
from practicaldeepstereo_nips2018_tpu.data.kitti import Kitti
from practicaldeepstereo_nips2018_tpu.data.loader import Loader
from practicaldeepstereo_nips2018_tpu.data import pfm
from practicaldeepstereo_nips2018_tpu.data import transforms

__all__ = [
    "Dataset",
    "FlyingThings3D",
    "Kitti",
    "Loader",
    "pfm",
    "transforms",
    "precompute_disparity_statistics",
]
