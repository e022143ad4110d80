"""Host-side data layer: IO, datasets, transforms, crops, prefetch loader."""

from svdformer_pointsea_tpu.data.io import IO, read_pcd, write_pcd
from svdformer_pointsea_tpu.data.datasets import (
    DATASET_MAPPING,
    PCNDataset,
    ShapeNet55Dataset,
    make_dataset,
)
from svdformer_pointsea_tpu.data.pipeline import Batch, Loader
from svdformer_pointsea_tpu.data.crop import (
    FIXED_CORNERS,
    crop_fixed,
    crop_random_resampled,
    random_crop_params,
)

__all__ = [
    "IO",
    "read_pcd",
    "write_pcd",
    "DATASET_MAPPING",
    "PCNDataset",
    "ShapeNet55Dataset",
    "make_dataset",
    "Batch",
    "Loader",
    "FIXED_CORNERS",
    "crop_fixed",
    "crop_random_resampled",
    "random_crop_params",
]
