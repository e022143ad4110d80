"""Dataclass configs mirroring the reference's easydict trees."""

from svdformer_pointsea_tpu.configs.base import (
    Config,
    DataConfig,
    NetworkConfig,
    TrainConfig,
    geospec_config,
    kitti_config,
    pcn_config,
    pointsea_config,
    shapenet34_config,
    shapenet55_config,
)

__all__ = [
    "Config",
    "DataConfig",
    "NetworkConfig",
    "TrainConfig",
    "pcn_config",
    "shapenet55_config",
    "shapenet34_config",
    "kitti_config",
    "geospec_config",
    "pointsea_config",
]
